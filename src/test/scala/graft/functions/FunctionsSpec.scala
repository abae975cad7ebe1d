package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Similarity

class FunctionsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("functions-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  test("native graft_dot equals built-in composition on real embeddings") {
    GraftFunctions.register(spark)
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val both = emb.select(
      col("vec_id"),
      Similarity.dot(col("v"), col("v")).as("builtin"),
      Similarity.dotNative(col("v"), col("v")).as("native"))
    val maxDiff = both.agg(max(abs(col("builtin") - col("native"))))
      .collect()(0).getDouble(0)
    assert(maxDiff < 1e-12, s"native/builtin dot differ by $maxDiff")
  }

  test("graft_dot null handling and SQL registration") {
    GraftFunctions.register(spark)
    import spark.implicits._
    val df = Seq(
      (Some(Seq(1.0, 2.0)), Some(Seq(3.0, 4.0))),
      (None, Some(Seq(1.0, 1.0)))).toDF("a", "b")
    df.createOrReplaceTempView("dot_in")
    val rows = spark.sql("SELECT graft_dot(a, b) AS d FROM dot_in ORDER BY d NULLS LAST").collect()
    assert(rows(0).getDouble(0) == 11.0)
    assert(rows(1).isNullAt(0))
  }

  test("graft_dot participates in whole-stage codegen") {
    GraftFunctions.register(spark)
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("embedding").cast("array<double>").as("v"))
    val plan = emb.select(Similarity.dotNative(col("v"), col("v")).as("d"))
      .queryExecution.executedPlan.toString
    // the "*(n)" prefix marks operators inside a WholeStageCodegen stage
    assert(plan.linesIterator.exists(l =>
      l.contains("graft_dot") && l.trim.startsWith("*(")),
      s"graft_dot not inside a codegen stage:\n$plan")
  }
}
