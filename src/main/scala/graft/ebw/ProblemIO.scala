package graft.ebw

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Problem persistence, the Spark-native analogue of
 * dump_problem_to_zip/load_problem_from_zip
 * (/root/reference/entropy_balance_weighting/shared.py:136-170). The
 * reference writes .npy/.npz into a zip; at cluster scale the natural
 * container is a parquet directory: `data/` holds (idx, vals, w0) rows
 * (sparse iff idx non-null), `meta/` holds the target moments.
 */
object ProblemIO {

  def save(
      df: DataFrame, featuresCol: String, weightCol: String,
      moments: Array[Double], path: String): Unit = {
    val spark = df.sparkSession
    val k = moments.length
    val prep = EntropyBalance.prepare(df, featuresCol, weightCol, k, moments)
    try {
      import spark.implicits._
      prep.rows.map(r => (Option(r.idx), Option(r.vals).getOrElse(Array.empty[Double]).toSeq, r.w0))
        .toDF("idx", "vals", "w0")
        .write.mode("overwrite").parquet(s"$path/data")
      Seq((moments.toSeq, k)).toDF("moments", "k")
        .write.mode("overwrite").parquet(s"$path/meta")
    } finally prep.rows.unpersist(false)
  }

  /** Returns (df with featuresCol/weightCol, moments). Dense problems come
   * back as array<double> features; sparse ones as ml SparseVector. */
  def load(spark: SparkSession, path: String): (DataFrame, Array[Double]) = {
    val meta = spark.read.parquet(s"$path/meta").collect()(0)
    val moments = meta.getSeq[Double](0).toArray
    val k = meta.getInt(1)
    val data = spark.read.parquet(s"$path/data")
    val anySparse = data.filter(col("idx").isNotNull).limit(1).count() > 0
    val df =
      if (!anySparse) data.select(col("vals").as("features"), col("w0"))
      else {
        import org.apache.spark.ml.linalg.{Vector, Vectors}
        val toVec = udf { (idx: Seq[Int], vals: Seq[Double]) =>
          if (idx == null) Vectors.dense(vals.toArray)
          else Vectors.sparse(k, idx.toArray, vals.toArray): Vector
        }
        data.select(toVec(col("idx"), col("vals")).as("features"), col("w0"))
      }
    (df, moments)
  }
}
