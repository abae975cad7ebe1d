import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object FzProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val cust = spark.read.parquet("/root/testdata/sf0.1/customer.parquet")
    def time[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$tag: ${(System.nanoTime()-t0)/1e9}%.2f s"); r
    }
    // replicate the internals to isolate stages
    def dv(s: org.apache.spark.sql.Column, k: Int) = {
      val n = length(s)
      val empty = array().cast("array<string>")
      val d0 = array(s)
      val d1 = when(n >= 1, transform(sequence(lit(1), n), i =>
        concat(s.substr(lit(1), i - 1), s.substr(i + 1, n)))).otherwise(empty)
      val d2 = when(n >= 2, flatten(transform(sequence(lit(1), n - 1), i =>
        transform(sequence(i + 1, n), j =>
          concat(s.substr(lit(1), i - 1), s.substr(i + 1, j - i - 1),
            s.substr(j + 1, n)))))).otherwise(empty)
      array_distinct(concat(d0, d1, d2))
    }
    val base = cust.select(col("c_nationkey"), col("c_custkey").as("_id"), col("c_name").as("_s"))
    val keys = base.select(col("c_nationkey"), col("_id"),
      length(col("_s")).as("_ln"),
      explode(array_distinct(transform(dv(col("_s"), 2), v => xxhash64(v)))).as("_v"))
    val nk = time("keys count")(keys.count())
    println(s"key rows: $nk")
    val l = keys.toDF("c_nationkey", "id_a", "_la", "_v")
    val r = keys.toDF("c_nationkey2", "id_b", "_lb", "_v2")
    val joined = l.join(r, col("c_nationkey") === col("c_nationkey2") &&
      col("_v") === col("_v2") && col("id_a") < col("id_b") &&
      abs(col("_la") - col("_lb")) <= 2)
    val nj = time("join multi-hits")(joined.count())
    println(s"join rows: $nj")
    val cand = joined.select("id_a", "id_b", "c_nationkey").distinct()
    val nc = time("distinct candidates (incl join)")(cand.count())
    println(s"cand rows: $nc")
    spark.stop()
  }
}
