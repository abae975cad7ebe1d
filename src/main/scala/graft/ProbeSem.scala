package graft
import org.apache.spark.sql.{SparkSession, functions => F}
object ProbeSem {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    import F._
    val emb = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
    def time(tag: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"PROBE $tag ${(System.nanoTime()-t0)/1e9}%.2f s")
    }
    time("warm")(emb.count())
    time("kmeansAssign")(graft.ops.Similarity.kmeansAssign(emb, "embedding", "vec_id", 8, 2).count())
    time("semanticPairs full")(graft.ops.Dedup.semanticPairs(emb, "embedding", "vec_id", k = 8, iters = 2, minCosine = 0.35).collect())
    time("semanticPairs again")(graft.ops.Dedup.semanticPairs(emb, "embedding", "vec_id", k = 8, iters = 2, minCosine = 0.35).collect())
    spark.stop()
  }
}
