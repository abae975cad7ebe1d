package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Embedding similarity search. Brute-force cosine is the exactness
 * baseline (a single narrow scan when the query vector is broadcast as a
 * literal — no shuffle at all); the random-hyperplane LSH variant is the
 * 100 TB path: bucket by sign bits, then search only the matching bucket.
 */
object Similarity {

  /** Built-in composition (portable, interpreted higher-order funcs). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column =
    sqrt(aggregate(transform(a, x => x * x), lit(0.0), (acc, x) => acc + x))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Codegen'd native kernel (graft.functions.ArrayDotProduct); requires
   * GraftFunctions.register on the session. ~whole-stage-codegen speed. */
  def dotNative(a: Column, b: Column): Column = call_function("graft_dot", a, b)

  def cosineNative(a: Column, b: Column): Column =
    dotNative(a, b) / (sqrt(dotNative(a, a)) * sqrt(dotNative(b, b)))

  /** Exact top-k by cosine against one query vector (broadcast literal).
   * A single narrow codegen'd scan + TakeOrdered — no shuffle. */
  def bruteForceTopK(
      emb: DataFrame, vecCol: String, idCol: String,
      query: Seq[Double], k: Int): DataFrame = {
    graft.functions.GraftFunctions.register(emb.sparkSession)
    val q = typedlit(query)
    val v = col(vecCol).cast("array<double>")
    emb
      .select(col(idCol), cosineNative(v, q).as("cosine"))
      .orderBy(desc("cosine"), col(idCol))
      .limit(k)
  }

  /** Random-hyperplane LSH bucket key: `bits` sign bits from deterministic
   * pseudo-random hyperplanes (seeded hash of (plane, dim) — reproducible
   * without any driver-side RNG state). */
  def lshBucket(vecCol: Column, dim: Int, bits: Int, seed: Long = 42L): Column = {
    val planes = (0 until bits).map { p =>
      // deterministic "hyperplane": component d = hash(seed, p, d) mapped to [-1, 1)
      val comps = (0 until dim).map { d =>
        val h = scala.util.hashing.MurmurHash3.productHash((seed, p, d))
        (h.toDouble / Int.MaxValue, d)
      }
      val s = comps.map { case (w, d) => vecCol.getItem(d) * lit(w) }.reduce(_ + _)
      when(s >= 0, lit(1)).otherwise(lit(0)) * lit(1 << p)
    }
    planes.reduce(_ + _)
  }

  /** Approximate top-k: restrict the scan to the query's LSH bucket. */
  def lshTopK(
      emb: DataFrame, vecCol: String, idCol: String,
      query: Seq[Double], k: Int, bits: Int = 8): DataFrame = {
    val dim = query.length
    val v = col(vecCol).cast("array<double>")
    val withBucket = emb.withColumn("bucket", lshBucket(v, dim, bits))
    // compute the query's bucket on the driver with the same planes
    var qb = 0
    for (p <- 0 until bits) {
      var s = 0.0
      for (d <- 0 until dim) {
        val h = scala.util.hashing.MurmurHash3.productHash((42L, p, d))
        s += query(d) * (h.toDouble / Int.MaxValue)
      }
      if (s >= 0) qb |= (1 << p)
    }
    graft.functions.GraftFunctions.register(emb.sparkSession)
    withBucket
      .filter(col("bucket") === qb)
      .select(col(idCol), cosineNative(v, typedlit(query)).as("cosine"))
      .orderBy(desc("cosine"), col(idCol))
      .limit(k)
  }
}
