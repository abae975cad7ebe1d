package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Deduplication operators for large-scale text corpora. All are pure
 * DataFrame pipelines: narrow maps plus exactly one shuffle (the groupBy on
 * the dedup key), so they scale linearly with input and never materialize
 * pairwise comparisons outside an LSH bucket.
 */
object Dedup {

  /** Exact dedup on content hash. One shuffle on the 128-bit digest; at
   * 100 TB use it with spark.sql.shuffle.partitions sized to the corpus. */
  def exact(docs: DataFrame, textCol: String, idCol: String): DataFrame =
    docs
      .groupBy(md5(col(textCol)).as("content_hash"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))

  /**
   * MinHash signatures over 3-word shingles. Hash family j is
   * md5(j || '|' || shingle); the per-document signature is the
   * lexicographic min per family (portable across engines — the DuckDB
   * oracle reproduces it verbatim). Documents with fewer than 3 tokens
   * have no shingles and are dropped, as in common MinHash pipelines.
   */
  def minhashSignatures(
      docs: DataFrame, textCol: String, idCol: String, numHashes: Int = 8): DataFrame = {
    val tok = docs
      .select(col(idCol), split(col(textCol), " ", -1).as("tok"))
      .filter(size(col("tok")) >= 3)
    val shingled = tok.select(
      col(idCol),
      explode(expr(
        "transform(sequence(1, size(tok) - 2), i -> concat_ws(' ', slice(tok, i, 3)))"))
        .as("s"))
    val aggs = (0 until numHashes).map(j =>
      min(md5(concat(lit(s"$j|"), col("s")))).as(s"h$j"))
    val sig = shingled.groupBy(col(idCol)).agg(aggs.head, aggs.tail: _*)
    sig.select(col(idCol),
      concat_ws("|", (0 until numHashes).map(j => col(s"h$j")): _*).as("minhash_sig"))
  }

  /** LSH banding over minhash signatures: band key -> candidate pairs.
   * Self-join happens per-bucket only (the scale path for near-dup). */
  def minhashCandidatePairs(
      docs: DataFrame, textCol: String, idCol: String,
      numHashes: Int = 8, bandSize: Int = 2): DataFrame = {
    val sig = minhashSignatures(docs, textCol, idCol, numHashes)
      .withColumn("parts", split(col("minhash_sig"), "\\|"))
    val bands = numHashes / bandSize
    val bandCols = (0 until bands).map { b =>
      struct(lit(b).as("band"),
        concat_ws("|", (0 until bandSize).map(i => col("parts").getItem(b * bandSize + i)): _*)
          .as("key"))
    }
    val exploded = sig
      .select(col(idCol).as("id"), explode(array(bandCols: _*)).as("bk"))
      .select(col("id"), col("bk.band"), col("bk.key"))
    val a = exploded.as("a")
    val b = exploded.as("b")
    a.join(b, col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
        col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()
  }

  /** n-gram Jaccard similarity for LSH candidate pairs: exact similarity
   * computed ONLY inside buckets (never all-pairs). The shingle frame is
   * built once and cached (candidate generation and exact Jaccard reuse
   * it); band hashes use xxhash64 (no oracle requires md5 here). */
  def ngramJaccardPairs(
      docs: DataFrame, textCol: String, idCol: String,
      minJaccard: Double = 0.5, numHashes: Int = 8, bandSize: Int = 2): DataFrame = {
    val shingles = docs
      .select(col(idCol).as("sid"), split(col(textCol), " ", -1).as("tok"))
      .filter(size(col("tok")) >= 3)
      .select(col("sid"), array_distinct(expr(
        "transform(sequence(1, size(tok) - 2), i -> concat_ws(' ', slice(tok, i, 3)))"))
        .as("sh"))
      .cache()
    val exploded = shingles.select(col("sid"), explode(col("sh")).as("s"))
    val aggs = (0 until numHashes).map(j =>
      min(xxhash64(lit(j), col("s"))).as(s"h$j"))
    val sig = exploded.groupBy("sid").agg(aggs.head, aggs.tail: _*)
    val bands = numHashes / bandSize
    val bandCols = (0 until bands).map { b =>
      struct(lit(b).as("band"),
        concat_ws("|", (0 until bandSize).map(i =>
          col(s"h${b * bandSize + i}").cast("string")): _*).as("key"))
    }
    val keyed = sig.select(col("sid").as("id"), explode(array(bandCols: _*)).as("bk"))
      .select(col("id"), col("bk.band"), col("bk.key"))
    val cand = keyed.as("a")
      .join(keyed.as("b"), col("a.band") === col("b.band") &&
        col("a.key") === col("b.key") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()
    cand
      .join(shingles.select(col("sid").as("id_a"), col("sh").as("sh_a")), "id_a")
      .join(shingles.select(col("sid").as("id_b"), col("sh").as("sh_b")), "id_b")
      .withColumn("inter", size(array_intersect(col("sh_a"), col("sh_b"))))
      .withColumn("uni", size(array_union(col("sh_a"), col("sh_b"))))
      .select(col("id_a"), col("id_b"),
        (col("inter") * lit(1.0) / col("uni")).as("jaccard"))
      .filter(col("jaccard") >= minJaccard)
  }

  /** Embedding-cosine near-duplicate pairs: LSH-bucket the vectors (random
   * hyperplane signs), compare only within buckets, keep pairs above the
   * cosine threshold. The 100 TB-safe shape: no cross-bucket pairs exist. */
  def embeddingCosinePairs(
      emb: DataFrame, vecCol: String, idCol: String,
      minCosine: Double = 0.95, bits: Int = 8): DataFrame = {
    graft.functions.GraftFunctions.register(emb.sparkSession)
    val dim = emb.select(size(col(vecCol))).head().getInt(0)
    val v = col(vecCol).cast("array<double>")
    val withB = emb.select(col(idCol).as("id"), v.as("v"))
      .withColumn("bucket", Similarity.lshBucket(col("v"), dim, bits))
    val a = withB.select(col("id").as("id_a"), col("v").as("v_a"), col("bucket"))
    val b = withB.select(col("id").as("id_b"), col("v").as("v_b"), col("bucket"))
    a.join(b, Seq("bucket"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("cosine", Similarity.cosine(col("v_a"), col("v_b")))
      .filter(col("cosine") >= minCosine)
      .select("id_a", "id_b", "cosine")
  }

  /** SimHash near-dup candidate pairs with exact verification: split the
   * 64-bit fingerprint into maxHamming+1 bands — by pigeonhole, any pair
   * within hamming distance maxHamming agrees exactly on at least one
   * band — join per band, then verify with bit_count(xor). No all-pairs
   * comparison ever happens. */
  def simhashCandidatePairs(
      docs: DataFrame, textCol: String, idCol: String,
      maxHamming: Int = 8): DataFrame = {
    val nBands = maxHamming + 1
    val bandBits = 64 / nBands
    val fp = simhash(docs, textCol, idCol)
    val bandCols = (0 until nBands).map { bi =>
      val lo = bi * bandBits
      val width = if (bi == nBands - 1) 64 - lo else bandBits
      val mask = if (width >= 64) -1L else (1L << width) - 1L
      struct(lit(bi).as("band"),
        shiftright(col("simhash"), lo).bitwiseAND(lit(mask)).as("key"))
    }
    val keyed = fp
      .select(col(idCol).as("id"), col("simhash"),
        explode(array(bandCols: _*)).as("bk"))
      .select(col("id"), col("simhash"), col("bk.band"), col("bk.key"))
    val a = keyed.select(col("id").as("id_a"), col("simhash").as("h_a"),
      col("band"), col("key"))
    val b = keyed.select(col("id").as("id_b"), col("simhash").as("h_b"),
      col("band"), col("key"))
    a.join(b, Seq("band", "key"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        bit_count(col("h_a").bitwiseXOR(col("h_b"))).cast("long").as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** SimHash: 64-bit fingerprint from token hashes; near-dups share most
   * bits. xxhash64 gives a stable 64-bit token hash. */
  def simhash(docs: DataFrame, textCol: String, idCol: String): DataFrame = {
    val tokens = docs.select(col(idCol),
      explode(split(col(textCol), " ", -1)).as("t"))
      .filter(length(col("t")) > 0)
      .withColumn("h", xxhash64(col("t")))
    // per bit b: sum(+1 if bit set else -1); fingerprint bit = sign
    val bitCols = (0 until 64).map { b =>
      sum(when(shiftright(col("h"), b).bitwiseAND(lit(1L)) === 1L, 1).otherwise(-1))
        .as(s"b$b")
    }
    val agg = tokens.groupBy(col(idCol)).agg(bitCols.head, bitCols.tail: _*)
    val fp = (0 until 64).map(b =>
      when(col(s"b$b") > 0, shiftleft(lit(1L), b)).otherwise(lit(0L)))
      .reduce((x, y) => x.bitwiseOR(y))
    agg.select(col(idCol), fp.as("simhash"))
  }
}
