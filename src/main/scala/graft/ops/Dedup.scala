package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.slf4j.LoggerFactory

/**
 * Deduplication operators for large-scale text corpora. All are pure
 * DataFrame pipelines: narrow maps plus exactly one shuffle (the groupBy on
 * the dedup key), so they scale linearly with input and never materialize
 * pairwise comparisons outside an LSH bucket. Every band join is guarded by
 * a hot-bucket cap (`maxBucketSize`): a single degenerate key (empty docs,
 * boilerplate bands) would otherwise rejoin quadratically at corpus scale.
 * Dropped buckets are logged, never silent.
 *
 * Caching contract: the pair-generating operators cache their intermediate
 * signature/bucket frames (several downstream subtrees — the cap guard and
 * both join sides — reuse them; without the cache each would recompute the
 * expensive hashing). The cached frames stay registered for the lifetime
 * of the returned plan; in a long-lived session, drop them after consuming
 * the result via `spark.catalog.clearCache()` or by unpersisting through
 * `spark.sharedState.cacheManager`. The guard itself runs one
 * bucket-count job at operator-construction time (the price of the
 * no-silent-caps rule).
 */
object Dedup {

  private val log = LoggerFactory.getLogger(getClass)

  /** 3-word shingles of a pre-split `tok` array — ONE definition shared by
   * the minhash and ngram paths (both DuckDB oracles replay exactly this
   * string construction; editing it in one place only would silently
   * desynchronize them). */
  private[ops] val shingleExpr: String =
    "transform(sequence(1, size(tok) - 2), i -> " +
      "concat(tok[i - 1], ' ', tok[i], ' ', tok[i + 1]))"

  /** Exact dedup on content hash. One shuffle on the 128-bit digest; at
   * 100 TB use it with spark.sql.shuffle.partitions sized to the corpus. */
  def exact(docs: DataFrame, textCol: String, idCol: String): DataFrame =
    docs
      .groupBy(md5(col(textCol)).as("content_hash"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))

  /**
   * Hot-bucket guard for band joins: drop (band, key) buckets with more
   * than `maxBucketSize` members from candidate generation and log what was
   * dropped (a bucket of m rows contributes m(m-1)/2 pairs — one hot key
   * is the difference between linear and quadratic). The count aggregation
   * is one extra reduction over the keyed frame; the guard's collect is
   * bucket-count-sized, never data-sized. Callers pass Int.MaxValue to
   * disable (no extra pass then).
   */
  private def capBuckets(
      keyed: DataFrame, maxBucketSize: Int, opName: String): DataFrame = {
    if (maxBucketSize == Int.MaxValue) return keyed
    val counts = keyed.groupBy("band", "key").agg(count(lit(1)).as("bucket_n"))
    val over = counts.filter(col("bucket_n") > maxBucketSize)
    val dropped = over.limit(20).collect()
    if (dropped.nonEmpty) {
      val desc = dropped.map(r => s"band=${r.get(0)} key=${r.get(1)} n=${r.get(2)}")
        .mkString(", ")
      log.warn(s"$opName: dropping hot LSH buckets over maxBucketSize=" +
        s"$maxBucketSize (first ${dropped.length}): $desc")
    }
    keyed.join(
      counts.filter(col("bucket_n") <= maxBucketSize).select("band", "key"),
      Seq("band", "key"))
  }

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
      explode(expr(shingleExpr)).as("s"))
    val aggs = (0 until numHashes).map(j =>
      min(md5(concat(lit(s"$j|"), col("s")))).as(s"h$j"))
    val sig = shingled.groupBy(col(idCol)).agg(aggs.head, aggs.tail: _*)
    sig.select(col(idCol),
      concat_ws("|", (0 until numHashes).map(j => col(s"h$j")): _*).as("minhash_sig"))
  }

  /** LSH banding over minhash signatures: band key -> candidate pairs.
   * Self-join happens per-bucket only (the scale path for near-dup),
   * hot buckets capped. */
  def minhashCandidatePairs(
      docs: DataFrame, textCol: String, idCol: String,
      numHashes: Int = 8, bandSize: Int = 2,
      maxBucketSize: Int = 100000): DataFrame = {
    // signatures cached: the bucket-count guard and both pair-join sides
    // reuse one computation of the 8-md5-per-shingle aggregation
    val sig = minhashSignatures(docs, textCol, idCol, numHashes)
      .withColumn("parts", split(col("minhash_sig"), "\\|"))
      .cache()
    val bands = numHashes / bandSize
    val bandCols = (0 until bands).map { b =>
      struct(lit(b).as("band"),
        concat_ws("|", (0 until bandSize).map(i => col("parts").getItem(b * bandSize + i)): _*)
          .as("key"))
    }
    val exploded = sig
      .select(col(idCol).as("id"), explode(array(bandCols: _*)).as("bk"))
      .select(col("id"), col("bk.band").as("band"), col("bk.key").as("key"))
    val kept = capBuckets(exploded, maxBucketSize, "minhashCandidatePairs")
    val a = kept.as("a")
    val b = kept.as("b")
    a.join(b, col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
        col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()
  }

  /** n-gram Jaccard similarity for LSH candidate pairs: exact similarity
   * computed ONLY inside buckets (never all-pairs). The shingle frame is
   * built once and cached (candidate generation and exact Jaccard reuse
   * it); band hashes are md5-based so the DuckDB oracle replays the whole
   * pipeline — signatures, banding, candidates, exact Jaccard — verbatim. */
  def ngramJaccardPairs(
      docs: DataFrame, textCol: String, idCol: String,
      minJaccard: Double = 0.5, numHashes: Int = 8, bandSize: Int = 2,
      maxBucketSize: Int = 100000): DataFrame = {
    val shingles = docs
      .select(col(idCol).as("sid"), split(col(textCol), " ", -1).as("tok"))
      .filter(size(col("tok")) >= 3)
      .select(col("sid"), array_distinct(expr(shingleExpr)).as("sh"))
      .cache()
    val exploded = shingles.select(col("sid"), explode(col("sh")).as("s"))
    // hash families come 4-per-md5 (8-hex-char slices of the digest):
    // engine-portable like a per-family md5 but 4x fewer digest
    // computations — the signature aggregation is the expensive stage
    val seeds = (0 to (numHashes - 1) / 4).map(si =>
      md5(concat(lit(s"$si|"), col("s"))))
    val aggs = (0 until numHashes).map(j =>
      min(substring(seeds(j / 4), (j % 4) * 8 + 1, 8)).as(s"h$j"))
    // cached so the bucket-count guard, both pair-join sides, and the
    // verify step all reuse one computation
    val sig = exploded.groupBy("sid").agg(aggs.head, aggs.tail: _*).cache()
    val bands = numHashes / bandSize
    val bandCols = (0 until bands).map { b =>
      struct(lit(b).as("band"),
        concat_ws("|", (0 until bandSize).map(i =>
          col(s"h${b * bandSize + i}")): _*).as("key"))
    }
    val keyed = sig.select(col("sid").as("id"), explode(array(bandCols: _*)).as("bk"))
      .select(col("id"), col("bk.band").as("band"), col("bk.key").as("key"))
    val kept = capBuckets(keyed, maxBucketSize, "ngramJaccardPairs")
    val cand = kept.as("a")
      .join(kept.as("b"), col("a.band") === col("b.band") &&
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

  /**
   * Embedding-cosine near-duplicate pairs via multi-band random-hyperplane
   * LSH (OR-amplification): `bands` independent bucket keys of
   * `bitsPerBand` sign bits each; a pair is a candidate when it collides in
   * ANY band. Comparisons happen only within (band, bucket) — with enough
   * bits per band, buckets stay small at corpus scale (2^bitsPerBand
   * buckets per band) while multiple bands keep recall high; hot buckets
   * are additionally capped. The planes are deterministic
   * (Similarity.hyperplane), so the DuckDB oracle replays the exact
   * bucketing from the same literal planes.
   */
  def embeddingCosinePairs(
      emb: DataFrame, vecCol: String, idCol: String,
      minCosine: Double = 0.95, bands: Int = 4, bitsPerBand: Int = 16,
      maxBucketSize: Int = 100000, seed: Long = 42L): DataFrame = {
    graft.functions.GraftFunctions.register(emb.sparkSession)
    // dimension probe from the first NON-null vector (null vectors carry
    // no bucket and drop out of the band join naturally)
    val dimRow = emb.select(size(col(vecCol)).as("_d"))
      .filter(col("_d").isNotNull && col("_d") > 0).head(1)
    if (dimRow.isEmpty) {
      // empty corpus: empty pair frame with the output schema, no probing
      import emb.sparkSession.implicits._
      return Seq.empty[(Long, Long, Double)].toDF("id_a", "id_b", "cosine")
        .select(col("id_a").cast(emb.schema(idCol).dataType),
          col("id_b").cast(emb.schema(idCol).dataType), col("cosine"))
        .toDF("id_a", "id_b", "cosine")
    }
    val dim = dimRow(0).getInt(0)
    val v = col(vecCol).cast("array<double>")
    val base = emb.select(col(idCol).as("id"), v.as("v"))
    val bandCols = (0 until bands).map { bnd =>
      struct(lit(bnd).as("band"),
        Similarity.lshBucket(col("v"), dim, bitsPerBand, seed,
          planeOffset = bnd * bitsPerBand).as("key"))
    }
    // cache the bucketed frame: the bands*bitsPerBand hyperplane dot
    // products (and their codegen) run once, not once per join side and
    // once more for the bucket-count guard
    val keyed = base
      .select(col("id"), col("v"), explode(array(bandCols: _*)).as("bk"))
      .select(col("id"), col("v"), col("bk.band").as("band"), col("bk.key").as("key"))
      .cache()
    val kept = capBuckets(keyed, maxBucketSize, "embeddingCosinePairs")
    val a = kept.select(col("band"), col("key"), col("id").as("id_a"), col("v").as("v_a"))
    val b = kept.select(col("band"), col("key"), col("id").as("id_b"), col("v").as("v_b"))
    a.join(b, Seq("band", "key"))
      .filter(col("id_a") < col("id_b"))
      // native codegen kernel; sums in index order like the SQL oracle
      .withColumn("cosine", Similarity.cosineNative(col("v_a"), col("v_b")))
      .filter(col("cosine") >= minCosine)
      .select("id_a", "id_b", "cosine")
      .distinct()
  }

  /** SimHash near-dup candidate pairs with exact verification: split the
   * 64-bit fingerprint into maxHamming+1 bands — by pigeonhole, any pair
   * within hamming distance maxHamming agrees exactly on at least one
   * band — join per band (hot buckets capped), then verify with
   * bit_count(xor). No all-pairs comparison ever happens. */
  def simhashCandidatePairs(
      docs: DataFrame, textCol: String, idCol: String,
      maxHamming: Int = 8, maxBucketSize: Int = 100000,
      portable: Boolean = false): DataFrame = {
    val nBands = maxHamming + 1
    val bandBits = 64 / nBands
    // fingerprints cached (doc-count-sized): the bucket-cap guard and both
    // pair-join sides reuse one computation of the 64-bit-sum aggregation
    val fp = simhash(docs, textCol, idCol, portable).cache()
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
      .select(col("id"), col("simhash"), col("bk.band").as("band"), col("bk.key").as("key"))
    val kept = capBuckets(keyed, maxBucketSize, "simhashCandidatePairs")
    val a = kept.select(col("id").as("id_a"), col("simhash").as("h_a"),
      col("band"), col("key"))
    val b = kept.select(col("id").as("id_b"), col("simhash").as("h_b"),
      col("band"), col("key"))
    a.join(b, Seq("band", "key"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        bit_count(col("h_a").bitwiseXOR(col("h_b"))).cast("long").as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** SimHash: 64-bit fingerprint from token hashes; near-dups share most
   * bits. The default token hash is xxhash64 (fastest); `portable = true`
   * derives the 64 bits from the md5 hex digest nibble-by-nibble instead,
   * which the DuckDB oracle reproduces exactly (DuckDB has no xxhash64).
   * Bit b of a token = bit (b mod 4) of nibble (b div 4) of the digest. */
  def simhash(
      docs: DataFrame, textCol: String, idCol: String,
      portable: Boolean = false): DataFrame = {
    val tokens = docs.select(col(idCol),
      explode(split(col(textCol), " ", -1)).as("t"))
      .filter(length(col("t")) > 0)
    val (hashed, bitSet) =
      if (portable) {
        val withHex = tokens.withColumn("hx", md5(col("t")))
        // one int column per hex nibble, shared by its 4 bit extractions
        val withNibbles = (0 until 16).foldLeft(withHex)((d, j) =>
          d.withColumn(s"v$j", conv(substring(col("hx"), j + 1, 1), 16, 10).cast("int")))
        (withNibbles,
          (b: Int) => shiftright(col(s"v${b / 4}"), b % 4).bitwiseAND(lit(1)) === 1)
      } else {
        val withH = tokens.withColumn("h", xxhash64(col("t")))
        (withH, (b: Int) => shiftright(col("h"), b).bitwiseAND(lit(1L)) === lit(1L))
      }
    // per bit b: sum(+1 if bit set else -1); fingerprint bit = sign
    val bitCols = (0 until 64).map { b =>
      sum(when(bitSet(b), 1).otherwise(-1)).as(s"b$b")
    }
    val agg = hashed.groupBy(col(idCol)).agg(bitCols.head, bitCols.tail: _*)
    val fp = (0 until 64).map(b =>
      when(col(s"b$b") > 0, shiftleft(lit(1L), b)).otherwise(lit(0L)))
      .reduce((x, y) => x.bitwiseOR(y))
    agg.select(col(idCol), fp.as("simhash"))
  }
}
