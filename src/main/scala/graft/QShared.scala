package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ebw.{DesignMatrix, EbwOptions, EntropyBalance, GroupedEntropyBalance}
import graft.ops.{Dedup, Similarity, Skew, TextMetrics}

/** Shared plumbing for the per-family gate files (Queries*): table
 * readers, shared eval frames, oracle CTE/text builders, and the
 * operator constants both a query and its oracle must agree on.
 * Package-private — the public driver contract stays SparkEntry. */
private[graft] object QShared {

  def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  /**
   * `events` with `ts_us` = exact epoch MICROS, whatever physical type
   * the generator shipped: parquet TIMESTAMP(NANOS) reads as long nanos
   * under the legacy conf (`div 1000` — integral: epoch-nanos exceed
   * double's 2^53 exact range, so `/ 1000` could be off by ±1 µs), and
   * TIMESTAMP(MICROS) reads as TIMESTAMP_NTZ whose UTC-session cast to
   * TIMESTAMP makes unix_micros exact — both equal DuckDB's
   * epoch_us(ts), so every oracle stays engine-portable.
   */
  def eventsTsUs(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.{LongType, TimestampNTZType}
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val ev = t(s, dir, "events")
    val tsUs = ev.schema("ts").dataType match {
      case LongType => expr("ts div 1000")
      case TimestampNTZType => unix_micros(col("ts").cast("timestamp"))
      case _ => unix_micros(col("ts"))
    }
    ev.withColumn("ts_us", tsUs)
  }

  /** Corpus band-key indexes the dedup_minhash_incr gate has already
   * persisted this process, keyed by sf dir (see that gate's comment). */
  val minhashIdxPaths =
    new java.util.concurrent.ConcurrentHashMap[String, String]()


  // ------------------------------------------------------------- EBW helpers

  def ebwPoststrat(s: SparkSession, dir: String): DataFrame = {
    val orders = t(s, dir, "orders").withColumn("w0", lit(1.0))
    val (dfv, labels) = DesignMatrix.oneHot(orders, "o_orderpriority", "feat")
    val k = labels.length
    val res = EntropyBalance.entropyBalance(dfv, "feat", "w0",
      Array.fill(k)(1.0 / k), options = EbwOptions(optimalityTol = 1e-11))
    res.weighted
      .select(col("o_orderkey"), round(col("weight_new"), 6).as("new_weight"))
      .orderBy("o_orderkey")
  }

  /** Solve on customer with a mixed continuous+dummy design targeting the
   * c_custkey%3==0 subpopulation means; emit the achieved weighted means
   * (which must equal the SQL-computed targets when converged). */
  def ebwMomentsMatch(
      s: SparkSession, dir: String, bounds: Option[(Double, Option[Double])]): DataFrame = {
    val cust = t(s, dir, "customer")
      .withColumn("bal_k", col("c_acctbal") / 1000.0)
      .withColumn("lownation", when(col("c_nationkey") < 13, 1.0).otherwise(0.0))
      .withColumn("w0", lit(1.0))
      .withColumn("feat", array(col("bal_k"), col("lownation")))
    val sub = cust.filter(col("c_custkey") % 3 === 0)
    val mrow = sub.agg(avg("bal_k"), avg("lownation")).collect()(0)
    val m = Array(mrow.getDouble(0), mrow.getDouble(1))
    val res = EntropyBalance.entropyBalance(cust, "feat", "w0", m,
      options = EbwOptions(optimalityTol = 1e-10, bounds = bounds))
    val wtot = res.weighted
      .agg(sum("w0").as("w"),
        sum(col("bal_k") * col("weight_new")).as("s0"),
        sum(col("lownation") * col("weight_new")).as("s1"))
      .collect()(0)
    import s.implicits._
    Seq(("m0_bal_k", wtot.getDouble(1) / wtot.getDouble(0)),
      ("m1_lownation", wtot.getDouble(2) / wtot.getDouble(0)))
      .toDF("moment", "value")
      .select(col("moment"), round(col("value"), 4).as("value"))
      .orderBy("moment")
  }

  val ebwMomentsOracle: String =
    """SELECT 'm0_bal_k' AS moment, round(avg(c_acctbal/1000.0), 4) AS value
      |FROM customer WHERE c_custkey % 3 = 0
      |UNION ALL
      |SELECT 'm1_lownation' AS moment,
      |  round(avg(CASE WHEN c_nationkey < 13 THEN 1.0 ELSE 0.0 END), 4) AS value
      |FROM customer WHERE c_custkey % 3 = 0
      |ORDER BY moment""".stripMargin

  // --------------------------------------------- shared gate parameters
  // (the Spark query and its DuckDB oracle must agree on these exactly)

  val ngramMaxBucket = 2000
  // 4 bands x 8 bits = 256 buckets/band suits the 500-5000-vector test
  // corpus (bitsPerBand scales as ~log2(N) in production; the operator's
  // own defaults are 4 x 16); the oracle replays the identical banding.
  val embCosMinCosine = 0.25
  val embCosBands = 4
  val embCosBits = 8
  val embCosMaxBucket = 1000
  val embDim = 64 // testdata embeddings dimension

  // --------------------------------------------- generated oracle SQL

  /** Portable simhash: bit b of a token is bit (b mod 4) of hex nibble
   * (b div 4) of md5(token); per-doc bit b of the fingerprint is the sign
   * of sum(+1/-1) over tokens. Emitted as a 16-char hex string, most
   * significant nibble first (mirrors Spark's lpad(hex(long))). */
  def simhashOracle: String = {
    val bitSums = (0 until 64).map { b =>
      val j = b / 4
      val c = 1 << (b % 4)
      s"sum(CASE WHEN ((strpos('0123456789abcdef', substr(hx, ${j + 1}, 1)) - 1) // $c) % 2 = 1 THEN 1 ELSE -1 END) AS b$b"
    }.mkString(",\n    ")
    val nibbleChars = (15 to 0 by -1).map { j =>
      val terms = (0 until 4)
        .map(i => s"(CASE WHEN b${4 * j + i} > 0 THEN ${1 << i} ELSE 0 END)")
        .mkString(" + ")
      s"substr('0123456789abcdef', ($terms) + 1, 1)"
    }.mkString(" ||\n    ")
    s"""WITH tok AS (
       |  SELECT doc_id, md5(t) AS hx FROM (
       |    SELECT doc_id, unnest(str_split(text, ' ')) AS t FROM documents)
       |  WHERE t <> ''),
       |bits AS (
       |  SELECT doc_id,
       |    $bitSums
       |  FROM tok GROUP BY doc_id)
       |SELECT doc_id,
       |    $nibbleChars AS simhash_hex
       |FROM bits ORDER BY doc_id""".stripMargin
  }

  /** SimHash candidate-pair oracle: the portable fingerprint's 64 sign
   * sums feed integer band keys (pigeonhole bands, maxHamming+1 of them),
   * hot buckets are capped, and pairs verify with an exact 64-term
   * hamming sum — the whole pipeline in SQL arithmetic. */
  def simhashPairsOracle: String = {
    val maxHamming = 8
    val nBands = maxHamming + 1
    val bandBits = 64 / nBands
    val bitSums = (0 until 64).map { b =>
      val j = b / 4
      val c = 1 << (b % 4)
      s"sum(CASE WHEN ((strpos('0123456789abcdef', substr(hx, ${j + 1}, 1)) - 1) // $c) % 2 = 1 THEN 1 ELSE -1 END) AS b$b"
    }.mkString(",\n    ")
    val bandSelects = (0 until nBands).map { bi =>
      val lo = bi * bandBits
      val width = if (bi == nBands - 1) 64 - lo else bandBits
      val key = (0 until width)
        .map(j => s"(CASE WHEN b${lo + j} > 0 THEN ${1L << j} ELSE 0 END)")
        .mkString(" + ")
      s"SELECT doc_id, $bi AS band, ($key)::BIGINT AS key FROM bits"
    }.mkString("\n  UNION ALL\n  ")
    val hamming = (0 until 64)
      .map(b => s"(CASE WHEN (x.b$b > 0) <> (y.b$b > 0) THEN 1 ELSE 0 END)")
      .mkString(" + ")
    s"""WITH docs2 AS (
       |  SELECT doc_id, text FROM documents
       |  UNION ALL
       |  SELECT doc_id + 1000000 AS doc_id,
       |    text || ' tail tokens appended here' AS text FROM documents),
       |tok AS (
       |  SELECT doc_id, md5(t) AS hx FROM (
       |    SELECT doc_id, unnest(str_split(text, ' ')) AS t FROM docs2)
       |  WHERE t <> ''),
       |bits AS (
       |  SELECT doc_id,
       |    $bitSums
       |  FROM tok GROUP BY doc_id),
       |bk AS (
       |  $bandSelects),
       |bn AS (SELECT band, key, count(*) AS c FROM bk GROUP BY 1, 2),
       |bk2 AS (SELECT bk.* FROM bk JOIN bn USING (band, key)
       |  WHERE bn.c <= $ngramMaxBucket),
       |cand AS (
       |  SELECT DISTINCT a.doc_id AS ia, b.doc_id AS ib
       |  FROM bk2 a JOIN bk2 b
       |    ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id),
       |ham AS (
       |  SELECT c.ia, c.ib, ($hamming)::BIGINT AS hamming
       |  FROM cand c
       |  JOIN bits x ON x.doc_id = c.ia
       |  JOIN bits y ON y.doc_id = c.ib)
       |SELECT ia AS id_a, ib AS id_b, hamming FROM ham
       |WHERE hamming <= $maxHamming
       |ORDER BY id_a, id_b""".stripMargin
  }

  /** Multi-block (d = 2) simhash candidate-pair oracle — the SCALE path
   * under the same full-SQL standard as the d = 1 gate: the portable
   * fingerprint's 64 sign sums feed 10 = maxHamming + 2 block values,
   * every 2-block combination keys an md5 composite ('|'-joined
   * combination indexes + decimal block values — exactly Spark's
   * portable key scheme), hot buckets are capped, and pairs verify
   * with the exact 64-term hamming sum. */
  def simhashPairsMbOracle: String = {
    val maxHamming = 8
    val d = 2
    val nBlocks = maxHamming + d
    val bandBits = 64 / nBlocks
    val bitSums = (0 until 64).map { b =>
      val j = b / 4
      val c = 1 << (b % 4)
      s"sum(CASE WHEN ((strpos('0123456789abcdef', substr(hx, ${j + 1}, 1)) - 1) // $c) % 2 = 1 THEN 1 ELSE -1 END) AS b$b"
    }.mkString(",\n    ")
    val blockCols = (0 until nBlocks).map { i =>
      val lo = i * bandBits
      val width = if (i == nBlocks - 1) 64 - lo else bandBits
      val v = (0 until width)
        .map(j => s"(CASE WHEN b${lo + j} > 0 THEN ${1L << j} ELSE 0 END)")
        .mkString(" + ")
      s"($v)::BIGINT AS blk$i"
    }.mkString(",\n    ")
    // the SAME combination enumeration as simhashMultiBlockCols — band
    // ids and key text must match Spark's plan-time literals exactly
    val comboSelects = (0 until nBlocks).combinations(d).toSeq.zipWithIndex
      .map { case (combo, bi) =>
        val key = (combo.map(i => s"'$i'") ++
          combo.map(i => s"blk$i::VARCHAR")).mkString(" || '|' || ")
        s"SELECT doc_id, $bi AS band, md5($key) AS key FROM blk"
      }.mkString("\n  UNION ALL\n  ")
    val hamming = (0 until 64)
      .map(b => s"(CASE WHEN (x.b$b > 0) <> (y.b$b > 0) THEN 1 ELSE 0 END)")
      .mkString(" + ")
    s"""WITH docs2 AS (
       |  SELECT doc_id, text FROM documents
       |  UNION ALL
       |  SELECT doc_id + 1000000 AS doc_id,
       |    text || ' tail tokens appended here' AS text FROM documents),
       |tok AS (
       |  SELECT doc_id, md5(t) AS hx FROM (
       |    SELECT doc_id, unnest(str_split(text, ' ')) AS t FROM docs2)
       |  WHERE t <> ''),
       |bits AS (
       |  SELECT doc_id,
       |    $bitSums
       |  FROM tok GROUP BY doc_id),
       |blk AS (
       |  SELECT doc_id,
       |    $blockCols
       |  FROM bits),
       |bk AS (
       |  $comboSelects),
       |bn AS (SELECT band, key, count(*) AS c FROM bk GROUP BY 1, 2),
       |bk2 AS (SELECT bk.* FROM bk JOIN bn USING (band, key)
       |  WHERE bn.c <= $ngramMaxBucket),
       |cand AS (
       |  SELECT DISTINCT a.doc_id AS ia, b.doc_id AS ib
       |  FROM bk2 a JOIN bk2 b
       |    ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id),
       |ham AS (
       |  SELECT c.ia, c.ib, ($hamming)::BIGINT AS hamming
       |  FROM cand c
       |  JOIN bits x ON x.doc_id = c.ia
       |  JOIN bits y ON y.doc_id = c.ib)
       |SELECT ia AS id_a, ib AS id_b, hamming FROM ham
       |WHERE hamming <= $maxHamming
       |ORDER BY id_a, id_b""".stripMargin
  }

  /** Full-pipeline ngram-Jaccard oracle: replays the md5 minhash
   * signatures, 2-hash banding, hot-bucket cap, candidate join, and exact
   * within-bucket Jaccard of Dedup.ngramJaccardPairs on the same
   * docs-plus-mutated-copies union the gate query builds. */
  def ngramJaccardOracle: String =
    s"""WITH docs2 AS (
       |  SELECT doc_id, text FROM documents
       |  UNION ALL
       |  SELECT doc_id + 1000000 AS doc_id,
       |    text || ' tail tokens appended here' AS text FROM documents),
       |tok AS (
       |  SELECT doc_id, str_split(text, ' ') AS tk FROM docs2
       |  WHERE len(str_split(text, ' ')) >= 3),
       |sh0 AS (
       |  SELECT doc_id, array_to_string(tk[i:i+2], ' ') AS s
       |  FROM tok, unnest(generate_series(1, len(tk) - 2)) AS u(i)),
       |sh AS (SELECT DISTINCT doc_id, s FROM sh0),
       |hh AS (
       |  SELECT doc_id, j,
       |    min(substr(md5(concat((j // 4)::VARCHAR, '|', s)), (j % 4) * 8 + 1, 8)) AS mh
       |  FROM sh, unnest(generate_series(0, 7)) AS g(j)
       |  GROUP BY doc_id, j),
       |bk AS (
       |  SELECT doc_id, j // 2 AS band, string_agg(mh, '|' ORDER BY j) AS key
       |  FROM hh GROUP BY doc_id, j // 2),
       |bn AS (SELECT band, key, count(*) AS c FROM bk GROUP BY 1, 2),
       |bk2 AS (SELECT bk.* FROM bk JOIN bn USING (band, key)
       |  WHERE bn.c <= $ngramMaxBucket),
       |cand AS (
       |  SELECT DISTINCT a.doc_id AS ia, b.doc_id AS ib
       |  FROM bk2 a JOIN bk2 b
       |    ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id),
       |sizes AS (SELECT doc_id, count(*) AS c FROM sh GROUP BY 1),
       |inter AS (
       |  SELECT c.ia, c.ib, count(*) AS n
       |  FROM cand c
       |  JOIN sh x ON x.doc_id = c.ia
       |  JOIN sh y ON y.doc_id = c.ib AND y.s = x.s
       |  GROUP BY c.ia, c.ib)
       |SELECT i.ia AS id_a, i.ib AS id_b,
       |  round(i.n * 1.0 / (sa.c + sb.c - i.n), 4) AS jaccard
       |FROM inter i
       |JOIN sizes sa ON sa.doc_id = i.ia
       |JOIN sizes sb ON sb.doc_id = i.ib
       |WHERE i.n * 1.0 / (sa.c + sb.c - i.n) >= 0.5
       |ORDER BY id_a, id_b""".stripMargin

  /** MinHash banding pairs oracle: per-family md5 signatures (the
   * minhashSignatures hashing), 2-hash bands, hot-bucket cap, distinct
   * within-bucket pairs — the full candidate-generation pipeline in SQL. */
  /** Shared banding CTEs (docs ∪ mutated clones → capped band keys) for
   * both minhash pair oracles — one definition so the self-join and
   * incremental gates can never desynchronize. */
  def minhashBandingCtes: String =
    s"""WITH docs2 AS (
       |  SELECT doc_id, text FROM documents
       |  UNION ALL
       |  SELECT doc_id + 1000000 AS doc_id,
       |    text || ' tail tokens appended here' AS text FROM documents),
       |tok AS (
       |  SELECT doc_id, str_split(text, ' ') AS tk FROM docs2
       |  WHERE len(str_split(text, ' ')) >= 3),
       |sh AS (
       |  SELECT doc_id, array_to_string(tk[i:i+2], ' ') AS s
       |  FROM tok, unnest(generate_series(1, len(tk) - 2)) AS u(i)),
       |hh AS (
       |  SELECT doc_id, j, min(md5(concat(j::VARCHAR, '|', s))) AS mh
       |  FROM sh, unnest(generate_series(0, 7)) AS g(j)
       |  GROUP BY doc_id, j),
       |bk AS (
       |  SELECT doc_id, j // 2 AS band, string_agg(mh, '|' ORDER BY j) AS key
       |  FROM hh GROUP BY doc_id, j // 2),
       |bn AS (SELECT band, key, count(*) AS c FROM bk GROUP BY 1, 2),
       |bk2 AS (SELECT bk.* FROM bk JOIN bn USING (band, key)
       |  WHERE bn.c <= $ngramMaxBucket)""".stripMargin

  /** LSH accuracy harness oracle: the minhashBandingCtes construction on
   * the gate's 1/10 sample (the harness's documented regime — truth is
   * uncapped, so the EVAL samples instead), distinct-shingle
   * inverted-index truth, and the per-pair S-curve prediction
   * 1-(1-j^2)^4 (bandSize 2, 4 bands). */
  def lshEvalOracle: String =
    s"""WITH docs2 AS (
       |  SELECT doc_id, text FROM documents WHERE doc_id % 10 = 0
       |  UNION ALL
       |  SELECT doc_id + 1000000 AS doc_id,
       |    text || ' tail tokens appended here' AS text FROM documents
       |  WHERE doc_id % 10 = 0),
       |tok AS (
       |  SELECT doc_id, str_split(text, ' ') AS tk FROM docs2
       |  WHERE len(str_split(text, ' ')) >= 3),
       |sh AS (
       |  SELECT doc_id, array_to_string(tk[i:i+2], ' ') AS s
       |  FROM tok, unnest(generate_series(1, len(tk) - 2)) AS u(i)),
       |hh AS (
       |  SELECT doc_id, j, min(md5(concat(j::VARCHAR, '|', s))) AS mh
       |  FROM sh, unnest(generate_series(0, 7)) AS g(j)
       |  GROUP BY doc_id, j),
       |bk AS (
       |  SELECT doc_id, j // 2 AS band, string_agg(mh, '|' ORDER BY j) AS key
       |  FROM hh GROUP BY doc_id, j // 2),
       |bn AS (SELECT band, key, count(*) AS c FROM bk GROUP BY 1, 2),
       |bk2 AS (SELECT bk.* FROM bk JOIN bn USING (band, key)
       |  WHERE bn.c <= $ngramMaxBucket),
       |sh2 AS (SELECT DISTINCT doc_id, s FROM sh),
       |sizes AS (SELECT doc_id, count(*) AS c FROM sh2 GROUP BY 1),
       |inter AS (SELECT x.doc_id AS ia, y.doc_id AS ib, count(*) AS n
       |  FROM sh2 x JOIN sh2 y ON y.s = x.s AND x.doc_id < y.doc_id
       |  GROUP BY 1, 2),
       |tr AS (SELECT i.ia, i.ib, i.n * 1.0 / (sa.c + sb.c - i.n) AS j
       |  FROM inter i JOIN sizes sa ON sa.doc_id = i.ia
       |  JOIN sizes sb ON sb.doc_id = i.ib
       |  WHERE i.n * 1.0 / (sa.c + sb.c - i.n) >= 0.5),
       |cand AS (SELECT DISTINCT a.doc_id AS ia, b.doc_id AS ib
       |  FROM bk2 a JOIN bk2 b
       |    ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id),
       |t AS (SELECT count(*)::BIGINT AS n_truth,
       |    sum(1 - pow(1 - pow(j, 2), 4)) AS psum FROM tr),
       |c AS (SELECT count(*)::BIGINT AS n_candidates FROM cand),
       |h AS (SELECT count(*)::BIGINT AS n_hits
       |  FROM cand JOIN tr USING (ia, ib))
       |SELECT n_truth, n_candidates, n_hits,
       |  round(CASE WHEN n_candidates > 0
       |    THEN n_hits::DOUBLE / n_candidates ELSE 0.0 END, 4) AS precision,
       |  round(CASE WHEN n_truth > 0
       |    THEN n_hits::DOUBLE / n_truth ELSE 0.0 END, 4) AS recall,
       |  round(CASE WHEN n_truth > 0
       |    THEN psum / n_truth ELSE 0.0 END, 4) AS predicted_recall
       |FROM t, c, h""".stripMargin

  def minhashPairsOracle: String =
    s"""$minhashBandingCtes
       |SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
       |FROM bk2 a JOIN bk2 b
       |  ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
       |ORDER BY id_a, id_b""".stripMargin

  /** Incremental gate: new docs (ids >= 1000000) paired against the
   * corpus index + themselves; corpus-corpus pairs excluded by
   * construction, exactly like minhashCandidatePairsIncremental. */
  def minhashIncrOracle: String =
    s"""$minhashBandingCtes
       |SELECT DISTINCT a.doc_id AS id_new, b.doc_id AS id_match,
       |  b.doc_id < 1000000 AS from_corpus
       |FROM bk2 a JOIN bk2 b
       |  ON a.band = b.band AND a.key = b.key
       |WHERE a.doc_id >= 1000000
       |  AND (b.doc_id < 1000000 OR a.doc_id < b.doc_id)
       |ORDER BY id_new, id_match""".stripMargin

  /** Multi-band hyperplane-LSH near-dup oracle: the exact plane literals
   * from Similarity.hyperplane are inlined, so DuckDB reproduces the same
   * buckets, the same hot-bucket cap, and the same within-bucket cosine
   * threshold as Dedup.embeddingCosinePairs. */
  def embedCosineOracle: String = {
    val planeRows = (for {
      band <- 0 until embCosBands
      bit <- 0 until embCosBits
    } yield {
      val vals = Similarity.hyperplane(band * embCosBits + bit, embDim)
        .map(_.toString).mkString(", ")
      s"($band, $bit, [$vals])"
    }).mkString(",\n    ")
    s"""WITH pl(band, bit, vec) AS (VALUES
       |    $planeRows),
       |pc AS (SELECT band, bit, generate_subscripts(vec, 1) AS i,
       |    unnest(vec) AS c FROM pl),
       |e AS (SELECT vec_id, generate_subscripts(embedding, 1) AS i,
       |    unnest(embedding)::DOUBLE AS x FROM embeddings),
       |sgn AS (SELECT e.vec_id, pc.band, pc.bit,
       |    CASE WHEN sum(e.x * pc.c) >= 0 THEN 1 ELSE 0 END AS b
       |  FROM e JOIN pc ON e.i = pc.i GROUP BY 1, 2, 3),
       |bk AS (SELECT vec_id, band, sum(b * (1 << bit)) AS key
       |  FROM sgn GROUP BY 1, 2),
       |bn AS (SELECT band, key, count(*) AS c FROM bk GROUP BY 1, 2),
       |bk2 AS (SELECT bk.* FROM bk JOIN bn USING (band, key)
       |  WHERE bn.c <= $embCosMaxBucket),
       |cand AS (SELECT DISTINCT a.vec_id AS ia, b.vec_id AS ib
       |  FROM bk2 a JOIN bk2 b
       |    ON a.band = b.band AND a.key = b.key AND a.vec_id < b.vec_id),
       |d AS (SELECT c.ia, c.ib, sum(ea.x * eb.x) AS dp,
       |    sqrt(sum(ea.x * ea.x)) AS na, sqrt(sum(eb.x * eb.x)) AS nb
       |  FROM cand c
       |  JOIN e ea ON ea.vec_id = c.ia
       |  JOIN e eb ON eb.vec_id = c.ib AND eb.i = ea.i
       |  GROUP BY c.ia, c.ib),
       |cs AS (SELECT ia, ib,
       |    CASE WHEN na * nb > 0 THEN dp / (na * nb) ELSE 0.0 END AS cosine
       |  FROM d)
       |SELECT ia AS id_a, ib AS id_b, round(cosine, 5) AS cosine FROM cs
       |WHERE cosine >= $embCosMinCosine
       |ORDER BY id_a, id_b""".stripMargin
  }

  /** Stopword-marker langid oracle: counts each marker via replace()
   * (non-overlapping left-to-right in both engines), argmax with the same
   * tie order (alphabetical) as the Spark fold, 'und' when zero hits. */
  def langidOracle: String = {
    val perLang = TextMetrics.langMarkers.toSeq.sortBy(_._1).map { case (l, ws) =>
      val terms = ws.map(w =>
        s"(length(p) - length(replace(p, '$w', ''))) / ${w.length}").mkString(" + ")
      s"SELECT doc_id, '$l' AS lang, $terms AS hits FROM d"
    }.mkString("\n  UNION ALL\n  ")
    s"""WITH d AS (SELECT doc_id, ' ' || text || ' ' AS p FROM documents),
       |s AS (
       |  $perLang),
       |r AS (SELECT doc_id, lang, hits,
       |    row_number() OVER (PARTITION BY doc_id ORDER BY hits DESC, lang) AS rn
       |  FROM s)
       |SELECT doc_id,
       |  CASE WHEN hits > 0 THEN lang ELSE 'und' END AS lang_pred
       |FROM r WHERE rn = 1 ORDER BY doc_id""".stripMargin
  }

  /** LSH-bucketed ANN oracle: the 3 hyperplanes are inlined; DuckDB
   * recomputes every vector's bucket (including the query's), filters to
   * the query's bucket, and ranks by the rounded cosine. */
  def annLshOracle: String = {
    val bits = 3
    val planeRows = (0 until bits).map { p =>
      val vals = Similarity.hyperplane(p, embDim).map(_.toString).mkString(", ")
      s"($p, [$vals])"
    }.mkString(",\n    ")
    s"""WITH pl(p, vec) AS (VALUES
       |    $planeRows),
       |pc AS (SELECT p, generate_subscripts(vec, 1) AS i, unnest(vec) AS c FROM pl),
       |e AS (SELECT vec_id, generate_subscripts(embedding, 1) AS i,
       |    unnest(embedding)::DOUBLE AS x FROM embeddings),
       |sgn AS (SELECT e.vec_id, pc.p,
       |    CASE WHEN sum(e.x * pc.c) >= 0 THEN 1 ELSE 0 END AS b
       |  FROM e JOIN pc ON e.i = pc.i GROUP BY e.vec_id, pc.p),
       |bk AS (SELECT vec_id, sum(b * (1 << p)) AS bucket FROM sgn GROUP BY vec_id),
       |qb AS (SELECT bucket FROM bk WHERE vec_id = 0),
       |cand AS (SELECT bk.vec_id FROM bk, qb
       |  WHERE bk.bucket = qb.bucket AND bk.vec_id <> 0),
       |q AS (SELECT generate_subscripts(embedding, 1) AS i,
       |    unnest(embedding)::DOUBLE AS qv FROM embeddings WHERE vec_id = 0),
       |ec AS (SELECT e.vec_id, e.i, e.x FROM e JOIN cand USING (vec_id)),
       |d AS (SELECT ec.vec_id, sum(ec.x * q.qv) AS dp,
       |    sqrt(sum(ec.x * ec.x)) AS na
       |  FROM ec JOIN q ON ec.i = q.i GROUP BY ec.vec_id),
       |nq AS (SELECT sqrt(sum(qv * qv)) AS nqn FROM q)
       |SELECT d.vec_id,
       |  round(CASE WHEN d.na * nq.nqn > 0
       |        THEN d.dp / (d.na * nq.nqn) ELSE 0.0 END, 5) AS cosine
       |FROM d, nq
       |ORDER BY cosine DESC, d.vec_id
       |LIMIT 10""".stripMargin
  }

  /** Penalty-mode oracle. For a disjoint one-hot design the penalty fixed
   * point z = P(A'r(z) - b), r = exp(-x.z) decouples into one scalar
   * equation per group: z = p(c*exp(-z) - b) with c the group count and
   * b = N/k the aggregate target. The oracle solves it with 10 scalar
   * Newton steps in SQL (monotone convergence to machine precision) and
   * emits the closed-form weights exp(-z). */
  def ebwPenaltyOracle: String = {
    val newtonSteps = (1 to 10).map { i =>
      s"t$i AS (SELECT o_orderpriority, c, b, " +
        s"z - (z - 2.0*(c*exp(-z) - b)) / (1.0 + 2.0*c*exp(-z)) AS z FROM t${i - 1})"
    }.mkString(",\n")
    s"""WITH g AS (SELECT o_orderpriority, count(*)::DOUBLE AS c
       |  FROM orders GROUP BY 1),
       |nk AS (SELECT count(*)::DOUBLE AS n,
       |    count(DISTINCT o_orderpriority)::DOUBLE AS k FROM orders),
       |t0 AS (SELECT g.o_orderpriority, g.c, nk.n / nk.k AS b, 0.0 AS z
       |  FROM g, nk),
       |$newtonSteps
       |SELECT o.o_orderkey, round(exp(-t.z), 6) AS new_weight
       |FROM orders o JOIN t10 t ON o.o_orderpriority = t.o_orderpriority
       |ORDER BY o.o_orderkey""".stripMargin
  }

  /** Grouped-penalty oracle: the per-(status, priority) cell fixed point
   * z = p(c*exp(-z) - b) with c the cell count and b = N_status / k —
   * solved by the same 10 scalar Newton steps as ebwPenaltyOracle. */
  def ebwGroupedPenaltyOracle: String = {
    val newtonSteps = (1 to 10).map { i =>
      s"t$i AS (SELECT o_orderstatus, o_orderpriority, c, b, " +
        s"z - (z - 2.0*(c*exp(-z) - b)) / (1.0 + 2.0*c*exp(-z)) AS z FROM t${i - 1})"
    }.mkString(",\n")
    s"""WITH g AS (SELECT o_orderstatus, o_orderpriority, count(*)::DOUBLE AS c
       |  FROM orders GROUP BY 1, 2),
       |ns AS (SELECT o_orderstatus, count(*)::DOUBLE AS n
       |  FROM orders GROUP BY 1),
       |kk AS (SELECT count(DISTINCT o_orderpriority)::DOUBLE AS k FROM orders),
       |t0 AS (SELECT g.o_orderstatus, g.o_orderpriority, g.c,
       |    ns.n / kk.k AS b, 0.0 AS z
       |  FROM g JOIN ns USING (o_orderstatus), kk),
       |$newtonSteps
       |SELECT o.o_orderkey, round(exp(-t.z), 6) AS new_weight
       |FROM orders o JOIN t10 t
       |  ON o.o_orderstatus = t.o_orderstatus
       | AND o.o_orderpriority = t.o_orderpriority
       |ORDER BY o.o_orderkey""".stripMargin
  }

  /** One SQL text, two engines: the `q_sql_exists` gate feeds this EXACT
   * string to `spark.sql` over temp views AND to DuckDB as its oracle —
   * the SQL front door is gated on dialect-portable text by construction. */
  val sqlExistsText: String =
    """SELECT o_orderpriority, count(*) AS order_count
      |FROM orders o
      |WHERE EXISTS (
      |  SELECT 1 FROM lineitem l
      |  WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity >= 30)
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin

  /** LATERAL correlated-derived-table text, shared verbatim (the
   * q_sql_exists pattern): the per-row subquery-in-FROM surface — Spark
   * plans the correlation as a decorrelated aggregate + join, DuckDB as a
   * lateral loop, and both must produce the identical per-customer
   * aggregates over the customer's own orders. The customer subset keeps
   * the gate bounded at every SF. */
  val sqlLateralText: String =
    """SELECT c.c_custkey, o.mx, o.n
      |FROM customer c,
      |LATERAL (SELECT max(o_totalprice) AS mx, count(*) AS n
      |         FROM orders
      |         WHERE o_custkey = c.c_custkey) o
      |WHERE c.c_custkey <= 200
      |ORDER BY c.c_custkey""".stripMargin

  /** GROUPING SETS text shared verbatim with the DuckDB oracle (the
   * q_sql_exists pattern): the explicit-sets general form that cube/rollup
   * are shorthands for — one of the three sets is a partial set, so
   * neither CUBE nor ROLLUP could express the same result. */
  val sqlGroupingSetsText: String =
    """SELECT coalesce(l_returnflag, 'ALL') AS rf,
      |  coalesce(l_linestatus, 'ALL') AS ls,
      |  count(*) AS n, round(sum(l_quantity), 2) AS qty
      |FROM lineitem
      |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus),
      |  (l_returnflag, l_linestatus))
      |ORDER BY rf, ls""".stripMargin

  /** Correlated scalar subquery, shared text (the q_sql_exists pattern):
   * the subquery is correlated on the outer customer key and must produce
   * exactly one value per outer row — Catalyst rewrites it to an outer
   * aggregate join; DuckDB runs the identical text as the oracle. */
  val sqlScalarText: String =
    """SELECT c_custkey, c_mktsegment,
      |  coalesce((SELECT round(sum(o.o_totalprice), 2) FROM orders o
      |            WHERE o.o_custkey = c.c_custkey), 0.0) AS spend,
      |  (SELECT count(*) FROM orders o
      |   WHERE o.o_custkey = c.c_custkey
      |     AND o.o_orderpriority = '1-URGENT') AS n_urgent
      |FROM customer c
      |WHERE c.c_custkey < 500
      |ORDER BY c_custkey""".stripMargin

  /** DuckDB replay of the Gopher quality rules: identical spiking,
   * whitespace-class tokenization with empties dropped, token/line
   * lambdas for the array statistics, the shared stopword list probed on
   * the lowercased letters-only projection (regexp_replace needs the 'g'
   * flag — DuckDB replaces first-match-only by default, Spark replaces
   * all), and the keep verdict recomputed from the ROUNDED statistics
   * exactly as the operator does. */
  def gopherOracle: String = {
    val stops = TextMetrics.gopherStopwords
      .map(w => "(CASE WHEN instr(' ' || " +
        s"regexp_replace(lower(t), '[^a-z]', ' ', 'g') || ' ', ' $w ') > 0 " +
        "THEN 1 ELSE 0 END)")
      .mkString("\n    + ")
    s"""WITH sp AS (SELECT doc_id,
       |  '- bullet intro' || chr(10) || text ||
       |  CASE WHEN doc_id % 3 = 0
       |    THEN chr(10) || '• dotted line' || chr(10) || 'to be continued...'
       |    ELSE chr(10) || 'plain # tail line' END AS t
       |  FROM documents),
       |b AS (SELECT doc_id, t,
       |  list_filter(regexp_split_to_array(t, '\\s+'), x -> x != '') AS tok,
       |  string_split(t, chr(10)) AS ln
       |  FROM sp),
       |m AS (SELECT doc_id,
       |  len(tok)::BIGINT AS n_words,
       |  coalesce(list_sum(list_transform(tok, x -> len(x))), 0)::BIGINT
       |    AS word_chars,
       |  len(list_filter(tok, x -> regexp_matches(x, '[A-Za-z]')))::BIGINT
       |    AS n_alpha,
       |  (len(t) - len(replace(t, '#', '')))::BIGINT AS n_hash,
       |  ((len(t) - len(replace(t, '...', ''))) / 3)::BIGINT AS n_ell,
       |  len(ln)::BIGINT AS n_lines,
       |  len(list_filter(ln, x -> x LIKE '- %' OR x LIKE '• %'))::BIGINT
       |    AS n_bullet,
       |  len(list_filter(ln, x -> x LIKE '%...'))::BIGINT AS n_endell,
       |  ($stops)::BIGINT AS stop_hits
       |  FROM b),
       |r AS (SELECT doc_id, n_words,
       |  round(word_chars * 1.0 / n_words, 4) AS mean_word_len,
       |  round(n_alpha * 1.0 / n_words, 4) AS alpha_word_frac,
       |  round((n_hash + n_ell) * 1.0 / n_words, 4) AS symbol_word_ratio,
       |  n_lines,
       |  round(n_bullet * 1.0 / n_lines, 4) AS bullet_line_frac,
       |  round(n_endell * 1.0 / n_lines, 4) AS ellipsis_line_frac,
       |  stop_hits FROM m)
       |SELECT *,
       |  (CASE WHEN n_words >= 50 AND n_words <= 100000
       |     AND mean_word_len >= 3.0 AND mean_word_len <= 10.0
       |     AND symbol_word_ratio < 0.1 AND alpha_word_frac >= 0.8
       |     AND bullet_line_frac < 0.9 AND ellipsis_line_frac < 0.3
       |     AND stop_hits >= 2 THEN 1 ELSE 0 END)::BIGINT AS keep
       |FROM r ORDER BY doc_id""".stripMargin
  }

  /** DuckDB replay of BPE-budget chunking: the same per-word merge fold
   * as [[bpeOracle]], a window cumsum per document, the same
   * `(cum - c) div budget` chunk rule, and ORDER-BY-pos list aggregation
   * for byte-identical chunk texts. */
  def chunkBpeOracle: String = {
    val perWord = TextMetrics.bpeMerges.foldLeft(
      "concat(' ', rtrim(regexp_replace(w, '(.)', '\\1  ', 'g')), ' ')") {
        case (acc, (a, b)) => s"replace($acc, ' $a  $b ', ' $a$b ')"
      }
    s"""WITH b AS (SELECT doc_id,
       |  list_filter(regexp_split_to_array(text, '\\s+'), x -> x != '') AS tok
       |  FROM documents),
       |wd AS (SELECT doc_id, unnest(tok) AS w,
       |  generate_subscripts(tok, 1) AS pos FROM b),
       |c AS (SELECT doc_id, pos, w,
       |  len(string_split($perWord, '  '))::BIGINT AS c FROM wd),
       |s AS (SELECT doc_id, pos, w, c,
       |  (sum(c) OVER (PARTITION BY doc_id ORDER BY pos))::BIGINT AS cum
       |  FROM c),
       |a AS (SELECT doc_id, ((cum - c) // 64)::BIGINT AS chunk_id, pos, w, c
       |  FROM s)
       |SELECT doc_id, chunk_id,
       |  array_to_string(list(w ORDER BY pos), ' ') AS chunk_text,
       |  sum(c)::BIGINT AS n_bpe_tokens
       |FROM a GROUP BY doc_id, chunk_id
       |ORDER BY doc_id, chunk_id""".stripMargin
  }

  /** DuckDB replay of the trigram language model: the identical 6dp
   * log-probability profiles ([[TextMetrics.langIdModelRows]]) as a
   * VALUES table, the identical held-out-sentence spike, and the same
   * round-before-rank rule so float noise cannot flip the argmax. */
  def langIdModelOracle: String = {
    val model = TextMetrics.langIdModelRows
      .map { case (l, tri, p) => s"('$l','${tri.replace("'", "''")}',$p)" }
      .mkString(",\n    ")
    val floors = TextMetrics.langIdFloorRows
      .map { case (l, f) => s"('$l',$f)" }.mkString(", ")
    val cases = TextMetrics.langIdHeldOut
      .map { case (l, sent) => s"WHEN lang = '$l' THEN '$sent'" }
      .mkString("\n       ")
    s"""WITH model(lang, tri, logp) AS (VALUES
       |    $model),
       |floors(lang, flr) AS (VALUES $floors),
       |sp AS (SELECT doc_id,
       |  CASE $cases ELSE '' END AS t
       |  FROM documents),
       |b AS (SELECT doc_id,
       |    trim(regexp_replace(lower(t), '[^a-z]+', ' ', 'g')) AS s
       |  FROM sp),
       |tr AS (SELECT doc_id,
       |    list_transform(range(1, greatest(len(s) - 2, 0) + 1),
       |      i -> substring(s, i, 3)) AS tris
       |  FROM b WHERE len(s) >= 3),
       |dn AS (SELECT doc_id, len(tris)::BIGINT AS n_tri FROM tr),
       |dt AS (SELECT doc_id, unnest(tris) AS tri FROM tr),
       |mt AS (SELECT doc_id, lang, count(*)::BIGINT AS m, sum(logp) AS slp
       |  FROM dt JOIN model USING (tri) GROUP BY 1, 2),
       |al AS (SELECT dn.doc_id, f.lang, dn.n_tri,
       |    round((coalesce(mt.slp, 0) +
       |      (dn.n_tri - coalesce(mt.m, 0)) * f.flr) / dn.n_tri, 4) AS score
       |  FROM dn CROSS JOIN floors f
       |  LEFT JOIN mt ON mt.doc_id = dn.doc_id AND mt.lang = f.lang),
       |r AS (SELECT *, row_number() OVER (PARTITION BY doc_id
       |    ORDER BY score DESC, lang) AS rn FROM al)
       |SELECT doc_id, lang AS pred_lang, n_tri, score
       |FROM r WHERE rn = 1 ORDER BY doc_id""".stripMargin
  }

  /** DuckDB replay of the C4 rule set: the same spiked lines, the same
   * shared line predicates ([[TextMetrics.c4PunctLine]]/[[TextMetrics.c4BadLine]]
   * — LIKE and instr are dialect-common), list_filter for filter, and
   * coalesce around array_to_string because DuckDB maps the empty list to
   * NULL where Spark's array_join returns ''. */
  def c4Oracle: String = {
    val punct = TextMetrics.c4PunctLine
    val bad = TextMetrics.c4BadLine
    s"""WITH sp AS (SELECT doc_id,
       |  text || '.' || chr(10) ||
       |  CASE WHEN doc_id % 4 = 0 THEN 'click here javascript required.'
       |       WHEN doc_id % 4 = 1 THEN 'short line'
       |       WHEN doc_id % 4 = 2
       |         THEN 'read our privacy policy and terms of use.'
       |       ELSE 'a perfectly fine second sentence with many words in it.'
       |       END || chr(10) ||
       |  CASE WHEN doc_id % 7 = 0 THEN 'Lorem Ipsum dolor { sit amet'
       |       ELSE 'and a third closing sentence follows right here today!'
       |       END AS t
       |  FROM documents),
       |b AS (SELECT doc_id, t, string_split(t, chr(10)) AS ln FROM sp),
       |m AS (SELECT doc_id, t, ln,
       |  list_filter(ln, x -> $punct
       |    AND len(list_filter(string_split(x, ' '), w -> w != '')) >= 5
       |    AND $bad) AS kept
       |  FROM b),
       |r AS (SELECT doc_id,
       |  len(ln)::BIGINT AS n_lines,
       |  len(kept)::BIGINT AS n_kept_lines,
       |  round(len(list_filter(ln, x -> $punct)) * 1.0 / len(ln), 4)
       |    AS punct_line_frac,
       |  round(len(list_filter(ln, x -> len(x) < 30)) * 1.0 / len(ln), 4)
       |    AS short_line_frac,
       |  (CASE WHEN instr(lower(t), 'lorem ipsum') > 0 THEN 1 ELSE 0 END)
       |    ::BIGINT AS has_lorem,
       |  (CASE WHEN instr(t, '{') > 0 THEN 1 ELSE 0 END)::BIGINT AS has_curly,
       |  coalesce(array_to_string(kept, chr(10)), '') AS clean_text
       |  FROM m),
       |f AS (SELECT *,
       |  (len(clean_text) - len(replace(replace(replace(clean_text,
       |     '.', ''), '!', ''), '?', '')))::BIGINT AS n_sentences
       |  FROM r)
       |SELECT doc_id, n_lines, n_kept_lines, punct_line_frac,
       |  short_line_frac, has_lorem, has_curly, clean_text, n_sentences,
       |  (CASE WHEN has_lorem = 0 AND has_curly = 0 AND n_sentences >= 3
       |        AND n_kept_lines >= 1 THEN 1 ELSE 0 END)::BIGINT AS keep
       |FROM f ORDER BY doc_id""".stripMargin
  }

  /** DuckDB replay of the exact BPE token count: the same rank-ordered
   * merge table ([[TextMetrics.bpeMerges]]) nested as the same replace
   * chain over the same double-space symbol representation — only the
   * char-split prep differs by dialect (`\\1`+`'g'` vs `$1`; DuckDB
   * replaces first-match-only without the flag). list_sum returns
   * HUGEINT, so both sums cast to BIGINT before the compare hashes
   * dtypes. */
  /** The DuckDB per-word BPE encode fold (the [[TextMetrics.bpeMerges]]
   * replace chain over the double-space symbol representation) — shared
   * by every oracle that counts BPE tokens ([[bpeOracle]], the fertility
   * gate). `w` is the surrounding lambda's word variable. */
  def bpePerWordSql: String =
    TextMetrics.bpeMerges.foldLeft(
      "concat(' ', rtrim(regexp_replace(w, '(.)', '\\1  ', 'g')), ' ')") {
      case (acc, (a, b)) => s"replace($acc, ' $a  $b ', ' $a$b ')"
    }

  def bpeOracle: String = {
    val perWord = bpePerWordSql
    s"""WITH b AS (SELECT doc_id,
       |  list_filter(regexp_split_to_array(text, '\\s+'), x -> x != '') AS tok
       |  FROM documents),
       |m AS (SELECT doc_id,
       |  len(tok)::BIGINT AS n_words,
       |  coalesce(list_sum(list_transform(tok, w ->
       |    len(string_split($perWord, '  ')))), 0)::BIGINT AS n_bpe_tokens,
       |  coalesce(list_sum(list_transform(tok, w -> len(w))), 0)::BIGINT AS wc
       |  FROM b)
       |SELECT doc_id, n_words, n_bpe_tokens,
       |  round(wc * 1.0 / greatest(n_bpe_tokens, 1), 4) AS chars_per_token
       |FROM m ORDER BY doc_id""".stripMargin
  }

  /** DuckDB replay of the FULL curation pipeline ([[graft.ops.Curate
   * .curateCorpus]] on the gate's spiked corpus): chains the existing
   * per-stage oracle constructions — the c4Oracle line/page rules, the
   * gopherOracle statistics (recomputed from ROUNDED stats exactly like
   * the operator), md5 exact-dedup election, the minhashBandingCtes
   * banding (retargeted at the surviving clean texts), the
   * text_quality_score md5-bucket scoring, the mixtureSampleOracle
   * quota election, and the text_pack window — each stage reading the
   * previous stage's survivors, ending in the packed artifact. */
  def pipelineCurationOracle: String = {
    val punct = TextMetrics.c4PunctLine
    val bad = TextMetrics.c4BadLine
    val stops = TextMetrics.gopherStopwords
      .map(w => "(CASE WHEN instr(' ' || " +
        s"regexp_replace(lower(text), '[^a-z]', ' ', 'g') || ' ', ' $w ') " +
        "> 0 THEN 1 ELSE 0 END)")
      .mkString("\n    + ")
    val wvals = (0 until 20)
      .map(i => s"('src$i', ${1.0 + i % 4})").mkString(", ")
    s"""WITH sp AS (SELECT doc_id, source,
       |  text || '.' || chr(10) ||
       |  CASE WHEN doc_id % 4 = 0 THEN 'click here javascript required.'
       |       WHEN doc_id % 4 = 1 THEN 'short line'
       |       WHEN doc_id % 4 = 2
       |         THEN 'read our privacy policy and terms of use.'
       |       ELSE 'a perfectly fine second sentence with many words in it.'
       |       END || chr(10) ||
       |  CASE WHEN doc_id % 7 = 0 THEN 'Lorem Ipsum dolor { sit amet'
       |       ELSE 'and a third closing sentence follows right here today!'
       |       END AS t
       |  FROM documents),
       |corpus AS (
       |  SELECT doc_id, source, t FROM sp
       |  UNION ALL SELECT doc_id + 1000000, source, t FROM sp
       |  UNION ALL SELECT doc_id + 2000000, source,
       |    t || chr(10) ||
       |    'five extra trailing filler words follow right here today.'
       |  FROM sp),
       |cm AS (SELECT doc_id, t, string_split(t, chr(10)) AS ln,
       |  list_filter(string_split(t, chr(10)), x -> $punct
       |    AND len(list_filter(string_split(x, ' '), w -> w != '')) >= 5
       |    AND $bad) AS kept
       |  FROM corpus),
       |cr AS (SELECT doc_id,
       |  len(kept)::BIGINT AS n_kept_lines,
       |  (CASE WHEN instr(lower(t), 'lorem ipsum') > 0 THEN 1 ELSE 0 END)
       |    AS has_lorem,
       |  (CASE WHEN instr(t, '{') > 0 THEN 1 ELSE 0 END) AS has_curly,
       |  coalesce(array_to_string(kept, chr(10)), '') AS text
       |  FROM cm),
       |c4k AS (SELECT doc_id, text FROM cr
       |  WHERE has_lorem = 0 AND has_curly = 0 AND n_kept_lines >= 1
       |    AND (len(text) - len(replace(replace(replace(text,
       |      '.', ''), '!', ''), '?', ''))) >= 3),
       |gm AS (SELECT doc_id,
       |  len(tok)::BIGINT AS n_words,
       |  coalesce(list_sum(list_transform(tok, x -> len(x))), 0)::BIGINT
       |    AS word_chars,
       |  len(list_filter(tok, x -> regexp_matches(x, '[A-Za-z]')))::BIGINT
       |    AS n_alpha,
       |  (len(text) - len(replace(text, '#', '')))::BIGINT AS n_hash,
       |  ((len(text) - len(replace(text, '...', ''))) / 3)::BIGINT AS n_ell,
       |  len(string_split(text, chr(10)))::BIGINT AS n_lines,
       |  len(list_filter(string_split(text, chr(10)),
       |    x -> x LIKE '- %' OR x LIKE '• %'))::BIGINT AS n_bullet,
       |  len(list_filter(string_split(text, chr(10)),
       |    x -> x LIKE '%...'))::BIGINT AS n_endell,
       |  ($stops)::BIGINT AS stop_hits
       |  FROM (SELECT doc_id, text,
       |    list_filter(regexp_split_to_array(text, '\\s+'), x -> x != '')
       |      AS tok FROM c4k)),
       |gkeep AS (SELECT doc_id FROM (SELECT doc_id, n_words,
       |    round(word_chars * 1.0 / n_words, 4) AS mean_word_len,
       |    round(n_alpha * 1.0 / n_words, 4) AS alpha_word_frac,
       |    round((n_hash + n_ell) * 1.0 / n_words, 4) AS symbol_word_ratio,
       |    round(n_bullet * 1.0 / n_lines, 4) AS bullet_line_frac,
       |    round(n_endell * 1.0 / n_lines, 4) AS ellipsis_line_frac,
       |    stop_hits FROM gm)
       |  WHERE n_words >= 50 AND n_words <= 100000
       |    AND mean_word_len >= 3.0 AND mean_word_len <= 10.0
       |    AND symbol_word_ratio < 0.1 AND alpha_word_frac >= 0.8
       |    AND bullet_line_frac < 0.9 AND ellipsis_line_frac < 0.3
       |    AND stop_hits >= 2),
       |gk AS (SELECT c4k.* FROM c4k JOIN gkeep USING (doc_id)),
       |ek AS (SELECT gk.* FROM gk JOIN (
       |    SELECT md5(text) AS h, min(doc_id) AS doc_id FROM gk GROUP BY 1)
       |  e USING (doc_id)),
       |mtok AS (SELECT doc_id, str_split(text, ' ') AS tk FROM ek
       |  WHERE len(str_split(text, ' ')) >= 3),
       |msh AS (SELECT doc_id, array_to_string(tk[i:i+2], ' ') AS s
       |  FROM mtok, unnest(generate_series(1, len(tk) - 2)) AS u(i)),
       |mhh AS (SELECT doc_id, j,
       |    min(md5(concat(j::VARCHAR, '|', s))) AS mh
       |  FROM msh, unnest(generate_series(0, 7)) AS g(j)
       |  GROUP BY doc_id, j),
       |mbk AS (SELECT doc_id, j // 2 AS band,
       |    string_agg(mh, '|' ORDER BY j) AS key
       |  FROM mhh GROUP BY doc_id, j // 2),
       |mbn AS (SELECT band, key, count(*) AS c FROM mbk GROUP BY 1, 2),
       |mbk2 AS (SELECT mbk.* FROM mbk JOIN mbn USING (band, key)
       |  WHERE mbn.c <= $ngramMaxBucket),
       |mdrop AS (SELECT DISTINCT b.doc_id FROM mbk2 a JOIN mbk2 b
       |  ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id),
       |mk AS (SELECT * FROM ek
       |  WHERE doc_id NOT IN (SELECT doc_id FROM mdrop)),
       |qtk AS (SELECT doc_id,
       |    CAST('0x' || substring(md5(t), 1, 6) AS BIGINT) % 64 AS b
       |  FROM (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS t
       |    FROM mk) WHERE t <> ''),
       |qtf AS (SELECT doc_id, b, count(*)::DOUBLE AS tf FROM qtk
       |  GROUP BY 1, 2),
       |qco AS (SELECT range AS b, ((range % 7) - 3) / 10.0 AS w
       |  FROM range(64)),
       |qz AS (SELECT doc_id, sum(tf * coalesce(w, 0)) AS z
       |  FROM qtf LEFT JOIN qco USING (b) GROUP BY doc_id),
       |qk AS (SELECT mk.doc_id, mk.text, c.source
       |  FROM mk JOIN qz USING (doc_id) JOIN corpus c USING (doc_id)
       |  WHERE round(1.0 / (1.0 + exp(-(-0.5 + coalesce(z, 0)))), 4)
       |    >= 0.5),
       |w(source, wt) AS (VALUES $wvals),
       |qc AS (SELECT source, count(*)::DOUBLE AS n FROM qk GROUP BY 1),
       |qr AS (SELECT qc.source, wt, n / wt AS r FROM qc JOIN w
       |  USING (source)),
       |qq AS (SELECT source,
       |    CAST(floor(wt * (SELECT min(r) FROM qr) + 1e-9) AS BIGINT)
       |      AS quota
       |  FROM qr),
       |ranked AS (SELECT qk.source, qk.doc_id, qk.text,
       |    row_number() OVER (PARTITION BY qk.source
       |      ORDER BY md5(concat('42|', qk.doc_id::VARCHAR)), qk.doc_id)
       |      AS rn
       |  FROM qk JOIN w USING (source)),
       |mixed AS (SELECT r.doc_id, r.text FROM ranked r JOIN qq
       |  USING (source) WHERE rn <= quota),
       |pb AS (SELECT doc_id, doc_id % 8 AS shard,
       |    len(str_split(text, ' '))::BIGINT AS n_tokens FROM mixed),
       |pc AS (SELECT doc_id, shard, n_tokens,
       |    (sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))::BIGINT
       |      AS cum_tokens
       |  FROM pb)
       |SELECT doc_id, shard, n_tokens, cum_tokens,
       |  (cum_tokens - n_tokens) // 256 AS bin,
       |  cum_tokens - n_tokens - ((cum_tokens - n_tokens) // 256) * 256
       |    AS bin_offset
       |FROM pc ORDER BY doc_id""".stripMargin
  }

  /** DuckDB per-word BYTE-level BPE encode fold: hex the word's UTF-8
   * bytes (both engines' `hex` is uppercase), split into pairs, look
   * each byte up in the inlined 256-entry GPT-2 byte→unicode literal
   * ([[TextMetrics.byteToUnicode]] — 1-based list index = byte value +
   * 1, computed from the two hex digits the simhash-oracle way), then
   * the identical [[TextMetrics.bpeByteMerges]] replace chain over the
   * double-space representation. `w` is the surrounding lambda's word
   * variable. */
  def bpeBytesPerWordSql: String = {
    def esc(s: String) = s.replace("'", "''")
    val lut = TextMetrics.byteToUnicode
      .map(s => "'" + esc(s) + "'").mkString("[", ",", "]")
    val sym = s"($lut)[(strpos('0123456789ABCDEF', substr(p, 1, 1)) - 1) " +
      "* 16 + strpos('0123456789ABCDEF', substr(p, 2, 1))]"
    val pairs = "list_filter(string_split(regexp_replace(hex(w), " +
      "'(..)', '\\1,', 'g'), ','), x -> x != '')"
    val prepped = "concat(' ', array_to_string(list_transform(" +
      s"$pairs, p -> $sym), '  '), ' ')"
    TextMetrics.bpeByteMerges.foldLeft(prepped) { case (acc, (a, b)) =>
      s"replace($acc, ' ${esc(a)}  ${esc(b)} ', ' ${esc(a)}${esc(b)} ')"
    }
  }

  /** Byte-level BPE token-count oracle: the gate appends a multi-byte
   * UTF-8 suffix to every document (é, em dash, ï — 2- and 3-byte
   * sequences) so the byte table and the multi-byte merges are actually
   * exercised, then replays the per-word byte fold. strlen = BYTES in
   * DuckDB (octet_length on the Spark side). */
  def bpeBytesOracle: String = {
    val perWord = bpeBytesPerWordSql
    s"""WITH docs2 AS (SELECT doc_id,
       |    text || ' café —naïve' AS text FROM documents),
       |b AS (SELECT doc_id,
       |  list_filter(regexp_split_to_array(text, '\\s+'), x -> x != '') AS tok
       |  FROM docs2),
       |m AS (SELECT doc_id,
       |  len(tok)::BIGINT AS n_words,
       |  coalesce(list_sum(list_transform(tok, w ->
       |    len(string_split($perWord, '  ')))), 0)::BIGINT
       |    AS n_bpe_byte_tokens,
       |  coalesce(list_sum(list_transform(tok, w -> strlen(w))), 0)::BIGINT
       |    AS bc
       |  FROM b)
       |SELECT doc_id, n_words, n_bpe_byte_tokens,
       |  round(bc * 1.0 / greatest(n_bpe_byte_tokens, 1), 4)
       |    AS bytes_per_token
       |FROM m ORDER BY doc_id""".stripMargin
  }

  /** 8-word phrase the repetition-family gate repeats twice in a third
   * of the spiked docs — guarantees non-degenerate dup 5..8-gram
   * coverage in both engines. */
  val repPhrase =
    "redwood canyon mist falcon ember quartz harbor lantern"

  /** DuckDB replay of the full Gopher repetition family — deliberately a
   * DIFFERENT formulation from the Spark operator's per-row lambdas:
   * n-grams unnest to rows, duplication comes from a COUNT window,
   * interval union from the classic gaps-and-islands running-max, and
   * covered characters from 1-based list slices — so the gate
   * cross-checks two independent derivations of the same statistics. */
  def repetitionFullOracle: String = {
    val spike =
      s"""sp AS (SELECT doc_id,
         |  text || chr(10) || 'grey line repeats' ||
         |    chr(10) || 'grey line repeats' ||
         |  CASE WHEN doc_id % 2 = 0
         |    THEN chr(10)||chr(10)||'para dup'||chr(10)||chr(10)||'para dup'
         |    ELSE chr(10)||chr(10)||'solo para' END ||
         |  CASE WHEN doc_id % 3 = 0
         |    THEN chr(10) || '$repPhrase $repPhrase' ELSE '' END AS text
         |  FROM documents)""".stripMargin
    val tops = Seq(2, 3, 4).map { k =>
      s"""t$k AS (SELECT doc_id, max(cnt * glen) AS top$k FROM (
         |  SELECT doc_id, g, count(*) AS cnt, len(g) AS glen FROM (
         |    SELECT doc_id, array_to_string(tok[i:i+${k - 1}], ' ') AS g
         |    FROM d, unnest(generate_series(1, len(tok)-${k - 1})) AS u(i))
         |  GROUP BY doc_id, g, glen) GROUP BY doc_id)""".stripMargin
    }
    val dups = (5 to 10).map { n =>
      s"""g$n AS (SELECT doc_id, i AS p,
         |    array_to_string(tok[i:i+${n - 1}], ' ') AS g
         |  FROM d, unnest(generate_series(1, len(tok)-${n - 1})) AS u(i)),
         |dp$n AS (SELECT doc_id, p FROM (
         |  SELECT doc_id, p, count(*) OVER (PARTITION BY doc_id, g) AS c
         |  FROM g$n) WHERE c >= 2),
         |is$n AS (SELECT doc_id, p,
         |  CASE WHEN p > coalesce(max(p + ${n - 1}) OVER (
         |      PARTITION BY doc_id ORDER BY p
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1) + 1
         |    THEN 1 ELSE 0 END AS ni FROM dp$n),
         |iv$n AS (SELECT doc_id, min(p) AS s, max(p) + ${n - 1} AS e FROM (
         |  SELECT doc_id, p, sum(ni) OVER (PARTITION BY doc_id ORDER BY p)
         |    AS isl FROM is$n) GROUP BY doc_id, isl),
         |c$n AS (SELECT iv$n.doc_id,
         |  sum(len(array_to_string(d.tok[iv$n.s:iv$n.e], ' '))) AS cov
         |  FROM iv$n JOIN d USING (doc_id) GROUP BY iv$n.doc_id)"""
        .stripMargin
    }
    val selT = Seq(2, 3, 4).map(k =>
      s"round(coalesce(t$k.top$k, 0) * 1.0 / greatest(d.doc_len, 1), 4)" +
        s" AS top_${k}gram_char_frac").mkString(",\n  ")
    val selD = (5 to 10).map(n =>
      s"round(coalesce(c$n.cov, 0) * 1.0 / greatest(d.doc_len, 1), 4)" +
        s" AS dup_${n}gram_char_frac").mkString(",\n  ")
    val joins = (Seq(2, 3, 4).map(k => s"LEFT JOIN t$k USING (doc_id)") ++
      (5 to 10).map(n => s"LEFT JOIN c$n USING (doc_id)")).mkString(" ")
    s"""WITH $spike,
       |d AS (SELECT doc_id, len(text)::BIGINT AS doc_len,
       |    list_filter(regexp_split_to_array(text, '\\s+'), x -> x != '')
       |      AS tok,
       |    string_split(text, chr(10)) AS ln,
       |    string_split(text, chr(10)||chr(10)) AS para
       |  FROM sp),
       |${tops.mkString(",\n")},
       |${dups.mkString(",\n")}
       |SELECT d.doc_id,
       |  round((len(ln) - len(list_distinct(ln))) * 1.0 / len(ln), 4)
       |    AS dup_line_frac,
       |  round((coalesce(list_sum(list_transform(ln, x -> len(x))), 0) -
       |      coalesce(list_sum(list_transform(list_distinct(ln),
       |        x -> len(x))), 0)) * 1.0 / greatest(d.doc_len, 1), 4)
       |    AS dup_line_char_frac,
       |  round((len(para) - len(list_distinct(para))) * 1.0 / len(para), 4)
       |    AS dup_para_frac,
       |  round((coalesce(list_sum(list_transform(para, x -> len(x))), 0) -
       |      coalesce(list_sum(list_transform(list_distinct(para),
       |        x -> len(x))), 0)) * 1.0 / greatest(d.doc_len, 1), 4)
       |    AS dup_para_char_frac,
       |  $selT,
       |  $selD
       |FROM d $joins
       |ORDER BY d.doc_id""".stripMargin
  }

  /** NOT IN vs NOT EXISTS under ANSI three-valued logic, shared text:
   * the classic dialect trap — a NULL in the NOT IN subquery makes the
   * predicate UNKNOWN for every row (zero rows survive), while NOT
   * EXISTS keeps its two-valued behavior. Both branches gated from one
   * text so the engines must agree on the full 3VL semantics. */
  val sqlNotInText: String =
    """SELECT 'not_in_clean' AS variant, count(*) AS n
      |FROM part
      |WHERE p_partkey NOT IN (SELECT l_partkey FROM lineitem
      |                        WHERE l_quantity >= 49)
      |UNION ALL
      |SELECT 'not_in_with_null', count(*)
      |FROM part
      |WHERE p_partkey NOT IN (SELECT CASE WHEN l_quantity >= 49
      |                          THEN l_partkey END
      |                        FROM lineitem)
      |UNION ALL
      |SELECT 'not_exists', count(*)
      |FROM part p
      |WHERE NOT EXISTS (SELECT 1 FROM lineitem l
      |  WHERE l.l_partkey = p.p_partkey AND l.l_quantity >= 49)
      |ORDER BY variant""".stripMargin

  /** first/last/nth_value window functions, shared text. The frame is
   * EXPLICIT (unbounded both ways): the ANSI default frame ends at
   * CURRENT ROW, which silently turns last_value into "this row" — the
   * classic window gotcha; pinning the frame in shared text makes both
   * engines answer the intended question. */
  val sqlWindowFrameText: String =
    """SELECT l_suppkey, l_orderkey, l_linenumber,
      |  first_value(l_quantity) OVER w AS first_qty,
      |  last_value(l_quantity) OVER w AS last_qty,
      |  nth_value(l_quantity, 3) OVER w AS third_qty
      |FROM lineitem
      |WHERE l_suppkey < 10
      |WINDOW w AS (PARTITION BY l_suppkey
      |  ORDER BY l_shipdate, l_orderkey, l_linenumber
      |  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
      |ORDER BY l_suppkey, l_orderkey, l_linenumber""".stripMargin

  /** FILTER-clause aggregates, shared text (the q_sql_exists pattern):
   * per-group conditional aggregation without CASE WHEN rewrites. */
  val sqlFilterAggText: String =
    """SELECT l_returnflag,
      |  count(*) AS n_all,
      |  count(*) FILTER (WHERE l_quantity >= 25) AS n_heavy,
      |  round(sum(l_extendedprice) FILTER (WHERE l_discount <= 0.02), 2)
      |    AS rev_lowdisc
      |FROM lineitem
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin

  // ----------------------------------------------------------------- queries


  /** Shared eval frame for the classifier-metrics gates: score =
   * {the,and,of}-token density (4dp), label = lang == 'en'. Both sides
   * of the oracle build the identical frame. */
  def classifierEvalFrame(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents").select(col("doc_id"),
      expr("round(size(filter(split(text, ' ', -1), " +
        "x -> x IN ('the','and','of'))) / " +
        "nullif(cast(size(filter(split(text, ' ', -1), x -> x != '')) " +
        "as double), 0.0), 4)").as("score"),
      (col("lang") === "en").as("label"))

  // ------------------------------------------------------------- oracle SQL

  /** Mixture-sample replay: the same weight table as a VALUES literal,
   * quota_d = floor(w_d * min_e(n_e / w_e)) — the identical double
   * expression the operator folds into its plan — then the md5 election
   * within each source. */
  /** Shared BM25 CTE chain (ends at `bm(doc_id, bm25)`, no trailing
   * comma): the identical formulation the engine folds — per-term tf via
   * list_filter on the same single-space split, df/N/avgdl from one
   * stats row, contributions added LEFT-TO-RIGHT in query order
   * (query/dup/spark), 4dp round. Appended by `text_bm25` (direct
   * SELECT) and `q_rrf_fuse` (further CTEs). */
  val bm25Cte: String =
    """WITH d AS (SELECT doc_id, text,
      |    list_filter(str_split(text, ' '), x -> x <> '') AS tok
      |  FROM documents),
      |st AS (SELECT count(*)::DOUBLE AS n,
      |    avg(len(tok))::DOUBLE AS avgdl FROM d),
      |tfx AS (SELECT doc_id, len(tok)::DOUBLE AS dl,
      |    len(list_filter(tok, x -> x = 'query'))::DOUBLE AS tf1,
      |    len(list_filter(tok, x -> x = 'dup'))::DOUBLE AS tf2,
      |    len(list_filter(tok, x -> x = 'spark'))::DOUBLE AS tf3
      |  FROM d),
      |dfx AS (SELECT
      |    (count(*) FILTER (tf1 > 0))::DOUBLE AS df1,
      |    (count(*) FILTER (tf2 > 0))::DOUBLE AS df2,
      |    (count(*) FILTER (tf3 > 0))::DOUBLE AS df3 FROM tfx),
      |bm AS (SELECT doc_id, round(
      |    (CASE WHEN df1 > 0 AND tf1 > 0
      |      THEN ln(1 + (n - df1 + 0.5) / (df1 + 0.5)) * tf1 * 2.2
      |        / (tf1 + 1.2 * (0.25 + 0.75 * dl / avgdl)) ELSE 0 END)
      |  + (CASE WHEN df2 > 0 AND tf2 > 0
      |      THEN ln(1 + (n - df2 + 0.5) / (df2 + 0.5)) * tf2 * 2.2
      |        / (tf2 + 1.2 * (0.25 + 0.75 * dl / avgdl)) ELSE 0 END)
      |  + (CASE WHEN df3 > 0 AND tf3 > 0
      |      THEN ln(1 + (n - df3 + 0.5) / (df3 + 0.5)) * tf3 * 2.2
      |        / (tf3 + 1.2 * (0.25 + 0.75 * dl / avgdl)) ELSE 0 END), 4)
      |  AS bm25
      |  FROM tfx CROSS JOIN dfx CROSS JOIN st)
      |""".stripMargin

  def mixtureSampleOracle: String = {
    val wvals = (0 until 20)
      .map(i => s"('src$i', ${1.0 + i % 4})").mkString(", ")
    s"""WITH w(source, wt) AS (VALUES $wvals),
       |c AS (SELECT source, count(*)::DOUBLE AS n FROM documents GROUP BY 1),
       |q AS (SELECT c.source, wt, n / wt AS r FROM c JOIN w USING (source)),
       |k AS (SELECT source,
       |    CAST(floor(wt * (SELECT min(r) FROM q) + 1e-9) AS BIGINT) AS quota
       |  FROM q),
       |ranked AS (
       |  SELECT d.source, d.doc_id,
       |    row_number() OVER (PARTITION BY d.source
       |      ORDER BY md5(concat('42|', d.doc_id::VARCHAR)), d.doc_id) AS rn
       |  FROM documents d JOIN w USING (source))
       |SELECT r.source, r.doc_id FROM ranked r JOIN k USING (source)
       |WHERE rn <= quota ORDER BY source, doc_id""".stripMargin
  }

  /** Morton interleave replay as plain integer arithmetic: bit i of the
   * first dimension lands at 2i+1, of the second at 2i — disjoint
   * positions, so the OR chain is exact in any engine with shifts. */
  def zoneMapOracle: String = {
    // same interleave terms as zorderOracle; file binning is exact
    // integer division so no float boundary can disagree with Spark
    val terms = (0 until 8).flatMap(i => Seq(
      s"((((o_custkey % 256) >> $i) & 1) << ${2 * i + 1})",
      s"((((o_orderkey % 256) >> $i) & 1) << ${2 * i})"))
    s"""WITH z AS (SELECT (${terms.mkString(" | ")})::BIGINT AS zv,
       |    (o_custkey % 256)::DOUBLE AS a FROM orders),
       |s AS (SELECT min(zv) AS zmin, max(zv) AS zmax FROM z)
       |SELECT ((zv - zmin) * 16) // (zmax - zmin + 1) AS file_id,
       |  count(*)::BIGINT AS n_rows,
       |  round(min(a), 4) AS cmin, round(max(a), 4) AS cmax,
       |  (max(a) < 0.0 OR min(a) > 15.0) AS skipped
       |FROM z, s GROUP BY 1 ORDER BY file_id""".stripMargin
  }

  def zorderOracle: String = {
    val terms = (0 until 8).flatMap(i => Seq(
      s"((((o_custkey % 256) >> $i) & 1) << ${2 * i + 1})",
      s"((((o_orderkey % 256) >> $i) & 1) << ${2 * i})"))
    s"""SELECT o_orderkey,
       |  (${terms.mkString(" | ")})::BIGINT AS zval
       |FROM orders ORDER BY zval, o_orderkey""".stripMargin
  }

  /** Hilbert replay: the bit-level rotate/reflect fold unrolls to one
   * MATERIALIZED CTE per level (plain-CTE inlining would grow 4^bits —
   * the hitsOracle lesson), qualifying every reference to the previous
   * round's table so DuckDB's lateral aliases can never shadow. */
  def hilbertOracle(bits: Int): String = {
    val pre =
      """WITH h0 AS MATERIALIZED (SELECT o_orderkey,
        |  (o_custkey % 256)::BIGINT AS x, (o_orderkey % 256)::BIGINT AS y,
        |  0::BIGINT AS d FROM orders)""".stripMargin
    val steps = (0 until bits).map { r =>
      val s = 1L << (bits - 1 - r)
      s""",
         |h${r + 1} AS MATERIALIZED (SELECT t.o_orderkey,
         |  CASE WHEN (t.y & $s) = 0 THEN
         |    CASE WHEN (t.x & $s) > 0 THEN ${s - 1} - t.y ELSE t.y END
         |  ELSE t.x END AS x,
         |  CASE WHEN (t.y & $s) = 0 THEN
         |    CASE WHEN (t.x & $s) > 0 THEN ${s - 1} - t.x ELSE t.x END
         |  ELSE t.y END AS y,
         |  t.d + ${s * s} * xor(
         |    CASE WHEN (t.x & $s) > 0 THEN 3 ELSE 0 END,
         |    CASE WHEN (t.y & $s) > 0 THEN 1 ELSE 0 END) AS d
         |FROM h$r t)""".stripMargin
    }.mkString
    pre + steps +
      s"""
         |SELECT o_orderkey, d AS hval FROM h$bits
         |ORDER BY hval, o_orderkey""".stripMargin
  }

  /** MMR replay: the greedy pick loop unrolls to one CTE round per pick
   * — same 5dp pairwise-cosine and 6dp score rounding, (score desc, id)
   * argmax, and the IEEE (1.0 - lambda) complement the engine computes
   * (a decimal 0.3 literal would differ from Java's 0.7-complement in
   * the last ulp). AS MATERIALIZED per hitsOracle. */
  def mmrOracle(k: Int, lambda: Double): String = {
    val pre =
      s"""WITH q AS MATERIALIZED (
         |  SELECT generate_subscripts(embedding, 1) AS i,
         |    unnest(embedding)::DOUBLE AS qv
         |  FROM embeddings WHERE vec_id = 0),
         |e AS MATERIALIZED (
         |  SELECT vec_id, generate_subscripts(embedding, 1) AS i,
         |    unnest(embedding)::DOUBLE AS ev
         |  FROM embeddings WHERE vec_id <> 0),
         |d AS MATERIALIZED (
         |  SELECT e.vec_id, sum(e.ev * q.qv) AS dp,
         |    sqrt(sum(e.ev * e.ev)) AS na
         |  FROM e JOIN q ON e.i = q.i GROUP BY e.vec_id),
         |nq AS MATERIALIZED (SELECT sqrt(sum(qv * qv)) AS nq FROM q),
         |s0 AS MATERIALIZED (
         |  SELECT d.vec_id, round(CASE WHEN d.na * nq.nq > 0
         |      THEN d.dp / (d.na * nq.nq) ELSE 0.0 END, 5) AS rel
         |  FROM d, nq ORDER BY rel DESC, d.vec_id LIMIT 20),
         |pc AS MATERIALIZED (
         |  SELECT dot.va, dot.vb,
         |    round(CASE WHEN da.na * db.na > 0
         |      THEN dot.dp2 / (da.na * db.na) ELSE 0.0 END, 5) AS cos
         |  FROM (SELECT ea.vec_id AS va, eb.vec_id AS vb,
         |        sum(ea.ev * eb.ev) AS dp2
         |      FROM e ea JOIN e eb ON ea.i = eb.i
         |      WHERE ea.vec_id IN (SELECT vec_id FROM s0)
         |        AND eb.vec_id IN (SELECT vec_id FROM s0)
         |      GROUP BY ea.vec_id, eb.vec_id) dot
         |  JOIN d da ON da.vec_id = dot.va
         |  JOIN d db ON db.vec_id = dot.vb),
         |p1 AS MATERIALIZED (
         |  SELECT vec_id, rel, round($lambda * rel, 6) AS score,
         |    1::BIGINT AS rank
         |  FROM s0 ORDER BY round($lambda * rel, 6) DESC, vec_id LIMIT 1),
         |sel1 AS MATERIALIZED (SELECT * FROM p1)""".stripMargin
    val steps = (2 to k).map { t =>
      s""",
         |p$t AS MATERIALIZED (
         |  SELECT s.vec_id, s.rel,
         |    round($lambda * s.rel
         |      - (1.0::DOUBLE - $lambda::DOUBLE) * ms.m, 6) AS score,
         |    $t::BIGINT AS rank
         |  FROM s0 s JOIN (SELECT pc.va AS vec_id, max(pc.cos) AS m
         |      FROM pc JOIN sel${t - 1} sl ON pc.vb = sl.vec_id
         |      GROUP BY pc.va) ms ON ms.vec_id = s.vec_id
         |  WHERE s.vec_id NOT IN (SELECT vec_id FROM sel${t - 1})
         |  ORDER BY score DESC, s.vec_id LIMIT 1),
         |sel$t AS MATERIALIZED (
         |  SELECT * FROM sel${t - 1} UNION ALL SELECT * FROM p$t)"""
        .stripMargin
    }.mkString
    pre + steps +
      s"""
         |SELECT rank, vec_id, rel, score FROM sel$k ORDER BY rank"""
        .stripMargin
  }

  /** PageRank replay: the operator's fixed iteration count unrolls to a
   * CTE chain — same damped update, dangling redistribution, and
   * 10-decimal per-iteration rounding as Graph.pageRank. */
  def pageRankOracle(iters: Int): String = {
    val pre =
      """WITH edges AS (SELECT o_custkey % 997 AS src, o_orderkey % 997 AS dst
        |  FROM orders),
        |nodes AS (SELECT DISTINCT src AS node FROM edges
        |  UNION SELECT DISTINCT dst FROM edges),
        |nn AS (SELECT count(*)::DOUBLE AS n FROM nodes),
        |outdeg AS (SELECT src AS node, count(*)::DOUBLE AS deg FROM edges
        |  GROUP BY src),
        |r0 AS (SELECT node, round(1.0 / nn.n, 10) AS rank FROM nodes, nn)"""
        .stripMargin
    val steps = (0 until iters).map { t =>
      s""",
         |c$t AS (SELECT e.dst AS node, sum(r.rank / od.deg) AS s
         |  FROM edges e JOIN r$t r ON r.node = e.src
         |  JOIN outdeg od ON od.node = e.src GROUP BY e.dst),
         |dg$t AS (SELECT coalesce(sum(r.rank), 0) AS m FROM r$t r
         |  LEFT JOIN outdeg od ON od.node = r.node WHERE od.node IS NULL),
         |r${t + 1} AS (SELECT n.node,
         |    round(0.15 / nn.n + 0.85 * (coalesce(c$t.s, 0) + dg$t.m / nn.n),
         |      10) AS rank
         |  FROM nodes n LEFT JOIN c$t ON c$t.node = n.node, nn, dg$t)"""
        .stripMargin
    }.mkString
    pre + steps + s"\nSELECT node, rank FROM r$iters ORDER BY node"
  }

  /** HITS replay: the fixed iteration count unrolls to a CTE chain —
   * same per-round order (authority from prev h, then hub from the
   * CURRENT round's a), L2 norms, zero-norm guard, and 10-decimal
   * per-round rounding as Graph.hits. */
  def hitsOracle(iters: Int): String = {
    // AS MATERIALIZED is load-bearing, not a hint: DuckDB inlines plain
    // CTEs, and an unrolled recursion whose round references its
    // predecessor 2-4x would expand to O(4^rounds) copies of the base
    // scan (observed: fd exhaustion at 8 rounds). Materializing each
    // round keeps the replay linear in rounds, like the engine's.
    val pre =
      """WITH edges AS MATERIALIZED (
        |  SELECT o_custkey % 997 AS src, o_orderkey % 997 AS dst
        |  FROM orders),
        |nodes AS MATERIALIZED (SELECT DISTINCT src AS node FROM edges
        |  UNION SELECT DISTINCT dst FROM edges),
        |h0 AS MATERIALIZED (SELECT node, 1.0::DOUBLE AS h FROM nodes)"""
        .stripMargin
    val steps = (1 to iters).map { t =>
      s""",
         |ar$t AS MATERIALIZED (SELECT n.node, coalesce(s.v, 0) AS ar
         |  FROM nodes n
         |  LEFT JOIN (SELECT e.dst AS node, sum(h.h) AS v
         |    FROM edges e JOIN h${t - 1} h ON h.node = e.src
         |    GROUP BY e.dst) s ON s.node = n.node),
         |an$t AS MATERIALIZED (SELECT sqrt(sum(ar * ar)) AS v FROM ar$t),
         |a$t AS MATERIALIZED (SELECT node, round(CASE WHEN an$t.v > 0
         |    THEN ar / an$t.v ELSE 0 END, 10) AS a FROM ar$t, an$t),
         |hr$t AS MATERIALIZED (SELECT n.node, coalesce(s.v, 0) AS hr
         |  FROM nodes n
         |  LEFT JOIN (SELECT e.src AS node, sum(a.a) AS v
         |    FROM edges e JOIN a$t a ON a.node = e.dst
         |    GROUP BY e.src) s ON s.node = n.node),
         |hn$t AS MATERIALIZED (SELECT sqrt(sum(hr * hr)) AS v FROM hr$t),
         |h$t AS MATERIALIZED (SELECT node, round(CASE WHEN hn$t.v > 0
         |    THEN hr / hn$t.v ELSE 0 END, 10) AS h FROM hr$t, hn$t)"""
        .stripMargin
    }.mkString
    pre + steps +
      s"""
         |SELECT h$iters.node, round(h$iters.h, 6) AS hub,
         |  round(a$iters.a, 6) AS authority
         |FROM h$iters JOIN a$iters ON a$iters.node = h$iters.node
         |ORDER BY 1""".stripMargin
  }

  /** k-core replay: the peel loop unrolls to `rounds` CTE rounds (each:
   * degree agg → keep-set → both-endpoint semi-join). Peeling is
   * idempotent at the fixpoint, so unrolling MORE rounds than the data
   * needs (6 at the gate SF) is still exact — `rounds` just has to be
   * an upper bound, and extra rounds cost nothing on the empty delta. */
  def kcoreOracle(k: Int, rounds: Int): String = {
    // AS MATERIALIZED: see hitsOracle — each round references its
    // predecessor 3x, so inlined CTEs would expand to 3^rounds scans.
    val pre =
      s"""WITH e0 AS MATERIALIZED (SELECT DISTINCT
         |    least(o_custkey % 997, o_orderkey % 997) AS a,
         |    greatest(o_custkey % 997, o_orderkey % 997) AS b
         |  FROM orders WHERE o_custkey % 997 <> o_orderkey % 997)"""
        .stripMargin
    val steps = (0 until rounds).map { t =>
      s""",
         |d$t AS MATERIALIZED (SELECT node, count(*) AS d FROM
         |    (SELECT a AS node FROM e$t UNION ALL SELECT b FROM e$t)
         |  GROUP BY node),
         |k$t AS MATERIALIZED (SELECT node FROM d$t WHERE d >= $k),
         |e${t + 1} AS MATERIALIZED (SELECT e.a, e.b FROM e$t e
         |  JOIN k$t ka ON ka.node = e.a JOIN k$t kb ON kb.node = e.b)"""
        .stripMargin
    }.mkString
    pre + steps +
      s"""
         |SELECT node, count(*)::BIGINT AS core_deg FROM
         |  (SELECT a AS node FROM e$rounds UNION ALL SELECT b FROM e$rounds)
         |GROUP BY node HAVING count(*) >= $k ORDER BY node""".stripMargin
  }

  /** BPE-training replay: `numMerges` rounds unroll to CTEs over the
   * same state TextMetrics.trainBpe iterates — the double-spaced word
   * dictionary — with the identical pair-count aggregation, (n desc, l,
   * r) tie-break, minPairCount=2 stop (an empty m-round empties every
   * later round, reproducing early stop), and leftmost-non-overlapping
   * replace (both engines' string replace scans left to right).
   * AS MATERIALIZED: see hitsOracle. */
  def bpeTrainOracle(numMerges: Int): String = {
    val pre =
      """WITH w0 AS MATERIALIZED (
        |  SELECT ' ' || rtrim(regexp_replace(w, '(.)', '\1  ', 'g')) || ' '
        |      AS sym,
        |    count(*)::BIGINT AS cnt
        |  FROM (SELECT unnest(regexp_split_to_array(text, '\s+')) AS w
        |        FROM documents)
        |  WHERE w <> '' GROUP BY 1)""".stripMargin
    val steps = (1 to numMerges).map { t =>
      s""",
         |p$t AS MATERIALIZED (
         |  SELECT l, r, sum(cnt) AS n FROM (
         |    SELECT cnt,
         |      unnest(list_slice(ss, 1, len(ss) - 1)) AS l,
         |      unnest(list_slice(ss, 2, len(ss))) AS r
         |    FROM (SELECT cnt, list_filter(list_transform(
         |            string_split(sym, '  '), x -> trim(x)),
         |          x -> x <> '') AS ss FROM w${t - 1})
         |    WHERE len(ss) >= 2)
         |  GROUP BY l, r),
         |m$t AS MATERIALIZED (SELECT l, r FROM p$t WHERE n >= 2
         |  ORDER BY n DESC, l, r LIMIT 1),
         |w$t AS MATERIALIZED (
         |  SELECT replace(sym, ' ' || m.l || '  ' || m.r || ' ',
         |                      ' ' || m.l || m.r || ' ') AS sym, cnt
         |  FROM w${t - 1}, m$t m)""".stripMargin
    }.mkString
    val branches = (1 to numMerges).map { t =>
      s"""SELECT $t::BIGINT AS rank, l AS "left", r AS "right" FROM m$t"""
    }.mkString("\nUNION ALL ")
    pre + steps + "\nSELECT * FROM (" + branches + ") ORDER BY rank"
  }

  def lpaOracle(iters: Int): String = {
    // AS MATERIALIZED: each round references its predecessor once per
    // count join; materialization keeps the unroll linear (hitsOracle).
    val pre =
      s"""WITH e0 AS MATERIALIZED (SELECT DISTINCT
         |    least(o_custkey % 997, o_orderkey % 997) AS a,
         |    greatest(o_custkey % 997, o_orderkey % 997) AS b
         |  FROM orders WHERE o_custkey % 997 <> o_orderkey % 997),
         |nb AS MATERIALIZED (SELECT a, b FROM e0
         |  UNION ALL SELECT b, a FROM e0),
         |l0 AS MATERIALIZED (SELECT DISTINCT a AS node, a AS label
         |  FROM nb)""".stripMargin
    val steps = (0 until iters).map { t =>
      s""",
         |l${t + 1} AS MATERIALIZED (SELECT a AS node, label FROM (
         |    SELECT nb.a, l.label,
         |      row_number() OVER (PARTITION BY nb.a
         |        ORDER BY count(*) DESC, l.label) AS rn
         |    FROM nb JOIN l$t l ON l.node = nb.b
         |    GROUP BY nb.a, l.label) WHERE rn = 1)""".stripMargin
    }.mkString
    pre + steps +
      s"""
         |SELECT node, label FROM l$iters ORDER BY node""".stripMargin
  }


  /** Shared classifier-eval CTE (`sc(doc_id, score, label)`): the exact
   * frame [[classifierEvalFrame]] builds — {the,and,of}-token density
   * 4dp over the nonempty-token count, label = lang = 'en'. */
  val classifierEvalCte: String =
    """WITH sc AS (SELECT doc_id,
      |    round(len(list_filter(string_split(text, ' '),
      |        x -> x IN ('the', 'and', 'of')))
      |      / nullif(len(list_filter(string_split(text, ' '),
      |        x -> x <> '')), 0)::DOUBLE, 4) AS score,
      |    (lang = 'en') AS label
      |  FROM documents),
      |""".stripMargin

  /** Shared SCD2 CTE chain (ends at `v(user_id, event_type,
   * effective_from, effective_to, version)`): the identical
   * construction [[graft.ops.Snapshot.scd2]] folds — per-user
   * (ts, event_id)-ordered lag dedup of the content hash, then lead
   * validity bounds and a row_number version ordinal over the
   * change rows only. */
  val scd2Cte: String =
    """WITH e AS (SELECT user_id, epoch_us(ts)::BIGINT AS ts_us, event_id,
      |    event_type,
      |    md5(concat_ws('|', CAST(event_type AS VARCHAR))) AS vh
      |  FROM events),
      |c AS (SELECT *, lag(vh) OVER (PARTITION BY user_id
      |    ORDER BY ts_us, event_id) AS ph FROM e),
      |f AS (SELECT user_id, ts_us, event_id, event_type FROM c
      |  WHERE ph IS NULL OR ph <> vh),
      |v AS (SELECT user_id, event_type, ts_us AS effective_from,
      |    lead(ts_us) OVER (PARTITION BY user_id
      |      ORDER BY ts_us, event_id) AS effective_to,
      |    row_number() OVER (PARTITION BY user_id
      |      ORDER BY ts_us, event_id)::INT AS version
      |  FROM f)
      |""".stripMargin

  /** Cell-level IPF replay for the ebw_ipf_raking gate: the identical
   * alternating margin scalings, unrolled `iters` rounds (the solver
   * runs tol = 0 in the gate so both sides execute EXACTLY this many),
   * over the 15-cell status x priority contingency table with the same
   * literal target shares. */
  def ipfOracle(iters: Int): String = {
    val pre =
      """WITH c0 AS MATERIALIZED (SELECT o_orderstatus AS r,
        |    o_orderpriority AS c, count(*)::DOUBLE AS w,
        |    count(*)::BIGINT AS n FROM orders GROUP BY 1, 2),
        |tot AS MATERIALIZED (SELECT sum(w) AS t FROM c0),
        |tr AS MATERIALIZED (SELECT r, s * tot.t AS t
        |  FROM (VALUES ('O', 0.5),
        |    ('F', 0.3), ('P', 0.2)) tr0(r, s), tot),
        |tc AS MATERIALIZED (SELECT c, s * tot.t AS t
        |  FROM (VALUES ('1-URGENT', 0.3),
        |    ('2-HIGH', 0.25), ('3-MEDIUM', 0.2),
        |    ('4-NOT SPECIFIED', 0.15), ('5-LOW', 0.1)) tc0(c, s), tot),
        |w0 AS MATERIALIZED (SELECT r, c, w, n FROM c0)""".stripMargin
    val steps = (1 to iters).map { i =>
      val p = if (i == 1) "w0" else s"w${i - 1}"
      s""",
         |mr$i AS MATERIALIZED (SELECT r, sum(w) AS m FROM $p GROUP BY r),
         |a$i AS MATERIALIZED (SELECT p.r, p.c,
         |    p.w * (tr.t / mr$i.m) AS w, p.n
         |  FROM $p p JOIN tr ON tr.r = p.r JOIN mr$i ON mr$i.r = p.r),
         |mc$i AS MATERIALIZED (SELECT c, sum(w) AS m FROM a$i GROUP BY c),
         |w$i AS MATERIALIZED (SELECT a.r, a.c,
         |    a.w * (tc.t / mc$i.m) AS w, a.n
         |  FROM a$i a JOIN tc ON tc.c = a.c
         |  JOIN mc$i ON mc$i.c = a.c)""".stripMargin
    }.mkString
    pre + steps +
      s"""
         |SELECT r AS o_orderstatus, c AS o_orderpriority, n,
         |  round(w, 4) AS w_cell
         |FROM w$iters ORDER BY r, c""".stripMargin
  }

  /** Cell-level IPF replay for the ebw_token_mix gate: the same
   * alternating margin scalings as [[ipfOracle]], but the contingency
   * table is (lang × length bucket) over documents WEIGHTED BY TOKEN
   * COUNT — the token-budget mixture-balancing form. Token counts are
   * integers so every cell mass is exact in double and the unrolled
   * arithmetic replays bit-for-bit at the gate's rounding. */
  def tokenMixOracle(iters: Int): String = {
    val pre =
      """WITH base AS MATERIALIZED (SELECT lang AS r,
        |    CASE WHEN n_chars < 250 THEN 'short'
        |      WHEN n_chars < 350 THEN 'mid' ELSE 'long' END AS c,
        |    len(list_filter(regexp_split_to_array(text, '\s+'),
        |      x -> x <> ''))::DOUBLE AS tok
        |  FROM documents),
        |c0 AS MATERIALIZED (SELECT r, c, sum(tok) AS w,
        |    count(*)::BIGINT AS n, sum(tok)::BIGINT AS tokens
        |  FROM base GROUP BY 1, 2),
        |tot AS MATERIALIZED (SELECT sum(w) AS t FROM c0),
        |tr AS MATERIALIZED (SELECT r, s * tot.t AS t
        |  FROM (VALUES ('en', 0.3), ('de', 0.175), ('es', 0.175),
        |    ('fr', 0.175), ('zh', 0.175)) tr0(r, s), tot),
        |tc AS MATERIALIZED (SELECT c, s * tot.t AS t
        |  FROM (VALUES ('short', 0.3), ('mid', 0.4),
        |    ('long', 0.3)) tc0(c, s), tot),
        |w0 AS MATERIALIZED (SELECT r, c, w, n, tokens FROM c0)""".stripMargin
    val steps = (1 to iters).map { i =>
      val p = if (i == 1) "w0" else s"w${i - 1}"
      s""",
         |mr$i AS MATERIALIZED (SELECT r, sum(w) AS m FROM $p GROUP BY r),
         |a$i AS MATERIALIZED (SELECT p.r, p.c,
         |    p.w * (tr.t / mr$i.m) AS w, p.n, p.tokens
         |  FROM $p p JOIN tr ON tr.r = p.r JOIN mr$i ON mr$i.r = p.r),
         |mc$i AS MATERIALIZED (SELECT c, sum(w) AS m FROM a$i GROUP BY c),
         |w$i AS MATERIALIZED (SELECT a.r, a.c,
         |    a.w * (tc.t / mc$i.m) AS w, a.n, a.tokens
         |  FROM a$i a JOIN tc ON tc.c = a.c
         |  JOIN mc$i ON mc$i.c = a.c)""".stripMargin
    }.mkString
    pre + steps +
      s"""
         |SELECT r AS lang, c AS len_bucket, n, tokens,
         |  round(w, 4) AS w_cell
         |FROM w$iters ORDER BY lang, len_bucket""".stripMargin
  }

  /** Unrolled EM replay for the q_fs_em gate (Winkler 1988): the same
   * customer consecutive-pair deck as q_fs_weights but UNLABELED —
   * agreement-pattern counts, then `iters` expectation/maximization
   * rounds as MATERIALIZED CTEs over the 1-row (p, m_f, u_f) state,
   * every multiplication left-associated exactly as the driver loop
   * multiplies (the replay contract in Linkage.fellegiSunterEm). */
  def fsEmOracle(iters: Int): String = {
    val pre =
      """WITH a AS (SELECT c_custkey AS k, c_mktsegment AS sa,
        |    floor(c_acctbal / 1000) AS ba, c_acctbal >= 0 AS pa
        |  FROM customer),
        |b AS (SELECT c_custkey - 1 AS k, c_mktsegment AS sb,
        |    floor(c_acctbal / 1000) AS bb, c_acctbal >= 0 AS pb
        |  FROM customer),
        |pt AS MATERIALIZED (SELECT sa = sb AS f0, ba = bb AS f1,
        |    pa = pb AS f2, count(*)::DOUBLE AS n
        |  FROM a JOIN b USING (k) GROUP BY 1, 2, 3),
        |tot AS MATERIALIZED (SELECT sum(n) AS nt FROM pt),
        |s0 AS MATERIALIZED (SELECT 0.1 AS p,
        |  0.9 AS m0, 0.9 AS m1, 0.9 AS m2,
        |  0.1 AS u0, 0.1 AS u1, 0.1 AS u2)""".stripMargin
    def tm(s: String) =
      s"""(((CASE WHEN pt.f0 THEN $s.m0 ELSE 1 - $s.m0 END)
         |      * (CASE WHEN pt.f1 THEN $s.m1 ELSE 1 - $s.m1 END))
         |      * (CASE WHEN pt.f2 THEN $s.m2 ELSE 1 - $s.m2 END))""".stripMargin
    def tu(s: String) =
      s"""(((CASE WHEN pt.f0 THEN $s.u0 ELSE 1 - $s.u0 END)
         |      * (CASE WHEN pt.f1 THEN $s.u1 ELSE 1 - $s.u1 END))
         |      * (CASE WHEN pt.f2 THEN $s.u2 ELSE 1 - $s.u2 END))""".stripMargin
    val steps = (1 to iters).map { i =>
      val s = s"s${i - 1}"
      s""",
         |g$i AS MATERIALIZED (SELECT pt.f0, pt.f1, pt.f2, pt.n,
         |    (($s.p * ${tm(s)}))
         |    / ((($s.p * ${tm(s)}))
         |      + (((1 - $s.p) * ${tu(s)}))) AS g
         |  FROM pt, $s),
         |s$i AS MATERIALIZED (SELECT sum(n * g) / tot.nt AS p,
         |    sum(CASE WHEN f0 THEN n * g ELSE 0 END) / sum(n * g) AS m0,
         |    sum(CASE WHEN f1 THEN n * g ELSE 0 END) / sum(n * g) AS m1,
         |    sum(CASE WHEN f2 THEN n * g ELSE 0 END) / sum(n * g) AS m2,
         |    sum(CASE WHEN f0 THEN n * (1 - g) ELSE 0 END)
         |      / (tot.nt - sum(n * g)) AS u0,
         |    sum(CASE WHEN f1 THEN n * (1 - g) ELSE 0 END)
         |      / (tot.nt - sum(n * g)) AS u1,
         |    sum(CASE WHEN f2 THEN n * (1 - g) ELSE 0 END)
         |      / (tot.nt - sum(n * g)) AS u2
         |  FROM g$i, tot GROUP BY tot.nt)""".stripMargin
    }.mkString
    pre + steps +
      s"""
         |SELECT * FROM (
         |  SELECT 'seg' AS field, round(m0, 6) AS m, round(u0, 6) AS u,
         |    round(ln(m0 / u0) / ln(2), 4) AS w_agree,
         |    round(ln((1 - m0) / (1 - u0)) / ln(2), 4) AS w_disagree,
         |    round(p, 6) AS p_match FROM s$iters
         |  UNION ALL
         |  SELECT 'bal_band', round(m1, 6), round(u1, 6),
         |    round(ln(m1 / u1) / ln(2), 4),
         |    round(ln((1 - m1) / (1 - u1)) / ln(2), 4),
         |    round(p, 6) FROM s$iters
         |  UNION ALL
         |  SELECT 'bal_sign', round(m2, 6), round(u2, 6),
         |    round(ln(m2 / u2) / ln(2), 4),
         |    round(ln((1 - m2) / (1 - u2)) / ln(2), 4),
         |    round(p, 6) FROM s$iters)
         |ORDER BY field""".stripMargin
  }

  /** Per-chunk marker-vote replay for the text_lang_mix gate: the
   * langidOracle arithmetic over fixed 50-token windows, then the
   * per-document majority profile. */
  def langMixOracle(chunkTokens: Int): String = {
    val perLang = TextMetrics.langMarkers.toSeq.sortBy(_._1).map { case (l, ws) =>
      val terms = ws.map(w =>
        s"(length(p) - length(replace(p, '$w', ''))) / ${w.length}").mkString(" + ")
      s"SELECT doc_id, ci, '$l' AS lang, $terms AS hits FROM ch"
    }.mkString("\n  UNION ALL\n  ")
    val W = chunkTokens
    s"""WITH d AS (SELECT doc_id, str_split(text, ' ') AS tk FROM documents),
       |ch AS (SELECT doc_id, i AS ci,
       |    ' ' || array_to_string(tk[i*$W+1 : i*$W+$W], ' ') || ' ' AS p
       |  FROM d, unnest(generate_series(0, (len(tk) - 1) // $W)) AS g(i)),
       |s AS (
       |  $perLang),
       |r AS (SELECT doc_id, ci, lang, hits, row_number()
       |    OVER (PARTITION BY doc_id, ci ORDER BY hits DESC, lang) AS rn
       |  FROM s),
       |cl AS (SELECT doc_id,
       |    CASE WHEN hits > 0 THEN lang ELSE 'und' END AS lang
       |  FROM r WHERE rn = 1),
       |pl AS (SELECT doc_id, lang, count(*)::BIGINT AS c FROM cl
       |  GROUP BY 1, 2),
       |tt AS (SELECT doc_id, sum(c)::BIGINT AS n,
       |    count(*)::BIGINT AS n_langs FROM pl GROUP BY 1),
       |mj AS (SELECT pl.doc_id, pl.lang, pl.c, row_number()
       |    OVER (PARTITION BY pl.doc_id ORDER BY c DESC, lang) AS rn
       |  FROM pl)
       |SELECT mj.doc_id AS doc_id, tt.n AS n_chunks, tt.n_langs,
       |  mj.lang AS majority_lang, round(mj.c / tt.n, 4) AS consistency
       |FROM mj JOIN tt ON tt.doc_id = mj.doc_id WHERE rn = 1
       |ORDER BY mj.doc_id""".stripMargin
  }

  /** Unrolled BFS relaxation replay for graph_hops: dist_{t+1}(u) =
   * min(dist_t(u), min over edges v->u of dist_t(v) + 1), MATERIALIZED
   * per round (plain CTEs re-inline the whole frontier history
   * exponentially — the IPF/bpe lesson). */
  def hopDistanceOracle(maxHops: Int, nSeeds: Int): String = {
    val pre =
      s"""WITH e0 AS MATERIALIZED (SELECT o_custkey % 997 AS src,
         |    o_orderkey % 997 AS dst FROM orders),
         |d0 AS MATERIALIZED (SELECT unnest(range($nSeeds)) AS node,
         |    0::BIGINT AS dist)""".stripMargin
    val steps = (0 until maxHops).map { t =>
      s""",
         |r${t + 1} AS MATERIALIZED (SELECT e.dst AS node,
         |    (min(d.dist) + 1)::BIGINT AS nd
         |  FROM e0 e JOIN d$t d ON d.node = e.src GROUP BY e.dst),
         |d${t + 1} AS MATERIALIZED (SELECT
         |    coalesce(d.node, r.node) AS node,
         |    least(coalesce(d.dist, r.nd), coalesce(r.nd, d.dist))
         |      AS dist
         |  FROM d$t d FULL OUTER JOIN r${t + 1} r ON r.node = d.node)"""
        .stripMargin
    }.mkString
    pre + steps +
      s"""
         |SELECT node, dist FROM d$maxHops ORDER BY node""".stripMargin
  }

  /** Unrolled Bradley–Terry MM oracle (Hunter 2004) over the
   * q_bradley_terry match derivation: consecutive (even, even+1) document
   * pairs, the longer doc's language wins, same-lang/same-length pairs
   * dropped. `iters` MM rounds from the uniform start, normalizing each
   * round. Summation ORDER is pinned to the engine's (item-sorted index
   * loop) via list_sum over ORDER BY lists, so the float recursion is
   * bit-identical, not merely close. */
  def bradleyTerryOracle(iters: Int): String = {
    val pre =
      """WITH d AS (SELECT doc_id, lang, n_chars FROM documents),
        |m0 AS (
        |  SELECT CASE WHEN a.n_chars > b.n_chars THEN a.lang
        |           ELSE b.lang END AS w,
        |         CASE WHEN a.n_chars > b.n_chars THEN b.lang
        |           ELSE a.lang END AS l
        |  FROM d a JOIN d b ON b.doc_id = a.doc_id + 1
        |  WHERE a.doc_id % 2 = 0 AND a.n_chars <> b.n_chars
        |    AND a.lang <> b.lang),
        |pairs AS MATERIALIZED (SELECT w, l, count(*)::BIGINT AS n
        |  FROM m0 WHERE w IS NOT NULL AND l IS NOT NULL AND w <> l
        |  GROUP BY 1, 2),
        |wl AS MATERIALIZED (
        |  SELECT i.i AS item, coalesce(wn.wins, 0)::BIGINT AS wins,
        |    coalesce(lo.losses, 0)::BIGINT AS losses
        |  FROM (SELECT w AS i FROM pairs UNION SELECT l FROM pairs) i
        |  LEFT JOIN (SELECT w, sum(n)::BIGINT AS wins FROM pairs
        |    GROUP BY 1) wn ON wn.w = i.i
        |  LEFT JOIN (SELECT l, sum(n)::BIGINT AS losses FROM pairs
        |    GROUP BY 1) lo ON lo.l = i.i),
        |nmat AS MATERIALIZED (SELECT a, b, sum(n)::DOUBLE AS n FROM (
        |    SELECT w AS a, l AS b, n FROM pairs
        |    UNION ALL SELECT l, w, n FROM pairs)
        |  GROUP BY 1, 2),
        |p0 AS MATERIALIZED (SELECT item,
        |    1.0::DOUBLE / (SELECT count(*) FROM wl) AS pi
        |  FROM wl)""".stripMargin
    val steps = (1 to iters).map { t =>
      s""",
         |den$t AS (SELECT nmat.a AS item,
         |    list_sum(list(nmat.n / (pa.pi + pb.pi) ORDER BY nmat.b))
         |      AS denom
         |  FROM nmat
         |  JOIN p${t - 1} pa ON pa.item = nmat.a
         |  JOIN p${t - 1} pb ON pb.item = nmat.b
         |  GROUP BY 1),
         |raw$t AS MATERIALIZED (SELECT wl.item,
         |    CASE WHEN coalesce(den$t.denom, 0) > 0
         |      THEN wl.wins / den$t.denom ELSE 0.0 END AS raw
         |  FROM wl LEFT JOIN den$t USING (item)),
         |p$t AS MATERIALIZED (SELECT item,
         |    CASE WHEN s.s > 0 THEN raw / s.s ELSE raw END AS pi
         |  FROM raw$t,
         |    (SELECT list_sum(list(raw ORDER BY item)) AS s FROM raw$t) s)"""
        .stripMargin
    }.mkString
    pre + steps +
      s"""
         |SELECT wl.item, wl.wins, wl.losses,
         |  (wl.wins + wl.losses)::BIGINT AS n_matches,
         |  round(p$iters.pi, 6) AS rating,
         |  dense_rank() OVER (ORDER BY round(p$iters.pi, 6) DESC)::BIGINT
         |    AS rank
         |FROM wl JOIN p$iters USING (item)
         |ORDER BY rank, item""".stripMargin
  }
}
