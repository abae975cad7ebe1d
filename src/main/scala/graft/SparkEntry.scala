package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ebw.{DesignMatrix, EbwOptions, EntropyBalance, GroupedEntropyBalance}
import graft.ops.{Dedup, Similarity, Skew, TextMetrics}

/**
 * Driver contract (SURVEY.md §2/§7): one entry per implemented capability,
 * with DuckDB-equivalent oracle SQL wherever the semantics are
 * SQL-expressible. Column names and float rounding are kept identical on
 * both sides; every query ends in a deterministic total order.
 */
object SparkEntry {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
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
  private def eventsTsUs(s: SparkSession, dir: String): DataFrame = {
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
  private val minhashIdxPaths =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Flagship: EBW poststratification on sf=0.001 orders. */
  def entry(spark: SparkSession): DataFrame =
    queries("ebw_poststrat")(spark, "/root/testdata/sf0.001")

  // ------------------------------------------------------------- EBW helpers

  private def ebwPoststrat(s: SparkSession, dir: String): DataFrame = {
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
  private def ebwMomentsMatch(
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

  private val ebwMomentsOracle: String =
    """SELECT 'm0_bal_k' AS moment, round(avg(c_acctbal/1000.0), 4) AS value
      |FROM customer WHERE c_custkey % 3 = 0
      |UNION ALL
      |SELECT 'm1_lownation' AS moment,
      |  round(avg(CASE WHEN c_nationkey < 13 THEN 1.0 ELSE 0.0 END), 4) AS value
      |FROM customer WHERE c_custkey % 3 = 0
      |ORDER BY moment""".stripMargin

  // --------------------------------------------- shared gate parameters
  // (the Spark query and its DuckDB oracle must agree on these exactly)

  private val ngramMaxBucket = 2000
  // 4 bands x 8 bits = 256 buckets/band suits the 500-5000-vector test
  // corpus (bitsPerBand scales as ~log2(N) in production; the operator's
  // own defaults are 4 x 16); the oracle replays the identical banding.
  private val embCosMinCosine = 0.25
  private val embCosBands = 4
  private val embCosBits = 8
  private val embCosMaxBucket = 1000
  private val embDim = 64 // testdata embeddings dimension

  // --------------------------------------------- generated oracle SQL

  /** Portable simhash: bit b of a token is bit (b mod 4) of hex nibble
   * (b div 4) of md5(token); per-doc bit b of the fingerprint is the sign
   * of sum(+1/-1) over tokens. Emitted as a 16-char hex string, most
   * significant nibble first (mirrors Spark's lpad(hex(long))). */
  private def simhashOracle: String = {
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
  private def simhashPairsOracle: String = {
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

  /** Full-pipeline ngram-Jaccard oracle: replays the md5 minhash
   * signatures, 2-hash banding, hot-bucket cap, candidate join, and exact
   * within-bucket Jaccard of Dedup.ngramJaccardPairs on the same
   * docs-plus-mutated-copies union the gate query builds. */
  private def ngramJaccardOracle: String =
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
  private def minhashBandingCtes: String =
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
  private def lshEvalOracle: String =
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

  private def minhashPairsOracle: String =
    s"""$minhashBandingCtes
       |SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
       |FROM bk2 a JOIN bk2 b
       |  ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
       |ORDER BY id_a, id_b""".stripMargin

  /** Incremental gate: new docs (ids >= 1000000) paired against the
   * corpus index + themselves; corpus-corpus pairs excluded by
   * construction, exactly like minhashCandidatePairsIncremental. */
  private def minhashIncrOracle: String =
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
  private def embedCosineOracle: String = {
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
  private def langidOracle: String = {
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
  private def annLshOracle: String = {
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
  private def ebwPenaltyOracle: String = {
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
  private def ebwGroupedPenaltyOracle: String = {
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
  private val sqlExistsText: String =
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
  private val sqlLateralText: String =
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
  private val sqlGroupingSetsText: String =
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
  private val sqlScalarText: String =
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
  private def gopherOracle: String = {
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
  private def chunkBpeOracle: String = {
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
  private def langIdModelOracle: String = {
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
  private def c4Oracle: String = {
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
  private def bpeOracle: String = {
    val perWord = TextMetrics.bpeMerges.foldLeft(
      "concat(' ', rtrim(regexp_replace(w, '(.)', '\\1  ', 'g')), ' ')") {
        case (acc, (a, b)) => s"replace($acc, ' $a  $b ', ' $a$b ')"
      }
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

  /** 8-word phrase the repetition-family gate repeats twice in a third
   * of the spiked docs — guarantees non-degenerate dup 5..8-gram
   * coverage in both engines. */
  private val repPhrase =
    "redwood canyon mist falcon ember quartz harbor lantern"

  /** DuckDB replay of the full Gopher repetition family — deliberately a
   * DIFFERENT formulation from the Spark operator's per-row lambdas:
   * n-grams unnest to rows, duplication comes from a COUNT window,
   * interval union from the classic gaps-and-islands running-max, and
   * covered characters from 1-based list slices — so the gate
   * cross-checks two independent derivations of the same statistics. */
  private def repetitionFullOracle: String = {
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
  private val sqlNotInText: String =
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
  private val sqlWindowFrameText: String =
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
  private val sqlFilterAggText: String =
    """SELECT l_returnflag,
      |  count(*) AS n_all,
      |  count(*) FILTER (WHERE l_quantity >= 25) AS n_heavy,
      |  round(sum(l_extendedprice) FILTER (WHERE l_discount <= 0.02), 2)
      |    AS rev_lowdisc
      |FROM lineitem
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin

  // ----------------------------------------------------------------- queries

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_unpivot" -> ((s, dir) =>
      // UNPIVOT (melt): wide measure columns to long (metric, v) rows —
      // the inverse of q_pivot, a narrow per-row expansion with a fixed
      // metric list (no shuffle; the orderBy is presentational)
      t(s, dir, "lineitem")
        .filter(col("l_orderkey") < 100)
        .select("l_orderkey", "l_linenumber", "l_quantity",
          "l_extendedprice", "l_discount")
        .unpivot(
          Array(col("l_orderkey"), col("l_linenumber")),
          Array(col("l_quantity"), col("l_extendedprice"), col("l_discount")),
          "metric", "v")
        .orderBy("l_orderkey", "l_linenumber", "metric")),
    "q_try_cast" -> ((s, dir) =>
      // error-safe ingestion: TRY_CAST over deterministically malformed
      // numerics/dates (doc_id-derived, identical in both engines) —
      // invalid inputs land NULL, never an exception; date results are
      // projected through date_format so both engines compare strings
      // NOTE the int-cast input stays integral-or-garbage: engines
      // legitimately diverge on try_cast('2.5' AS INT) (DuckDB rounds,
      // Spark ANSI rejects), so fractional strings only feed the double
      t(s, dir, "documents")
        .select(col("doc_id"),
          when(col("doc_id") % 2 === 0, col("doc_id").cast("string"))
            .otherwise(concat(lit("x"), col("doc_id").cast("string")))
            .as("si"),
          when(col("doc_id") % 3 === 0,
              concat(col("doc_id").cast("string"), lit(".5")))
            .when(col("doc_id") % 3 === 1,
              concat(lit("x"), col("doc_id").cast("string")))
            .otherwise(col("doc_id").cast("string")).as("sd"),
          when(col("doc_id") % 2 === 0, "1995-03-07")
            .otherwise("1995-13-40").as("dt"))
        .select(col("doc_id"),
          expr("try_cast(si as int)").as("i_v"),
          expr("try_cast(sd as double)").as("d_v"),
          date_format(expr("try_cast(dt as date)"), "yyyy-MM-dd").as("date_v"))
        .orderBy("doc_id")),
    "q_filter_agg" -> ((s, dir) => {
      t(s, dir, "lineitem").createOrReplaceTempView("lineitem")
      s.sql(sqlFilterAggText)
    }),
    "q_window_frame" -> ((s, dir) => {
      t(s, dir, "lineitem").createOrReplaceTempView("lineitem")
      s.sql(sqlWindowFrameText)
    }),
    "q_array_funcs" -> ((s, dir) =>
      // array set-function family over overlapping token slices:
      // intersect/union/except/overlap, projected through sort+join to a
      // canonical string because the engines order set results
      // differently — all per-row lambda built-ins, zero shuffle
      t(s, dir, "documents")
        .select(col("doc_id"), split(col("text"), " ", -1).as("tok"))
        .filter(size(col("tok")) >= 15)
        .select(col("doc_id"),
          expr("slice(tok, 1, 10)").as("a"), expr("slice(tok, 6, 10)").as("b"))
        .select(col("doc_id"),
          array_join(sort_array(array_distinct(
            array_intersect(col("a"), col("b")))), ",").as("inter_s"),
          size(array_union(col("a"), col("b"))).cast("long").as("union_n"),
          array_join(sort_array(array_distinct(
            array_except(col("a"), col("b")))), ",").as("except_s"),
          arrays_overlap(col("a"), col("b")).cast("long").as("overlap"))
        .orderBy("doc_id")),
    "q_string_funcs" -> ((s, dir) =>
      // scalar string-function family over part names — all codegen'd
      // intrinsics in the Spark∩DuckDB dialect subset, evaluated in the
      // scan's project
      t(s, dir, "part")
        .filter(col("p_partkey") < 500)
        .select(col("p_partkey"),
          upper(col("p_name")).as("up"),
          lpad(col("p_brand"), 12, "*").as("lp"),
          rpad(col("p_brand"), 12, "-").as("rp"),
          reverse(col("p_type")).as("rev"),
          translate(col("p_type"), "AEIOU", "aeiou").as("tr"),
          expr("split_part(p_type, ' ', 1)").as("first_word"),
          substring(col("p_name"), 1, 5).as("left5"),
          expr("repeat(p_brand, 2)").as("rep2"),
          length(col("p_name")).cast("long").as("name_len"))
        .orderBy("p_partkey")),
    "q_not_in_null" -> ((s, dir) => {
      // ANSI 3VL: NOT IN over a subquery containing NULL is UNKNOWN for
      // every row — the with-null branch must count 0 while NOT EXISTS
      // counts normally; one shared text, both engines
      t(s, dir, "lineitem").createOrReplaceTempView("lineitem")
      t(s, dir, "part").createOrReplaceTempView("part")
      s.sql(sqlNotInText)
    }),
    "q_sql_scalar" -> ((s, dir) => {
      // correlated scalar subqueries via the SQL front door: one aggregate
      // subquery with a NULL-on-empty coalesce, one count subquery (counts
      // over empty groups must read 0, not NULL) — Catalyst plans both as
      // outer joins against grouped one-row-per-key aggregates, so the
      // scan of orders is shared-nothing and shuffle-partitioned, never a
      // per-row re-execution
      t(s, dir, "orders").createOrReplaceTempView("orders")
      t(s, dir, "customer").createOrReplaceTempView("customer")
      s.sql(sqlScalarText)
    }),
    "q_higher_order" -> ((s, dir) => {
      // higher-order array functions (lambda family): filter + transform +
      // aggregate over the token array — all evaluated inside the project
      // (codegen'd, zero shuffle), the array never explodes to rows. Every
      // output is cast to long because DuckDB's list_sum widens to HUGEINT
      // and len() returns BIGINT; the casts pin both engines to int64.
      t(s, dir, "documents")
        .select(col("doc_id"), split(col("text"), " ", -1).as("tok"))
        .select(col("doc_id"),
          expr("size(filter(tok, x -> length(x) > 4))").cast("long")
            .as("n_long"),
          expr("aggregate(filter(tok, x -> length(x) > 4), 0L, " +
            "(acc, x) -> acc + length(x))").as("sum_long_len"),
          expr("array_max(transform(tok, x -> length(x)))").cast("long")
            .as("max_len"),
          expr("size(filter(tok, x -> x rlike '^[0-9]+$'))").cast("long")
            .as("n_numeric"))
        .orderBy("doc_id")
    }),
    "q_datetime" -> ((s, dir) =>
      // datetime function family over the order-date column: truncation,
      // field extraction, day arithmetic, month-end — all codegen'd
      // date-time intrinsics evaluated in the scan's project (zero
      // shuffle). Non-portable encodings avoided by construction: weekday
      // is emitted as ISO Monday=1..7 (Spark weekday()+1 == DuckDB
      // isodow), truncation as a formatted string, arithmetic as day
      // counts from a fixed epoch.
      t(s, dir, "orders")
        .filter(col("o_orderkey") < 500)
        .select(col("o_orderkey"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("order_date"),
          year(col("o_orderdate")).cast("long").as("yr"),
          quarter(col("o_orderdate")).cast("long").as("qtr"),
          month(col("o_orderdate")).cast("long").as("mth"),
          (weekday(col("o_orderdate")) + 1).cast("long").as("isodow"),
          date_format(date_trunc("month", col("o_orderdate")), "yyyy-MM-dd")
            .as("month_start"),
          date_format(last_day(col("o_orderdate")), "yyyy-MM-dd")
            .as("month_end"),
          datediff(to_date(col("o_orderdate")), lit("1995-01-01").cast("date"))
            .cast("long").as("days_since_95"))
        .orderBy("o_orderkey")),
    "q_array_agg" -> ((s, dir) =>
      // array aggregation: collect_set + sort_array (deterministic via the
      // sort), projected through array_join so both engines compare the
      // same canonical string form
      t(s, dir, "orders")
        .groupBy("o_orderpriority")
        .agg(
          array_join(sort_array(collect_set(col("o_orderstatus"))), ",")
            .as("statuses"),
          countDistinct(col("o_orderstatus")).as("n_statuses"))
        .orderBy("o_orderpriority")),
    "q_json_extract" -> ((s, dir) => {
      // JSON parsing (crawl-metadata ingest): the JSON text is built by
      // identical concat in both engines (lang/source are plain ASCII, no
      // escaping), then parsed back with path extraction — nested object
      // path, string field, and numeric casts all gated
      val docs = t(s, dir, "documents")
      val meta = concat(lit("{\"doc\": {\"id\": "),
        col("doc_id").cast("string"), lit(", \"lang\": \""), col("lang"),
        lit("\"}, \"n_chars\": "), col("n_chars").cast("string"), lit("}"))
      docs.select(col("doc_id"), meta.as("meta"))
        .select(col("doc_id"),
          get_json_object(col("meta"), "$.doc.lang").as("lang_j"),
          get_json_object(col("meta"), "$.doc.id").cast("long").as("id_j"),
          get_json_object(col("meta"), "$.n_chars").cast("long").as("nc_j"))
        .orderBy("doc_id")
    }),
    "q_window_range" -> ((s, dir) => {
      // RANGE-frame window: 7-day ROLLING revenue per supplier — a value-
      // distance frame over a numeric day key (the ROWS-frame q_window
      // cannot express "all rows within 6 days"). Daily pre-aggregation
      // keeps one row per (supplier, day); the subset bounds the gate at
      // every SF while exercising the frame semantics fully.
      val daily = t(s, dir, "lineitem")
        .filter(col("l_suppkey") < 10 &&
          col("l_shipdate") < lit("1996-01-01").cast("timestamp"))
        .groupBy(col("l_suppkey"), to_date(col("l_shipdate")).as("d"))
        .agg(sum("l_extendedprice").as("rev"))
      val w = Window.partitionBy("l_suppkey")
        .orderBy(datediff(col("d"), lit("1995-01-01").cast("date")))
        .rangeBetween(-6, 0)
      daily.select(col("l_suppkey"),
          date_format(col("d"), "yyyy-MM-dd").as("day"),
          round(sum(col("rev")).over(w), 2).as("rev_7d"))
        .orderBy("l_suppkey", "day")
    }),
    "q_stats_agg" -> ((s, dir) =>
      // statistical aggregates: correlation, sample covariance/stddev —
      // one map-side-combined groupBy, co-moment state per group
      t(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
          round(corr(col("l_quantity"), col("l_extendedprice")), 6).as("corr_qp"),
          round(covar_samp(col("l_quantity"), col("l_extendedprice")), 2).as("covar_qp"),
          round(stddev_samp(col("l_quantity")), 4).as("sd_q"),
          round(avg(col("l_quantity")), 4).as("avg_q"))
        .orderBy("l_returnflag")),
    "q_setops" -> ((s, dir) => {
      // INTERSECT / EXCEPT (distinct set semantics in both engines)
      val li = t(s, dir, "lineitem")
      val a = li.filter(col("l_quantity") >= 48).select("l_partkey")
      val b = li.filter(col("l_discount") <= 0.01).select("l_partkey")
      a.intersect(b).select(lit("intersect").as("op"), col("l_partkey"))
        .unionAll(a.except(b).select(lit("except").as("op"), col("l_partkey")))
        .orderBy("op", "l_partkey")
    }),
    "q_sql_exists" -> ((s, dir) => {
      t(s, dir, "orders").createOrReplaceTempView("orders")
      t(s, dir, "lineitem").createOrReplaceTempView("lineitem")
      s.sql(sqlExistsText)
    }),
    "q_sql_lateral" -> ((s, dir) => {
      t(s, dir, "customer").createOrReplaceTempView("customer")
      t(s, dir, "orders").createOrReplaceTempView("orders")
      s.sql(sqlLateralText)
    }),
    "q_window_nav" -> ((s, dir) => {
      // window navigation family: lag/lead over the deterministic per-
      // supplier ship order, rank/dense_rank over a tied value (l_quantity
      // repeats within a supplier, so the two differ), ntile over the total
      // order. The supplier subset bounds the gate at every SF; one window
      // partitioning serves all five functions (a single Window exec pair,
      // no extra Exchange per function).
      val ord = Seq(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"))
      val w = Window.partitionBy("l_suppkey").orderBy(ord: _*)
      val wq = Window.partitionBy("l_suppkey").orderBy("l_quantity")
      t(s, dir, "lineitem")
        .filter(col("l_suppkey") < 10)
        .select(col("l_suppkey"),
          date_format(col("l_shipdate"), "yyyy-MM-dd").as("ship_date"),
          col("l_orderkey"), col("l_linenumber"),
          lag("l_quantity", 1).over(w).as("prev_qty"),
          lead("l_quantity", 1).over(w).as("next_qty"),
          rank().over(wq).cast("long").as("qty_rank"),
          dense_rank().over(wq).cast("long").as("qty_drank"),
          ntile(4).over(w).cast("long").as("bucket4"))
        .orderBy("l_suppkey", "l_orderkey", "l_linenumber")
    }),
    "q_full_outer" -> ((s, dir) => {
      // FULL OUTER join (the one join type previously ungated): per-
      // customer URGENT-order rollup vs the BUILDING customer dim. Every
      // customer has *some* order in this testdata, so the left side is
      // restricted to urgent orders to make both null sides real:
      // right-only = BUILDING customers with no urgent orders, left-only =
      // urgent buyers outside BUILDING. Keys coalesced, sides marked,
      // total order.
      val ord = t(s, dir, "orders")
        .filter(col("o_orderpriority") === "1-URGENT")
        .groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("n_orders"),
          round(sum("o_totalprice"), 2).as("total"))
      val cust = t(s, dir, "customer")
        .filter(col("c_mktsegment") === "BUILDING")
        .select(col("c_custkey"), col("c_mktsegment"))
      ord.join(cust, col("o_custkey") === col("c_custkey"), "full_outer")
        .select(
          coalesce(col("o_custkey"), col("c_custkey")).as("custkey"),
          when(col("o_custkey").isNotNull && col("c_custkey").isNotNull, "both")
            .when(col("o_custkey").isNotNull, "orders_only")
            .otherwise("building_only").as("side"),
          col("n_orders"), col("total"), col("c_mktsegment"))
        .orderBy("custkey")
    }),
    "q_setops_all" -> ((s, dir) => {
      // EXCEPT ALL / INTERSECT ALL — the multiset (bag) semantics that
      // q_setops' distinct variants cannot express: duplicate l_partkeys
      // survive with multiplicity min(a,b) / a-b
      val li = t(s, dir, "lineitem")
      val a = li.filter(col("l_quantity") >= 48).select("l_partkey")
      val b = li.filter(col("l_discount") <= 0.01).select("l_partkey")
      a.intersectAll(b).select(lit("intersect_all").as("op"), col("l_partkey"))
        .unionAll(a.exceptAll(b).select(lit("except_all").as("op"), col("l_partkey")))
        .orderBy("op", "l_partkey")
    }),
    "q_grouping_sets" -> ((s, dir) => {
      // GROUPING SETS general form via the SQL front door — shared text
      // with the oracle; the partial-set list is expressible by neither
      // CUBE nor ROLLUP (both already gated)
      t(s, dir, "lineitem").createOrReplaceTempView("lineitem")
      s.sql(sqlGroupingSetsText)
    }),
    "q_sessionize" -> ((s, dir) => {
      // batch gap-based sessionization with the NATIVE session_window
      // aggregation (one shuffle by user, sort-merge session assembly —
      // the same operator the streaming path uses, here in batch): a
      // session extends while the next event starts within 30 min of the
      // last, and ends at last_event + gap. The DuckDB oracle derives
      // identical sessions from first principles (lag + running break sum)
      eventsTsUs(s, dir)
        .withColumn("ts", timestamp_micros(col("ts_us"))).drop("ts_us")
        .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("sw"))
        .agg(count(lit(1)).as("n_events"), round(sum("value"), 2).as("sum_value"))
        .select(col("user_id"),
          date_format(col("sw.start"), "yyyy-MM-dd HH:mm:ss").as("session_start"),
          date_format(col("sw.end"), "yyyy-MM-dd HH:mm:ss").as("session_end"),
          col("n_events"), col("sum_value"))
        .orderBy("user_id", "session_start")
    }),
    // §2b — query engine
    "q1_pricing" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") <= lit("1998-09-01").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          round(sum("l_quantity"), 2).as("sum_qty"),
          round(sum("l_extendedprice"), 2).as("sum_base_price"),
          round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
            .as("sum_disc_price"),
          round(avg("l_quantity"), 4).as("avg_qty"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    }),
    "q3_topk" -> ((s, dir) => {
      val cust = t(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
      val ord = t(s, dir, "orders")
        .filter(col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
      val li = t(s, dir, "lineitem")
        .filter(col("l_shipdate") > lit("1996-01-01").cast("timestamp"))
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .groupBy(col("o_orderkey"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("order_date"))
        .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
          .as("revenue"))
        .orderBy(desc("revenue"), col("o_orderkey"))
        .limit(10)
    }),
    "q_star_join" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val sup = t(s, dir, "supplier")
      val nat = t(s, dir, "nation")
      val reg = t(s, dir, "region")
      li.join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(reg), col("n_regionkey") === col("r_regionkey"))
        .groupBy("r_name", "n_name")
        .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
          .as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy("r_name", "n_name")
    }),
    "q_window" -> ((s, dir) => {
      val order = Seq(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"))
      val w = Window.partitionBy("l_suppkey").orderBy(order: _*)
      val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, dir, "lineitem")
        .withColumn("rn", row_number().over(w).cast("long"))
        .withColumn("run_qty", sum("l_quantity").over(wRun))
        .filter(col("rn") <= 5)
        .select(col("l_suppkey"), col("rn"), col("l_orderkey"), col("l_linenumber"),
          date_format(col("l_shipdate"), "yyyy-MM-dd").as("ship_date"), col("run_qty"))
        .orderBy("l_suppkey", "rn")
    }),
    "q_anti_join" -> ((s, dir) => {
      val cust = t(s, dir, "customer")
      val urgent = t(s, dir, "orders").filter(col("o_orderpriority") === "1-URGENT")
      cust.join(urgent, col("c_custkey") === col("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_mktsegment"))
        .orderBy("c_custkey")
    }),
    "q_semi_join" -> ((s, dir) => {
      val part = t(s, dir, "part")
      val li = t(s, dir, "lineitem").filter(col("l_quantity") >= 45)
      part.join(li, col("p_partkey") === col("l_partkey"), "left_semi")
        .select(col("p_partkey"), col("p_brand"))
        .orderBy("p_partkey")
    }),
    "q_cube" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"), round(sum("l_quantity"), 2).as("qty"))
        .select(coalesce(col("l_returnflag"), lit("ALL")).as("rf"),
          coalesce(col("l_linestatus"), lit("ALL")).as("ls"),
          col("n"), col("qty"))
        .orderBy("rf", "ls")
    }),
    "ann_hard_negatives" -> ((s, dir) =>
      // contrastive hard negatives: per anchor, the 5 most similar
      // vectors with a DIFFERENT label — batchTopK's two-stage top-k
      // with the mismatch predicate before the prune
      Similarity.hardNegatives(t(s, dir, "embeddings"), "embedding",
          "vec_id", "label", k = 5,
          anchors = Some(t(s, dir, "embeddings")
            .filter(col("vec_id") < 10)),
          roundDigits = Some(5))
        .orderBy("anchor", "rank")),
    "ann_batch" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val corpus = emb.filter(col("vec_id") >= 5)
      val queries = emb.filter(col("vec_id") < 5)
        .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
      Similarity.batchTopK(corpus, "embedding", "vec_id", queries,
          "qid", "qvec", k = 5, roundDigits = Some(5))
        .select(col("qid"), col("id").as("vec_id"),
          col("cosine"), col("rank"))
        .orderBy("qid", "rank")
    }),
    "q_rollup" -> ((s, dir) => {
      t(s, dir, "orders")
        .rollup(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"), round(sum("o_totalprice"), 2).as("total"))
        .select(coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
          coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
          col("n"), col("total"))
        .orderBy("status", "priority")
    }),
    "q_salted_join" -> ((s, dir) => {
      // the skew-mitigation operator under the oracle gate: salted join
      // must produce exactly the plain-join aggregate
      val li = t(s, dir, "lineitem")
        .select(col("l_suppkey").as("k"), col("l_extendedprice"), col("l_discount"))
      val sup = t(s, dir, "supplier")
        .select(col("s_suppkey").as("k"), col("s_name"))
      Skew.saltedJoin(li, sup, "k", 8)
        .groupBy("s_name")
        .agg(count(lit(1)).as("n_items"),
          round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
            .as("revenue"))
        .orderBy("s_name")
    }),
    "q_events_window" -> ((s, dir) => {
      // events.ts normalizes to exact epoch micros whatever physical
      // parquet type shipped (see eventsTsUs), == DuckDB's epoch_us
      eventsTsUs(s, dir)
        .withColumn("ts", timestamp_micros(col("ts_us"))).drop("ts_us")
        .groupBy(window(col("ts"), "5 minutes").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sum_value"))
        .select(date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("bucket_start"),
          col("event_type"), col("n"), col("sum_value"))
        .orderBy("bucket_start", "event_type")
    }),
    "q_asof_join" -> ((s, dir) => {
      // attribution: each click matched to the user's latest at-or-before
      // view (backward as-of join; union-window plan, no inequality join)
      val ev = eventsTsUs(s, dir)
        .withColumn("ts", timestamp_micros(col("ts_us"))).drop("ts_us")
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("event_id"), col("user_id"), col("ts"))
      val views = ev.filter(col("event_type") === "view")
        .select(col("event_id"), col("user_id"), col("ts"), col("value"))
      graft.ops.AsOf.joinBackward(clicks, views, "user_id", "ts", "ts",
          "event_id", Seq("value"))
        .select(col("event_id").as("click_id"), col("user_id"),
          col("asof_event_id").as("view_id"),
          round(col("asof_value"), 2).as("view_value"))
        .orderBy("click_id")
    }),
    "q_asof_bucketed" -> ((s, dir) => {
      // skew-hardened as-of: same attribution semantics under a 30-minute
      // tolerance, window split into (user, 1-hour bucket) partitions so a
      // hot user never funnels through one task. Times stay integral
      // epoch-micros on both engines (== DuckDB's epoch_us).
      val ev = eventsTsUs(s, dir).withColumnRenamed("ts_us", "us")
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("event_id"), col("user_id"), col("us"))
      val views = ev.filter(col("event_type") === "view")
        .select(col("event_id"), col("user_id"), col("us"), col("value"))
      graft.ops.AsOf.joinBackwardBucketed(clicks, views, "user_id", "us", "us",
          "event_id", Seq("value"),
          bucketWidth = 3600000000L, tolerance = 1800000000L)
        .select(col("event_id").as("click_id"), col("user_id"),
          col("asof_event_id").as("view_id"),
          round(col("asof_value"), 2).as("view_value"))
        .orderBy("click_id")
    }),
    "q_stratified_sample" -> ((s, dir) => {
      // deterministic md5-ranked stratified sample: exact 50 orders per
      // priority, reproducible across engines and cluster layouts
      val orders = t(s, dir, "orders")
      graft.ops.Sampling.stratifiedExact(orders, "o_orderpriority",
          "o_orderkey", n = 50)
        .select(col("o_orderkey"), col("o_orderpriority"))
        .orderBy("o_orderkey")
    }),
    "q_temperature_sample" -> ((s, dir) => {
      // T=2 temperature mixing over languages: quotas proportional to
      // sqrt(n_d), smallest domain taken in full — between the natural
      // mix and full balance
      val d = t(s, dir, "documents")
      graft.ops.Sampling.temperatureSample(d, "lang", "doc_id",
          temperature = 2.0)
        .select(col("doc_id"), col("lang"))
        .orderBy("doc_id")
    }),
    "q_balanced_sample" -> ((s, dir) => {
      // class-balanced downsample: every language keeps exactly the
      // smallest language's row count, md5-ranked; the target is a
      // 1-row aggregate subtree, never a driver collect
      val d = t(s, dir, "documents")
      graft.ops.Sampling.balancedSample(d, "lang", "doc_id")
        .select(col("doc_id"), col("lang"))
        .orderBy("doc_id")
    }),
    "q_dwell" -> ((s, dir) => {
      // dwell-time profile: per-event-type gap-to-next-action stats
      // (censored last events drop); one user-keyed lead window + one
      // type aggregation with exact percentiles
      val ev = eventsTsUs(s, dir)
      graft.ops.Behavior.dwellTimes(ev, "user_id", "ts_us", "event_type")
        .orderBy("event_type")
    }),
    // §2a — EBW
    "ebw_poststrat" -> ((s, dir) => ebwPoststrat(s, dir)),
    "ebw_moments_match" -> ((s, dir) => ebwMomentsMatch(s, dir, None)),
    "ebw_bounded_feasible" -> ((s, dir) =>
      ebwMomentsMatch(s, dir, Some((0.05, Some(20.0))))),
    "ebw_sparse_bigk" -> ((s, dir) => {
      // k=997 one-hot: exercises the sparse-Gram + CG large-k path under
      // the oracle gate; closed-form poststratification weights in SQL
      val orders = t(s, dir, "orders")
        .withColumn("grp", (col("o_orderkey") % 997).cast("string"))
        .withColumn("w0", lit(1.0))
      val (dfv, labels) = DesignMatrix.oneHot(orders, "grp", "feat")
      val k = labels.length
      val res = EntropyBalance.entropyBalance(dfv, "feat", "w0",
        Array.fill(k)(1.0 / k), options = EbwOptions(optimalityTol = 1e-11))
      res.weighted
        .select(col("o_orderkey"), round(col("weight_new"), 6).as("new_weight"))
        .orderBy("o_orderkey")
    }),
    "ebw_grouped_poststrat" -> ((s, dir) => {
      // many problems, one scan per Newton round: an independent
      // priority-poststratification per order status
      val orders = t(s, dir, "orders").withColumn("w0", lit(1.0))
      val (dfv, labels) = DesignMatrix.oneHot(orders, "o_orderpriority", "feat")
      val k = labels.length
      val statuses = orders.select(col("o_orderstatus").cast("string")).distinct()
        .collect().map(_.getString(0))
      val targets = statuses.map(st => st -> Array.fill(k)(1.0 / k)).toMap
      val res = GroupedEntropyBalance.entropyBalanceGrouped(
        dfv, "o_orderstatus", "feat", "w0", targets,
        options = EbwOptions(optimalityTol = 1e-11, maxSteps = 60))
      res.weighted
        .select(col("o_orderkey"), round(col("weight_new"), 6).as("new_weight"))
        .orderBy("o_orderkey")
    }),
    "ebw_grouped_scale" -> ((s, dir) => {
      // grouped-solver SCALE probe (bench-visible): 500 simultaneous
      // poststratification problems advanced in shared treeAggregate
      // passes — the regression canary for the G-group production shape.
      // Sparse orderkeys leave thin groups at tiny SF, so groups missing
      // a cell are filtered out (equal-share targets would be infeasible
      // there); the filter is part of the shared semantics and at bench
      // scale (sf0.1) virtually all 500 groups survive
      val orders = t(s, dir, "orders")
        .withColumn("grp", (col("o_orderkey") % 500).cast("string"))
        .withColumn("cell",
          when(col("o_orderkey") % 7 < 3, "A").otherwise("B"))
        .withColumn("w0", lit(1.0))
      val full = orders.groupBy("grp")
        .agg(countDistinct(col("cell")).as("nc")).filter(col("nc") === 2)
        .select("grp")
      val kept = orders.join(full, "grp")
      val (dfv, labels) = DesignMatrix.oneHot(kept, "cell", "feat")
      val k = labels.length
      val grps = kept.select(col("grp")).distinct()
        .collect().map(_.getString(0))
      val targets = grps.map(g => g -> Array.fill(k)(1.0 / k)).toMap
      val res = GroupedEntropyBalance.entropyBalanceGrouped(
        dfv, "grp", "feat", "w0", targets,
        options = EbwOptions(optimalityTol = 1e-11, maxSteps = 60))
      res.weighted
        .select(col("o_orderkey"), round(col("weight_new"), 6).as("new_weight"))
        .orderBy("o_orderkey")
    }),
    "ebw_penalty" -> ((s, dir) => {
      val orders = t(s, dir, "orders").withColumn("w0", lit(1.0))
      val (dfv, labels) = DesignMatrix.oneHot(orders, "o_orderpriority", "feat")
      val k = labels.length
      val res = EntropyBalance.entropyBalancePenalty(dfv, "feat", "w0",
        Array.fill(k)(1.0 / k), Array(2.0),
        options = EbwOptions(optimalityTol = 1e-10, stepTol = 1e-12))
      res.weighted
        .select(col("o_orderkey"), round(col("weight_new"), 6).as("new_weight"))
        .orderBy("o_orderkey")
    }),
    "ebw_grouped_penalty" -> ((s, dir) => {
      // one penalty problem per order status, all advanced in shared passes
      val orders = t(s, dir, "orders").withColumn("w0", lit(1.0))
      val (dfv, labels) = DesignMatrix.oneHot(orders, "o_orderpriority", "feat")
      val k = labels.length
      val statuses = orders.select(col("o_orderstatus").cast("string")).distinct()
        .collect().map(_.getString(0))
      val targets = statuses.map(st => st -> Array.fill(k)(1.0 / k)).toMap
      val res = GroupedEntropyBalance.entropyBalancePenaltyGrouped(
        dfv, "o_orderstatus", "feat", "w0", targets, Array(2.0),
        options = EbwOptions(optimalityTol = 1e-10, maxSteps = 60))
      res.weighted
        .select(col("o_orderkey"), round(col("weight_new"), 6).as("new_weight"))
        .orderBy("o_orderkey")
    }),
    "ebw_equalize_groups" -> ((s, dir) => {
      // pums_example.py semantics: reweight so every market segment has the
      // national weighted mean account balance, preserving segment totals
      val cust = t(s, dir, "customer")
        .withColumn("bal_k", col("c_acctbal") / 1000.0)
        .withColumn("w0", lit(1.0))
      val (dfv, m, _) = DesignMatrix.equalizeGroups(
        cust, "c_mktsegment", Seq("bal_k"), "w0", "feat")
      val res = EntropyBalance.entropyBalance(dfv, "feat", "w0", m,
        options = EbwOptions(optimalityTol = 1e-10))
      res.weighted
        .groupBy(col("c_mktsegment").as("grp"))
        .agg(round(sum(col("bal_k") * col("weight_new")) / sum(col("weight_new")), 4)
          .as("mean_bal_k"))
        .orderBy("grp")
    }),
    // §2c — LLM-data pipeline ops
    "dedup_exact" -> ((s, dir) =>
      Dedup.exact(t(s, dir, "documents"), "text", "doc_id").orderBy("content_hash")),
    "dedup_minhash" -> ((s, dir) =>
      Dedup.minhashSignatures(t(s, dir, "documents"), "text", "doc_id")
        .orderBy("doc_id")),
    "dedup_simhash_pairs" -> ((s, dir) => {
      // full near-dup pipeline under the gate: pigeonhole banding over the
      // portable fingerprint, capped buckets, exact hamming verification
      val docs = t(s, dir, "documents").select("doc_id", "text")
      val mutated = docs.select((col("doc_id") + 1000000).as("doc_id"),
        concat(col("text"), lit(" tail tokens appended here")).as("text"))
      Dedup.simhashCandidatePairs(docs.unionAll(mutated), "text", "doc_id",
          maxHamming = 8, maxBucketSize = ngramMaxBucket, portable = true)
        .orderBy("id_a", "id_b")
    }),
    "dedup_simhash" -> ((s, dir) =>
      Dedup.simhash(t(s, dir, "documents"), "text", "doc_id", portable = true)
        .select(col("doc_id"),
          lower(lpad(hex(col("simhash")), 16, "0")).as("simhash_hex"))
        .orderBy("doc_id")),
    "text_tokens" -> ((s, dir) =>
      TextMetrics.tokenCounts(t(s, dir, "documents"), "text", "doc_id")
        .orderBy("doc_id")),
    "text_tokens_bpe" -> ((s, dir) =>
      // exact BPE encode (rank-ordered merge fold, shared table) — the
      // budget unit context windows are actually measured in; DuckDB
      // replays the identical 56-replace chain per word
      TextMetrics.bpeTokenCounts(t(s, dir, "documents"), "text", "doc_id")
        .orderBy("doc_id")),
    "text_quality" -> ((s, dir) =>
      TextMetrics.quality(t(s, dir, "documents"), "text", "doc_id")
        .orderBy("doc_id")),
    "text_tfidf" -> ((s, dir) =>
      TextMetrics.topTfidfTerms(t(s, dir, "documents"), "text", "doc_id", 3)
        .orderBy("doc_id", "rank")),
    "text_repetition" -> ((s, dir) =>
      TextMetrics.repetition(t(s, dir, "documents"), "text", "doc_id")
        .orderBy("doc_id")),
    "text_repetition_full" -> ((s, dir) => {
      // the complete Rae et al. Table A1 statistic family. The corpus is
      // single-line prose, so line/paragraph/phrase duplication is spiked
      // deterministically (doc_id-derived, identical text in both
      // engines): every doc gains a repeated line, half gain a repeated
      // paragraph, a third gain a twice-repeated 8-word phrase (dup
      // 5..8-grams) — every statistic lands non-degenerate
      val spiked = t(s, dir, "documents").select(col("doc_id"), concat(
        col("text"), lit("\ngrey line repeats\ngrey line repeats"),
        when(col("doc_id") % 2 === 0, lit("\n\npara dup\n\npara dup"))
          .otherwise(lit("\n\nsolo para")),
        when(col("doc_id") % 3 === 0, lit(s"\n$repPhrase $repPhrase"))
          .otherwise(lit(""))).as("text"))
      TextMetrics.repetitionFull(spiked, "text", "doc_id").orderBy("doc_id")
    }),
    "text_fingerprint" -> ((s, dir) =>
      TextMetrics.fingerprint(t(s, dir, "documents"), "text", "doc_id",
          portable = true)
        .orderBy("doc_id")),
    "dedup_minhash_pairs" -> ((s, dir) => {
      // banding-level gate: candidate PAIRS (not just signatures) under
      // the oracle, on the same docs-plus-near-dups union as ngram
      val docs = t(s, dir, "documents").select("doc_id", "text")
      val mutated = docs.select((col("doc_id") + 1000000).as("doc_id"),
        concat(col("text"), lit(" tail tokens appended here")).as("text"))
      Dedup.minhashCandidatePairs(docs.unionAll(mutated), "text", "doc_id",
          maxBucketSize = ngramMaxBucket)
        .orderBy("id_a", "id_b")
    }),
    "dedup_lsh_eval" -> ((s, dir) => {
      // measured LSH accuracy on a deterministic 1/10 sample of the
      // docs-plus-near-dups union — the harness's DOCUMENTED regime
      // (truth is uncapped exact Jaccard, so its inverted-index join
      // cost tracks shingle df²; the synthetic corpus's tiny shared
      // vocabulary makes full-corpus truth a bench hot spot, and
      // sampling the EVAL is honest where capping the truth is not):
      // exact-Jaccard truth, minhash banding candidates, and the
      // S-curve's own prediction averaged over the true pairs —
      // closing the loop lshTune opens
      val docs = t(s, dir, "documents").select("doc_id", "text")
        .filter(col("doc_id") % 10 === 0)
      val mutated = docs.select((col("doc_id") + 1000000).as("doc_id"),
        concat(col("text"), lit(" tail tokens appended here")).as("text"))
      Dedup.lshEval(docs.unionAll(mutated), "text", "doc_id",
        minJaccard = 0.5, maxBucketSize = ngramMaxBucket)
    }),
    "dedup_paragraph" -> ((s, dir) => {
      // paragraph-level dedup gate: separators injected every 10 tokens
      // (identically in the oracle), clones duplicate every paragraph and
      // add one unique suffix paragraph — so clones survive with exactly
      // that suffix paragraph and originals keep their first occurrences
      val docs = t(s, dir, "documents").select("doc_id", "text")
      def withSep(c: Column) =
        regexp_replace(c, "((\\S+ ){9}\\S+) ", "$1 <p> ")
      val base = docs.select(col("doc_id"), withSep(col("text")).as("text"))
      val clones = docs.select((col("doc_id") + 1000000).as("doc_id"),
        concat(withSep(col("text")), lit(" <p> unique suffix "),
          col("doc_id")).as("text"))
      Dedup.paragraphDedup(base.unionAll(clones), "text", "doc_id", " <p> ")
        .orderBy("doc_id")
    }),
    "text_normalize" -> ((s, dir) =>
      TextMetrics.normalize(t(s, dir, "documents"), "text", "doc_id")
        .orderBy("doc_id")),
    "text_pii" -> ((s, dir) => {
      // PII scrub gate: the corpus itself is PII-free, so deterministic
      // synthetic PII (one email, one IPv4, one phone per doc, derived
      // from doc_id) is appended identically here and in the oracle —
      // every count lands non-zero and every replacement class fires
      val docs = t(s, dir, "documents").select("doc_id", "text")
      val spiked = docs.select(col("doc_id"),
        concat(col("text"), lit(" contact user"),
          col("doc_id").cast("string"), lit("@example.com from 10.0."),
          (col("doc_id") % 256).cast("string"), lit(".7 or call 555-867-"),
          lpad((col("doc_id") % 10000).cast("string"), 4, "0")).as("text"))
      TextMetrics.piiScrub(spiked, "text", "doc_id").orderBy("doc_id")
    }),
    "dedup_spans" -> ((s, dir) => {
      // cross-document repeated spans: every 5th doc is cloned with a
      // 3-token unique prefix, so each clone's spans duplicate the
      // original's at shifted positions (stride=1 detection is
      // alignment-free); the corpus's own docs are span-unique, so
      // exactly the clone pairs (plus their internal prefix boundary
      // spans) surface
      val docs = t(s, dir, "documents").select("doc_id", "text")
      val clones = docs.filter(col("doc_id") % 5 === 0)
        .select((col("doc_id") + 3000000).as("doc_id"),
          concat(lit("clone marker "), col("doc_id").cast("string"),
            lit(" "), col("text")).as("text"))
      Dedup.crossDocSpans(docs.unionAll(clones), "text", "doc_id",
          n = 10, stride = 1)
        .orderBy("doc_id", "pos")
    }),
    "dedup_spans_mask" -> ((s, dir) => {
      // the removal stage over the same cloned corpus as dedup_spans:
      // fully-cloned docs mask to empty (every span duplicated — exact
      // dedup's job in a real chain), docs sharing nothing pass through
      // byte-identical, and the clone keeps only its unique 3-token
      // prefix's boundary remainder
      val docs = t(s, dir, "documents").select("doc_id", "text")
      val clones = docs.filter(col("doc_id") % 5 === 0)
        .select((col("doc_id") + 3000000).as("doc_id"),
          concat(lit("clone marker "), col("doc_id").cast("string"),
            lit(" "), col("text")).as("text"))
      Dedup.maskRepeatedSpans(docs.unionAll(clones), "text", "doc_id",
          n = 10, stride = 1)
        // the trivially-true filter pins the computed column into every
        // consumer's plan: a bare count() would otherwise let Catalyst
        // eliminate the (provably row-preserving) span join entirely and
        // the bench would measure an empty shell
        .filter(col("n_tokens_removed") >= 0)
        .orderBy("doc_id")
    }),
    "dedup_url" -> ((s, dir) => {
      // URL-canonicalization dedup gate: deterministic messy URLs (mixed
      // case, scheme/www variants, tracking query, fragment, trailing
      // slash — all doc_id-derived, identical in both engines) collapse
      // to lcm(50,100)=100 canonical keys with min-id election
      val urls = t(s, dir, "documents").select(col("doc_id"),
        concat(
          when(col("doc_id") % 4 === 0, "https://www.")
            .when(col("doc_id") % 4 === 1, "HTTP://")
            .when(col("doc_id") % 4 === 2, "https://")
            .otherwise("http://www."),
          lit("d"), (col("doc_id") % 50).cast("string"),
          lit(".example.com/page/"), (col("doc_id") % 100).cast("string"),
          when(col("doc_id") % 5 === 0, "/").otherwise(""),
          when(col("doc_id") % 2 === 0, "?utm_source=feed").otherwise(""),
          when(col("doc_id") % 3 === 0, "#section").otherwise("")).as("url"))
      Dedup.urlDedup(urls, "url", "doc_id").orderBy("url_key")
    }),
    "q_map_type" -> ((s, dir) =>
      // MAP-typed columns through the engine: construction from arrays,
      // scalar extraction by key, key-set projection to a canonical
      // string — all inside the scan's project (narrow, codegen'd).
      // DuckDB's map extraction returns a 1-element LIST, so its oracle
      // indexes [1]; Spark's element_at is already scalar.
      t(s, dir, "lineitem")
        .filter(col("l_orderkey") < 100)
        .withColumn("m", map_from_arrays(
          array(lit("qty"), lit("price")),
          array(col("l_quantity"), col("l_extendedprice"))))
        .select(col("l_orderkey"), col("l_linenumber"),
          element_at(col("m"), "qty").as("qty_v"),
          array_join(map_keys(col("m")), ",").as("keys_s"))
        .orderBy("l_orderkey", "l_linenumber")),
    "q_describe" -> ((s, dir) =>
      // DESCRIBE-style numeric profile: all three columns' statistics in
      // ONE aggregation over one scan, unpivoted from the 1-row result
      graft.ops.Profile.describeNumeric(t(s, dir, "lineitem"),
          Seq("l_quantity", "l_extendedprice", "l_discount"))
        .orderBy("column")),
    "q_key_skew" -> ((s, dir) =>
      // join-key skew diagnosis: heaviest 10 keys with row share and
      // ratio to the mean key load (the salting decision input); totals
      // enter as a 1-row aggregate subtree, top-k is a TakeOrdered
      graft.ops.Profile.keySkew(t(s, dir, "lineitem"), "l_suppkey", 10)),
    "q_group_topk" -> ((s, dir) =>
      // best-n-per-key: top-3 orders per priority by total price, the
      // order key as the unique tiebreak; the rank filter plans as
      // WindowGroupLimit with a partial (pre-shuffle) prune — audited
      graft.ops.Profile.topKPerGroup(
          t(s, dir, "orders")
            .select("o_orderpriority", "o_orderkey", "o_totalprice"),
          Seq("o_orderpriority"),
          Seq(col("o_totalprice").desc, col("o_orderkey").asc), 3)
        .orderBy("o_orderpriority", "rk")),
    "text_top_terms" -> ((s, dir) => {
      // corpus heavy hitters: exact top-25 tokens by frequency, rank ties
      // broken by the token — groupBy + TakeOrdered, no global sort (the
      // CMS sketch variant of this profile is spec-gated: estimates are
      // engine-specific by construction)
      val tok = t(s, dir, "documents")
        .select(explode(split(col("text"), " ", -1)).as("value"))
        .filter(col("value") =!= "")
      graft.ops.Profile.topValues(tok, "value", 25)
    }),
    "dedup_exact_incr" -> ((s, dir) => {
      // bloom-prefiltered incremental exact dedup: the new batch is half
      // exact corpus copies (new ids), half mutated texts; the bloom
      // prefilter sizes the verification join but the gate compares the
      // EXACT in_corpus answer, which must equal the oracle's plain
      // semi-join regardless of false positives
      val docs = t(s, dir, "documents").select("doc_id", "text")
      val newBatch = docs.filter(col("doc_id") % 2 === 0)
        .select((col("doc_id") + 1000000).as("doc_id"),
          when(col("doc_id") % 4 === 0, col("text"))
            .otherwise(concat(col("text"), lit(" novel tail"))).as("text"))
      val corpusHashes = Dedup.exact(docs, "text", "doc_id")
        .select("content_hash")
      Dedup.exactIncrementalBloom(newBatch, "text", "doc_id", corpusHashes,
          expectedItems = 1000000)
        .orderBy("doc_id")
    }),
    "text_c4_rules" -> ((s, dir) => {
      // C4 line+page rule gate: the corpus is single-line prose, so a
      // terminal '.' plus two deterministic extra lines are spiked
      // identically in both engines — the second line cycles through the
      // drop reasons (javascript, too short, policy boilerplate) and a
      // kept sentence, the third line plants lorem-ipsum + '{' on a
      // coprime cycle, so every rule fires and the keep verdict splits
      val docs = t(s, dir, "documents").select("doc_id", "text")
      val spiked = docs.select(col("doc_id"),
        concat(col("text"), lit(".\n"),
          when(col("doc_id") % 4 === 0,
              lit("click here javascript required."))
            .when(col("doc_id") % 4 === 1, lit("short line"))
            .when(col("doc_id") % 4 === 2,
              lit("read our privacy policy and terms of use."))
            .otherwise(
              lit("a perfectly fine second sentence with many words in it.")),
          lit("\n"),
          when(col("doc_id") % 7 === 0, lit("Lorem Ipsum dolor { sit amet"))
            .otherwise(
              lit("and a third closing sentence follows right here today!")))
          .as("text"))
      TextMetrics.c4Rules(spiked, "text", "doc_id").orderBy("doc_id")
    }),
    "text_gopher" -> ((s, dir) => {
      // Gopher quality-rule gate: the corpus is single-line prose, so
      // deterministic line structure (a leading bullet line, a tail line
      // that is either an ellipsis-ended continuation or a '#'-bearing
      // plain line) is spiked identically in both engines — every line
      // statistic and the symbol ratio land non-degenerate and the keep
      // verdict splits
      val docs = t(s, dir, "documents").select("doc_id", "text")
      val spiked = docs.select(col("doc_id"),
        concat(lit("- bullet intro\n"), col("text"),
          when(col("doc_id") % 3 === 0,
            lit("\n• dotted line\nto be continued..."))
            .otherwise(lit("\nplain # tail line"))).as("text"))
      TextMetrics.gopherQuality(spiked, "text", "doc_id").orderBy("doc_id")
    }),
    "text_unigram_lm" -> ((s, dir) =>
      // corpus-derived unigram LM quality score (CCNet-style perplexity
      // proxy): vocabulary from the corpus itself, so no OOV path and the
      // oracle replays the exact same model
      TextMetrics.unigramLogProb(t(s, dir, "documents"), "text", "doc_id")
        .orderBy("doc_id")),
    "text_urls" -> ((s, dir) => {
      // URL/domain curation gate: deterministic URLs (one allowed, one
      // blocklisted per doc, derived from doc_id) are spiked identically
      // in both engines; the blocklist is a 5-row table the operator
      // broadcasts — the oracle replays it as the equivalent LIKE rule
      val docs = t(s, dir, "documents").select("doc_id", "text")
      val spiked = docs.select(col("doc_id"),
        concat(col("text"), lit(" see https://d"),
          (col("doc_id") % 20).cast("string"), lit(".example.com/p/"),
          col("doc_id").cast("string"), lit(" and http://ads"),
          (col("doc_id") % 5).cast("string"), lit(".bad.org/x")).as("text"))
      val urls = TextMetrics.extractUrls(spiked, "text", "doc_id")
      import s.implicits._
      val blocklist = (0 until 5).map(i => s"ads$i.bad.org").toDF("domain")
      TextMetrics.domainProfile(urls, "doc_id", blocklist).orderBy("domain")
    }),
    "text_cdc_chunk" -> ((s, dir) =>
      // content-defined chunking: boundaries wherever the md5 of the
      // trailing 8-char window starts with '0' — replayed exactly by the
      // oracle's list lambdas; chunk ids/starts/texts all gated
      TextMetrics.cdcChunk(t(s, dir, "documents"), "text", "doc_id",
          window = 8)
        .orderBy("doc_id", "chunk_id")),
    "text_chunk" -> ((s, dir) =>
      TextMetrics.chunk(t(s, dir, "documents"), "text", "doc_id",
          size = 64, stride = 32)
        .orderBy("doc_id", "chunk_id")),
    "text_strip_html" -> ((s, dir) => {
      // markup-strip gate: the corpus is plain text, so deterministic
      // markup (tags + all five core entities, incl. a double-escaped
      // one) wraps every doc identically here and in the oracle
      val docs = t(s, dir, "documents").select("doc_id", "text")
      val spiked = docs.select(col("doc_id"),
        concat(lit("<html><body class=\"c\">"), col("text"),
          lit("</p><br/> &amp; tail &lt;b&gt; &quot;q&quot; &#39;s&#39; " +
            "&amp;lt;keep&amp;gt;")).as("text"))
      TextMetrics.stripHtml(spiked, "text", "doc_id").orderBy("doc_id")
    }),
    "text_pack" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
        .withColumn("shard", col("doc_id") % 16)
      TextMetrics.packBins(docs, "text", "doc_id", budget = 256,
          shardCol = "shard")
        .orderBy("doc_id")
    }),
    "q_pivot" -> ((s, dir) =>
      // pivot with an explicit value list: one groupBy, no
      // distinct-values pre-job, fixed output schema
      t(s, dir, "orders")
        .withColumn("yr", year(col("o_orderdate")))
        .groupBy("o_orderpriority")
        .pivot("yr", Seq(1995, 1996, 1997))
        .agg(round(sum("o_totalprice"), 2))
        .select(col("o_orderpriority").as("priority"),
          col("1995").as("rev_1995"), col("1996").as("rev_1996"),
          col("1997").as("rev_1997"))
        .orderBy("priority")),
    "q_group_quantiles" -> ((s, dir) =>
      graft.ops.Profile.groupQuantiles(t(s, dir, "orders"),
          "o_orderpriority", "o_totalprice", Seq(0.25, 0.5, 0.75, 0.95))
        .orderBy("grp", "q")),
    "q_group_distinct" -> ((s, dir) =>
      graft.ops.Profile.groupDistinct(t(s, dir, "orders"),
          "o_orderpriority", "o_custkey")
        .orderBy("grp")),
    "text_contamination" -> ((s, dir) => {
      // decontamination gate: every 25th document plays the benchmark, so
      // benchmark members read 1.0 and the rest 0.0 on this dup-free corpus
      val docs = t(s, dir, "documents").select("doc_id", "text")
      val bench = docs.filter(col("doc_id") % 25 === 0)
      TextMetrics.contamination(docs, "text", "doc_id", bench, "text", n = 8)
        .orderBy("doc_id")
    }),
    "dedup_minhash_incr" -> ((s, dir) => {
      // incremental crawl-vs-corpus dedup: the corpus contributes only its
      // PERSISTED band-key index — built and written to parquet once per
      // (process, sfDir), then only read back, so the gate measures the
      // production shape (new-batch cost against an existing index), not
      // an inline rebuild of the corpus index on every run
      val docs = t(s, dir, "documents").select("doc_id", "text")
      val mutated = docs.select((col("doc_id") + 1000000).as("doc_id"),
        concat(col("text"), lit(" tail tokens appended here")).as("text"))
      val idxPath = minhashIdxPaths.computeIfAbsent(dir, _ => {
        val p = graft.ops.Scratch.dir("graft_minhash_idx") + "/keys"
        Dedup.minhashBandKeys(docs, "text", "doc_id")
          .write.mode("overwrite").parquet(p)
        p
      })
      Dedup.minhashCandidatePairsIncremental(mutated, s.read.parquet(idxPath),
          "text", "doc_id", maxBucketSize = ngramMaxBucket)
        .orderBy("id_new", "id_match")
    }),
    "dedup_components" -> ((s, dir) => {
      // cluster election gate: chain edges (d, d+1) for d%20<7 build
      // islands of 8 consecutive doc_ids; connected components must label
      // every member with its island's minimum. Chains are the worst case
      // for label propagation (maximum diameter per edge count), so this
      // exercises the iterated star rounds, not just one hop.
      val ids = t(s, dir, "documents").select("doc_id")
      val edges = ids.select(col("doc_id").as("id_a"))
        .join(ids.select(col("doc_id").as("id_b")),
          col("id_b") === col("id_a") + 1)
        .where(col("id_a") % 20 < 7)
      Dedup.connectedComponents(edges).orderBy("id")
    }),
    "dedup_components_incr" -> ((s, dir) => {
      // incremental election gate: the chain islands' even-id_a edges were
      // labeled "yesterday" (in production that labeling arrives from
      // parquet, so the gate constructs it directly — even edges pair
      // (e, e+1), closed form component = id - id%2); today's odd-edge
      // batch folds in and must reproduce the one-shot labeling exactly
      val ids = t(s, dir, "documents").select("doc_id")
      val labels1 = ids.where(col("doc_id") % 20 <= 7)
        .select(col("doc_id").as("id"),
          (col("doc_id") - col("doc_id") % 2).as("component"))
      val newEdges = ids.select(col("doc_id").as("id_a"))
        .join(ids.select(col("doc_id").as("id_b")),
          col("id_b") === col("id_a") + 1)
        .where(col("id_a") % 20 < 7 && col("id_a") % 2 === 1)
      Dedup.connectedComponentsIncremental(labels1, newEdges).orderBy("id")
    }),
    "dedup_ngram_jaccard" -> ((s, dir) => {
      // self-union with mutated copies guarantees the operator exercises
      // its match path even on a dup-free corpus
      val docs = t(s, dir, "documents").select("doc_id", "text")
      val mutated = docs.select((col("doc_id") + 1000000).as("doc_id"),
        concat(col("text"), lit(" tail tokens appended here")).as("text"))
      Dedup.ngramJaccardPairs(docs.unionAll(mutated), "text", "doc_id", 0.5,
          maxBucketSize = ngramMaxBucket)
        .select(col("id_a"), col("id_b"), round(col("jaccard"), 4).as("jaccard"))
        .orderBy("id_a", "id_b")
    }),
    "dedup_embed_cosine" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      Dedup.embeddingCosinePairs(emb, "embedding", "vec_id",
          minCosine = embCosMinCosine, bands = embCosBands,
          bitsPerBand = embCosBits, maxBucketSize = embCosMaxBucket)
        .select(col("id_a"), col("id_b"), round(col("cosine"), 5).as("cosine"))
        .orderBy("id_a", "id_b")
    }),
    "text_langid" -> ((s, dir) =>
      TextMetrics.langId(t(s, dir, "documents"), "text", "doc_id")
        .orderBy("doc_id")),
    "ann_lsh" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val q = emb.filter(col("vec_id") === 0)
        .select(col("embedding").cast("array<double>")).collect()(0)
        .getSeq[Double](0)
      Similarity.lshTopK(emb.filter(col("vec_id") =!= 0), "embedding",
          "vec_id", q, 10, bits = 3, roundDigits = Some(5))
        .orderBy(desc("cosine"), col("vec_id"))
    }),
    "ebw_lineitem" -> ((s, dir) => {
      // scale-representative solve: 3 continuous moments over lineitem,
      // targets from the deterministic l_orderkey%5==0 subpopulation
      val li = t(s, dir, "lineitem")
        .withColumn("price_k", col("l_extendedprice") / 1000.0)
        .withColumn("w0", lit(1.0))
        .withColumn("feat", array(col("l_quantity"), col("price_k"), col("l_discount")))
      val sub = li.filter(col("l_orderkey") % 5 === 0)
      val mr = sub.agg(avg("l_quantity"), avg("price_k"), avg("l_discount")).collect()(0)
      val m = Array(mr.getDouble(0), mr.getDouble(1), mr.getDouble(2))
      val res = EntropyBalance.entropyBalance(li, "feat", "w0", m,
        options = EbwOptions(optimalityTol = 1e-10))
      val w = res.weighted.agg(sum("w0"),
        sum(col("l_quantity") * col("weight_new")),
        sum(col("price_k") * col("weight_new")),
        sum(col("l_discount") * col("weight_new"))).collect()(0)
      import s.implicits._
      Seq(("m0_quantity", w.getDouble(1) / w.getDouble(0)),
        ("m1_price_k", w.getDouble(2) / w.getDouble(0)),
        ("m2_discount", w.getDouble(3) / w.getDouble(0)))
        .toDF("moment", "value")
        .select(col("moment"), round(col("value"), 5).as("value"))
        .orderBy("moment")
    }),
    "ann_topk" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val q = emb.filter(col("vec_id") === 0)
        .select(col("embedding").cast("array<double>")).collect()(0)
        .getSeq[Double](0)
      // order by the ROUNDED similarity + id so the top-10 cut is
      // deterministic and oracle-reproducible (TakeOrdered, no full sort)
      graft.functions.GraftFunctions.register(s)
      val v = col("embedding").cast("array<double>")
      emb.filter(col("vec_id") =!= 0)
        .select(col("vec_id"),
          round(Similarity.cosineNative(v, typedlit(q)), 5).as("cosine"))
        .orderBy(desc("cosine"), col("vec_id"))
        .limit(10)
    }),
    "q_mixture_sample" -> ((s, dir) => {
      // domain-mixture realization at max corpus usage: weights cycle 1..4
      // over the sources, so the heaviest-weighted present source pins
      // T = min(n/w) and quotas land on floor(w * T) — the md5 election
      // inside each source is the stratifiedExact rule
      val weights = (0 until 20).map(i => (s"src$i", 1.0 + i % 4)).toMap
      graft.ops.Sampling.mixtureSample(
          t(s, dir, "documents"), "source", "doc_id", weights)
        .select(col("source"), col("doc_id"))
        .orderBy("source", "doc_id")
    }),
    "dedup_components_elect" -> ((s, dir) => {
      // quality-aware survivor election over the chain islands: labels
      // arrive closed-form (as a persisted labeling would from parquet);
      // quality (doc_id*37)%100 permutes within each island so the winner
      // is neither the min id nor the max id, and unlabeled docs
      // (doc_id%20 > 7) must pass through untouched
      val docs = t(s, dir, "documents")
        .select(col("doc_id"), ((col("doc_id") * 37) % 100).as("quality"))
      val labels = docs.where(col("doc_id") % 20 <= 7)
        .select(col("doc_id").as("id"),
          (col("doc_id") - col("doc_id") % 20).as("component"))
      graft.ops.Dedup.electRepresentativesByLabels(
          docs, labels, "doc_id", "quality")
        .orderBy("doc_id")
    }),
    "q_shard_assign" -> ((s, dir) =>
      // deterministic training-order shuffle: shard + position are pure
      // functions of (seed, id), so the (shard, shard_pos) read order is
      // an engine-independent permutation of the corpus
      graft.ops.Sampling.assignShards(
          t(s, dir, "orders").select("o_orderkey"), "o_orderkey", nShards = 8)
        .select(col("shard"), col("shard_pos"), col("o_orderkey"))
        .orderBy("shard", "shard_pos")),
    "q_fuzzy_join" -> ((s, dir) =>
      // blocked fuzzy record linkage: TPC-H customer names differ only in
      // their numeric suffix, so nation-blocked pairs within 2 edits are a
      // dense, deterministic match set; the oracle verifies the length
      // prefilter and the thresholded DP kernel change nothing
      graft.ops.Linkage.fuzzySelfJoin(t(s, dir, "customer"),
          Seq("c_nationkey"), "c_name", "c_custkey", maxDist = 2,
          saltBuckets = 8)
        .select(col("id_a"), col("id_b"), col("c_nationkey"),
          col("dist").cast("long").as("dist"))
        .orderBy("id_a", "id_b")),
    "q_zorder" -> ((s, dir) =>
      // Morton interleave of two uncorrelated key projections — the sort
      // key behind clusterByZ's layout pass; the oracle recomputes the
      // bit arithmetic as plain integer shifts
      t(s, dir, "orders")
        .select(col("o_orderkey"),
          graft.ops.Layout.zValue(
            Seq(pmod(col("o_custkey"), lit(256L)),
              pmod(col("o_orderkey"), lit(256L))), 8).as("zval"))
        .orderBy("zval", "o_orderkey")),
    "q_hilbert" -> ((s, dir) =>
      // Hilbert sort key over the same two projections as q_zorder —
      // the adjacency-preserving curve clusterByHilbert lays files by;
      // the oracle replays the 8-level rotate/reflect fold as
      // MATERIALIZED CTE rounds (same linearization as the engine's
      // named-column fold)
      graft.ops.Layout.withHilbert(
          t(s, dir, "orders").select(col("o_orderkey"),
            pmod(col("o_custkey"), lit(256L)).as("_qx"),
            pmod(col("o_orderkey"), lit(256L)).as("_qy")),
          col("_qx"), col("_qy"), bits = 8)
        .select(col("o_orderkey"), col("hval"))
        .orderBy("hval", "o_orderkey")),
    "q_asof_forward" -> ((s, dir) => {
      // the mirror as-of direction: each click matched to the user's
      // EARLIEST at-or-after view (next-event semantics; same union-
      // window plan, forward frame, smallest-id ties)
      val ev = eventsTsUs(s, dir)
        .withColumn("ts", timestamp_micros(col("ts_us"))).drop("ts_us")
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("event_id"), col("user_id"), col("ts"))
      val views = ev.filter(col("event_type") === "view")
        .select(col("event_id"), col("user_id"), col("ts"), col("value"))
      graft.ops.AsOf.joinForward(clicks, views, "user_id", "ts", "ts",
          "event_id", Seq("value"))
        .select(col("event_id").as("click_id"), col("user_id"),
          col("asof_event_id").as("view_id"),
          round(col("asof_value"), 2).as("view_value"))
        .orderBy("click_id")
    }),
    "text_compress" -> ((s, dir) =>
      // compressibility quality signal over real JDK deflate — the
      // rows-only gate by declared design: no SQL engine replays
      // deflate, and a fake portable oracle would gate nothing
      graft.ops.TextMetrics.compressionRatio(t(s, dir, "documents"),
          "text", "doc_id")
        .orderBy("doc_id")),
    "q_ks_test" -> ((s, dir) => {
      // two-sample KS on the same en-vs-rest split as q_qq_compare:
      // D, where the curves pull apart, and the asymptotic 95% cut
      val d = t(s, dir, "documents")
      graft.ops.Profile.ksTest(
        d.filter(col("lang") === "en"),
        d.filter(col("lang") =!= "en"), "n_chars")
    }),
    "q_qq_compare" -> ((s, dir) => {
      // Q-Q deciles of doc length: en vs the rest — the drift view
      // that shows WHERE in the distribution a shift lives; two 1-row
      // percentile subtrees, no sample join
      val d = t(s, dir, "documents")
      graft.ops.Profile.qqCompare(
          d.filter(col("lang") === "en"),
          d.filter(col("lang") =!= "en"), "n_chars")
        .orderBy("p")
    }),
    "q_pareto_tail" -> ((s, dir) =>
      // Hill tail exponent of order totals above 300k: can this column
      // be averaged, or does it need medians? one scan aggregation
      graft.ops.Profile.hillTail(t(s, dir, "orders"), "o_totalprice",
        xmin = 300000.0)),
    "q_survival" -> ((s, dir) => {
      // Kaplan-Meier time-to-first-purchase by user cohort: users who
      // never purchase are CENSORED at their last observed event, not
      // dropped — per-cohort cumulative-product windows over the
      // distinct-day frame
      val ev = eventsTsUs(s, dir)
      val per = ev.groupBy("user_id").agg(
        min(col("ts_us")).as("_first"),
        max(col("ts_us")).as("_last"),
        min(when(col("event_type") === "purchase", col("ts_us")))
          .as("_fp"))
      val subjects = per.select(
        (col("user_id") % 3).as("cohort"),
        expr("(coalesce(_fp, _last) - _first) div 86400000000")
          .as("duration_days"),
        col("_fp").isNotNull.as("event"))
      graft.ops.Profile.kaplanMeier(subjects, "cohort", "duration_days",
          "event")
        .orderBy("cohort", "t")
    }),
    "q_chi_square" -> ((s, dir) =>
      // is language independent of source? chi-square + Cramér's V
      // from ONE joint aggregation, empty grid cells folded in via
      // the n - sum(e_observed) identity (the grid never materializes)
      graft.ops.Profile.chiSquare(t(s, dir, "documents"),
        "lang", "source")),
    "q_attribution" -> ((s, dir) => {
      // last-touch attribution: each purchase credits the user's most
      // recent view/click/signup within 2h — one user-keyed window,
      // unattributed conversions stay as NULL-channel rows
      val ev = eventsTsUs(s, dir)
      graft.ops.Behavior.lastTouchAttribution(ev, "user_id", "ts_us",
          "event_type", "event_id", conversionType = "purchase",
          channelTypes = Seq("view", "click", "signup"),
          lookbackMicros = 2L * 3600 * 1000000)
        .orderBy("event_id")
    }),
    "q_reconcile" -> ((s, dir) => {
      // bucket-checksum reconciliation: the b side drops every 97th
      // order and perturbs every 101st price — mismatched buckets
      // localize both corruptions in O(buckets) output
      val a = t(s, dir, "orders")
        .select("o_orderkey", "o_totalprice", "o_orderstatus")
      val b = a.filter(col("o_orderkey") % 97 =!= 0)
        .withColumn("o_totalprice",
          when(col("o_orderkey") % 101 === 0, col("o_totalprice") + 1)
            .otherwise(col("o_totalprice")))
      graft.ops.Validate.reconcile(a, b, "o_orderkey",
          Seq("o_orderkey", "o_totalprice", "o_orderstatus"),
          buckets = 32)
        .orderBy("bucket")
    }),
    "q_ab_welch" -> ((s, dir) =>
      // Welch two-sample t-test: does src1's doc length beat src8's
      // beyond sampling noise? one filtered scan aggregation
      graft.ops.Profile.welchTTest(t(s, dir, "documents"), "source",
        "n_chars", "src1", "src8")),
    "q_gains_table" -> ((s, dir) =>
      // decile gains/lift over the shared classifier-eval frame: bins
      // by EXACT percentile cuts (1-row subtree), never a corpus ntile
      graft.ops.Profile.gainsTable(classifierEvalFrame(s, dir),
          "score", "label")
        .orderBy("decile")),
    "q_corr_matrix" -> ((s, dir) =>
      // pairwise Pearson over the lineitem numeric block in ONE scan —
      // guarded moments per pair (the acf rule), k scales expression
      // count, never passes
      graft.ops.Profile.corrMatrix(t(s, dir, "lineitem"),
          Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax"))
        .orderBy("col_a", "col_b")),
    "text_rake" -> ((s, dir) =>
      // RAKE key phrases per doc ('the'/'a' delimit candidates in the
      // synthetic vocabulary): per-row segmentation fold, doc-keyed
      // freq/degree scoring, WindowGroupLimit top-3
      graft.ops.TextMetrics.rakeKeywords(t(s, dir, "documents"), "text",
          "doc_id", stopwords = Seq("the", "a"), k = 3)
        .orderBy("doc_id", "rank")),
    "q_bootstrap_ci" -> ((s, dir) =>
      // per-source mean doc length with Poisson-bootstrap 95% CI —
      // the distributed bootstrap (each row draws its own multiplicity
      // from the md5-uniform ladder; no global-n coordination)
      graft.ops.Profile.bootstrapCI(t(s, dir, "documents"), "source",
          "doc_id", "n_chars", b = 32)
        .orderBy("source")),
    "q_dedup_stats" -> ((s, dir) =>
      // one-row dedup run report over exact-hash clusters: corpus
      // size, duplicate fraction, largest cluster — the dashboard
      // number a silent 40%-drop pipeline owes its operators
      graft.ops.Dedup.clusterStats(
        t(s, dir, "documents").select(col("doc_id"),
          md5(col("text")).as("cluster")),
        "doc_id", "cluster")),
    "q_weight_diag" -> ((s, dir) =>
      // survey-weight diagnostics per order priority (weights scaled
      // 1e-5 so 4dp-rounded sums are parallel-sum-proof): Kish ESS,
      // design effect, weight CV, extremes — one keyed aggregation
      graft.ops.Profile.weightDiagnostics(
          t(s, dir, "orders").select(col("o_orderpriority"),
            (col("o_totalprice") / lit(100000.0)).as("w")),
          "o_orderpriority", "w")
        .orderBy("o_orderpriority")),
    "q_max_concurrent" -> ((s, dir) => {
      // peak concurrency per event type over [ts, ts + value) windows:
      // boundary sweep with ends-before-starts at the same instant,
      // one keyed running-sum window + key-level argmax
      val ev = eventsTsUs(s, dir)
      val iv = ev.select(col("event_type"), col("ts_us").as("s"),
        (col("ts_us") + floor(col("value") * 1e6).cast("long")).as("e"))
      graft.ops.Interval.maxConcurrent(iv, "event_type", "s", "e")
        .orderBy("event_type")
    }),
    "ann_centroid_sim" -> ((s, dir) =>
      // domain-similarity map: pairwise cosine between label centroids
      // — the labels-sized self-join, never the corpus
      graft.ops.Similarity.centroidSimMatrix(t(s, dir, "embeddings"),
          "embedding", "label")
        .orderBy("label_a", "label_b")),
    "q_approx_quantiles" -> ((s, dir) =>
      // the sketch path the winsorize/quantile docs promise as the
      // beyond-sort swap, gated honestly: approx_percentile in its
      // exact regime (n <= accuracy) must equal DuckDB quantile_disc —
      // at 100 TB the same code runs with bounded accuracy and the
      // documented rank-error envelope
      t(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(expr("approx_percentile(l_extendedprice, " +
          "array(0.25D, 0.5D, 0.75D, 0.9D), 1000000)").as("_q"))
        .select(col("l_returnflag"),
          col("_q")(0).as("p25"), col("_q")(1).as("p50"),
          col("_q")(2).as("p75"), col("_q")(3).as("p90"))
        .orderBy("l_returnflag")),
    "q_zone_map" -> ((s, dir) => {
      // zone-map pruning report over the q_zorder layout: 16 equal-
      // width z-value files, per-file min/max zones on the y dimension,
      // and the skip verdict for a y <= 15 reader — the measured
      // pruning rate the layout specs only assert qualitatively
      val o = t(s, dir, "orders").select(
        pmod(col("o_custkey"), lit(256L)).cast("double").as("cx"),
        pmod(col("o_orderkey"), lit(256L)).cast("double").as("cy"))
      graft.ops.Layout.zoneMapReport(o,
          Seq(("cx", 0.0, 256.0), ("cy", 0.0, 256.0)), bits = 8,
          numFiles = 16, auditCol = "cx", predLo = 0.0, predHi = 15.0)
        .orderBy("file_id")
    }),
    "q_stats_drift" -> ((s, dir) => {
      // column-stats drift between corpus versions: the new side drops
      // every 10th doc, nulls lang on 7-multiples, and shifts n_chars
      // by +37 — null_frac, distinct, and mean deltas all genuinely
      // move; one unpivot scan per side, k-row join
      val d = t(s, dir, "documents")
      val oldV = d.select(col("doc_id"), col("lang"), col("n_chars"),
        col("source"))
      val newV = d.filter(col("doc_id") % 10 =!= 0).select(col("doc_id"),
        when(col("doc_id") % 7 === 0, lit(null).cast("string"))
          .otherwise(col("lang")).as("lang"),
        (col("n_chars") + lit(37L)).as("n_chars"), col("source"))
      graft.ops.Profile.statsDrift(oldV, newV,
          Seq("doc_id", "lang", "n_chars", "source"))
        .orderBy("col_name")
    }),
    "q_lsh_tune" -> ((s, dir) =>
      // banding-parameter tuner for a 128-hash signature at threshold
      // 0.8: per divisor split, integrated FP/FN area of the S-curve,
      // rank 1 = the split minhashCandidatePairs should run with.
      // Data-independent arithmetic — the only gate query that reads
      // no table, because the operator's input IS the parameter space
      graft.ops.Dedup.lshTune(s, signatureLen = 128, threshold = 0.8)
        .orderBy("rank")),
    "dedup_golden" -> ((s, dir) => {
      // survivorship AFTER clustering: per synthetic 50-doc cluster,
      // most-frequent non-NULL value per field (ties by value) — lang
      // carries planted NULLs so the non-NULL rule genuinely fires
      val d = t(s, dir, "documents").select(
        (col("doc_id") % 50).as("cluster"),
        when(col("doc_id") % 7 === 0, lit(null).cast("string"))
          .otherwise(col("lang")).as("lang"),
        col("source"))
      graft.ops.Dedup.goldenRecord(d, "cluster", Seq("lang", "source"))
        .orderBy("cluster")
    }),
    "q_impute" -> ((s, dir) => {
      // per-type median imputation of planted gaps, provenance kept;
      // two exact percentile aggs joined back group-keyed
      val ev = t(s, dir, "events").select(col("event_id"),
        col("event_type"),
        when(col("event_id") % 7 === 0, lit(null).cast("double"))
          .otherwise(col("value")).as("value"))
      graft.ops.Profile.imputeMedian(ev, "event_type", "value")
        .orderBy("event_id")
    }),
    "q_pop" -> ((s, dir) => {
      // period-over-period revenue report: daily totals with 1-period
      // and 7-period percent changes (lag windows over the day-keyed
      // rollup — n_days rows, not order rows)
      import org.apache.spark.sql.expressions.Window
      val daily = t(s, dir, "orders")
        .groupBy(expr(
          "unix_micros(cast(o_orderdate as timestamp)) div 86400000000")
          .as("day"))
        .agg(round(sum("o_totalprice"), 4).as("revenue"))
      val w = Window.orderBy("day")
      daily
        .withColumn("pct_1d", round((col("revenue") - lag("revenue", 1).over(w))
          / lag("revenue", 1).over(w), 6))
        .withColumn("pct_7d", round((col("revenue") - lag("revenue", 7).over(w))
          / lag("revenue", 7).over(w), 6))
        .orderBy("day")
    }),
    "dedup_containment" -> ((s, dir) =>
      // asymmetric quote/subsumption pairs: |A∩B|/min(|A|,|B|) over
      // 3-gram shingles, candidates from the rare-shingle inverted
      // index (df <= 100), exact intersection over ALL shingles
      graft.ops.Dedup.containmentPairs(t(s, dir, "documents"), "text",
          "doc_id", minContainment = 0.8, maxShingleDf = 100)
        .orderBy("id_a", "id_b")),
    "q_adoption" -> ((s, dir) => {
      // adoption curve per event type: daily events/actives/new users +
      // cumulative uniques WITHOUT a cumulative distinct (first-day
      // marking + per-group running sum)
      val ev = eventsTsUs(s, dir)
        .withColumn("day", expr("ts_us div 86400000000"))
      graft.ops.Behavior.adoption(ev, "event_type", "user_id", "day")
        .orderBy("event_type", "day")
    }),
    "q_rfm" -> ((s, dir) =>
      // RFM quintile segmentation of customers from their orders:
      // key-level ntile windows (n_keys rows, the concentration
      // contract), ties broken by the key on both engines
      graft.ops.Behavior.rfm(
          t(s, dir, "orders").withColumn("o_ts",
            expr("unix_micros(cast(o_orderdate as timestamp)) div 1000000")),
          "o_custkey", "o_ts", "o_totalprice")
        .orderBy("o_custkey")),
    "q_geo_join" -> ((s, dir) => {
      // spatial within-150km join on deterministic key-derived
      // coordinates (lat in [-60,60), lon in [-180,180)): 3-degree
      // cells, left side exploded to its 3x3 neighborhood, equi-join on
      // the cell key — the oracle brute-forces the cross join, proving
      // the blocking lossless at gate scale
      val cust = t(s, dir, "customer").select(col("c_custkey"),
        (pmod(col("c_custkey") * 37, lit(1200)) / 10.0 - 60.0).as("lat"),
        (pmod(col("c_custkey") * 73, lit(3600)) / 10.0 - 180.0).as("lon"))
      val supp = t(s, dir, "supplier").select(col("s_suppkey"),
        (pmod(col("s_suppkey") * 41, lit(1200)) / 10.0 - 60.0).as("lat"),
        (pmod(col("s_suppkey") * 97, lit(3600)) / 10.0 - 180.0).as("lon"))
      graft.ops.Geo.withinDistanceJoin(
          supp, "s_suppkey", "lat", "lon",
          cust, "c_custkey", "lat", "lon",
          maxKm = 150.0, cellDeg = 3.0, maxAbsLat = 60.0)
        .orderBy("s_suppkey", "c_custkey")
    }),
    "ann_mmr" -> ((s, dir) => {
      // MMR diversity re-rank of the brute-force top-20 shortlist
      // (k=5, lambda=0.7): the dedup pass between retrieval and a
      // context window; greedy picks argmax'd on 6dp-rounded scores so
      // the oracle's unrolled 5-round replay selects identically
      val emb = t(s, dir, "embeddings")
      val q = emb.filter(col("vec_id") === 0)
        .select(col("embedding").cast("array<double>")).collect()(0)
        .getSeq[Double](0)
      graft.functions.GraftFunctions.register(s)
      val v = col("embedding").cast("array<double>")
      val shortlist = emb.filter(col("vec_id") =!= 0)
        .select(col("vec_id"), col("embedding"),
          round(graft.ops.Similarity.cosineNative(v, typedlit(q)), 5)
            .as("rel"))
        .orderBy(desc("rel"), col("vec_id")).limit(20)
      graft.ops.Similarity.mmrRerank(shortlist, "vec_id", "embedding",
          "rel", k = 5, lambda = 0.7)
        .orderBy("rank")
    }),
    "ann_ivf_append" -> ((s, dir) => {
      // the append-only cell-index path: cells fit ONCE on the even
      // half (deterministic Lloyd, k=8, 2 passes), the odd half then
      // indexes against the PERSISTED centroids without refit — one
      // zero-shuffle literal-argmin scan per crawl batch
      val emb = t(s, dir, "embeddings")
      val cents = graft.ops.Similarity.kmeansCentroids(
        emb.filter(col("vec_id") % 2 === 0), "embedding", "vec_id",
        k = 8, iters = 2)
      graft.ops.Similarity.assignToCentroids(
          emb.filter(col("vec_id") % 2 === 1), "embedding", "vec_id", cents)
        .orderBy("vec_id")
    }),
    "ann_int8" -> ((s, dir) =>
      // symmetric int8 embedding quantization: scale, codes (rendered
      // to one string — the harness hashes scalars), reconstruction
      // mse; one narrow projection, the 4x-memory rerank-copy path
      graft.ops.Similarity.quantizeInt8(t(s, dir, "embeddings"),
          "embedding", "vec_id")
        .orderBy("vec_id")),
    "text_bpe_train" -> ((s, dir) => {
      // distributed BPE training over the corpus: the learned merge table
      // itself is the result (rank-ordered). The oracle unrolls the 12
      // merge rounds as CTEs over the same double-spaced word dictionary
      // — same pair count, (n desc, l, r) tie-break, min-count-2 stop,
      // and leftmost-non-overlapping string replace per round
      val merges = graft.ops.TextMetrics.trainBpe(
        t(s, dir, "documents"), "text", numMerges = 12)
      import s.implicits._
      merges.zipWithIndex
        .map { case ((a, b), i) => (i + 1L, a, b) }
        .toDF("rank", "left", "right")
        .orderBy("rank")
    }),
    "ann_pq" -> ((s, dir) => {
      // product-quantization ANN: 8 subspaces x 16 centroids compress each
      // 64-float vector to 8 codes (32x), then ADC top-10 for query vec 0
      // is pure table lookups — the memory-bound corpus path
      val emb = t(s, dir, "embeddings")
      val cb = graft.ops.Similarity.pqTrain(emb, "embedding", "vec_id",
        dim = 64, subspaces = 8, k = 16, iters = 2)
      val q = emb.filter(col("vec_id") === 0)
        .select(col("embedding").cast("array<double>")).collect()(0)
        .getSeq[Double](0)
      val codes = graft.ops.Similarity.pqEncode(
        emb.filter(col("vec_id") =!= 0), "embedding", "vec_id", 64, cb)
      graft.ops.Similarity.pqTopK(codes, "vec_id", cb, q, 10)
        .orderBy("adist", "vec_id")
    }),
    "ann_pq_rerank" -> ((s, dir) => {
      // the production two-stage PQ search: ADC shortlist of 100 from the
      // codes, exact L2 rerank on just those rows — quantization costs
      // shortlist membership, never final precision
      val emb = t(s, dir, "embeddings")
      val cb = graft.ops.Similarity.pqTrain(emb, "embedding", "vec_id",
        dim = 64, subspaces = 8, k = 16, iters = 2)
      val q = emb.filter(col("vec_id") === 0)
        .select(col("embedding").cast("array<double>")).collect()(0)
        .getSeq[Double](0)
      val corpus = emb.filter(col("vec_id") =!= 0)
      val codes = graft.ops.Similarity.pqEncode(
        corpus, "embedding", "vec_id", 64, cb)
      graft.ops.Similarity.pqTopKRerank(codes, corpus, "embedding", "vec_id",
          cb, q, topK = 10, shortlist = 100)
        .orderBy("dist", "vec_id")
    }),
    "graph_pagerank" -> ((s, dir) => {
      // host-level PageRank shape on a deterministic 997-node multigraph
      // derived from orders keys; 5 damped power iterations with
      // dangling-mass redistribution, exactly replayed by unrolled CTEs
      val e = t(s, dir, "orders").select(
        (col("o_custkey") % 997).as("src"), (col("o_orderkey") % 997).as("dst"))
      graft.ops.Graph.pageRank(e, "src", "dst", iters = 5)
        .orderBy("node")
    }),
    "dedup_semantic" -> ((s, dir) => {
      // SemDeDup: deterministic k-means cells (k=8, 2 Lloyd rounds,
      // first-k seeding) then within-cell cosine pairs at the SEMANTIC
      // threshold (0.35 — far below the near-copy LSH gate's range)
      graft.ops.Dedup.semanticPairs(t(s, dir, "embeddings"),
          "embedding", "vec_id", k = 8, iters = 2, minCosine = 0.35)
        .select(col("cluster").cast("long").as("cluster"),
          col("id_a"), col("id_b"), col("cosine"))
        .orderBy("cluster", "id_a", "id_b")
    }),
    "text_bigram_lm" -> ((s, dir) => {
      // order-1 stupid-backoff LM score: the model is the even-doc_id half
      // of the corpus, so scoring the full corpus genuinely exercises the
      // bigram hit, unigram backoff, and OOV floor branches
      val d = t(s, dir, "documents")
      graft.ops.TextMetrics.bigramLogProb(d, "text", "doc_id",
          model = d.filter(col("doc_id") % 2 === 0))
        .orderBy("doc_id")
    }),
    "text_trigram_lm" -> ((s, dir) => {
      // order-2 stupid-backoff rung: same even-half model as the bigram
      // gate, so trigram hits, both backoff rungs, and the OOV floor
      // all genuinely fire on the odd half
      val d = t(s, dir, "documents")
      graft.ops.TextMetrics.trigramLogProb(d, "text", "doc_id",
          model = d.filter(col("doc_id") % 2 === 0))
        .orderBy("doc_id")
    }),
    "text_collocations" -> ((s, dir) =>
      // PMI bigram collocations with the Church–Hanks hapax guard:
      // zip-shift bigrams (zero-shuffle sequencing), AQE-decided
      // unigram joins, TakeOrdered top-k on 4dp-rounded PMI
      graft.ops.TextMetrics.collocations(t(s, dir, "documents"), "text",
        minCount = 5L, topK = 50)),
    "text_zipf" -> ((s, dir) =>
      // Zipf rank-frequency OLS over the top-500 terms: the corpus-
      // health number (natural text ~ slope -1); ranked pass over the
      // vocabulary, fit via the shared regr_* moment definitions
      graft.ops.TextMetrics.zipfFit(t(s, dir, "documents"), "text",
        topN = 500)),
    "text_readability" -> ((s, dir) =>
      // Flesch reading ease with the public vowel-group syllable proxy;
      // one narrow regexp projection, no shuffle
      graft.ops.TextMetrics.readability(t(s, dir, "documents"), "text",
          "doc_id")
        .orderBy("doc_id")),
    "text_script" -> ((s, dir) =>
      // character-class profile of the JSON props column — the field
      // where letters, digits, punctuation and whitespace all carry
      // real mass (documents.text is letters-only by construction)
      graft.ops.TextMetrics.scriptProfile(t(s, dir, "events"), "props",
          "event_id")
        .orderBy("event_id")),
    "text_length_buckets" -> ((s, dir) =>
      // padded-batching policy input: power-of-two length ladder capped
      // at 256, per-rung padding waste — the report that says where to
      // add rungs or switch to packing
      graft.ops.TextMetrics.lengthBucketPlan(t(s, dir, "documents"),
          "text", maxSeqLen = 256)
        .orderBy("bucket_len")),
    "text_char_entropy" -> ((s, dir) =>
      // per-document character entropy + alphabet-normalized form;
      // (id, char) counts map-side combined, one id rollup
      graft.ops.TextMetrics.charEntropy(t(s, dir, "documents"), "text",
          "doc_id")
        .orderBy("doc_id")),
    "text_chunk_bpe" -> ((s, dir) =>
      // BPE-budgeted context-window chunking: budget 64 gives several
      // chunks per document at this doc length; words never split, the
      // crossing word overflows its chunk (the packBins rule)
      graft.ops.TextMetrics.chunkByBudget(
          t(s, dir, "documents"), "text", "doc_id", budget = 64)
        .orderBy("doc_id", "chunk_id")),
    "text_langid_model" -> ((s, dir) => {
      // trigram-model langid gate: each doc's text becomes the HELD-OUT
      // sentence for its lang column (disjoint from the training seeds),
      // so green requires cross-sentence generalization — the scorer
      // never sees the lang column itself
      val d = t(s, dir, "documents").select("doc_id", "lang")
      val textExpr = TextMetrics.langIdHeldOut
        .foldLeft(when(lit(false), lit("")): Column) {
          case (acc, (l, sent)) => acc.when(col("lang") === l, lit(sent))
        }.otherwise(lit(""))
      TextMetrics.langIdModel(
          d.select(col("doc_id"), textExpr.as("text")), "text", "doc_id")
        .orderBy("doc_id")
    }),
    "text_quality_model" -> ((s, dir) => {
      // fastText-style learned quality score: train LR-over-hashed-TF on
      // the even-doc_id half with weak labels (lang == 'en' stands in for
      // "reference-like"), score the held-out odd half. Training floats
      // are aggregation-order-dependent → rows-only gate; the spec
      // asserts separation and held-out accuracy
      val d = t(s, dir, "documents")
      val weak = d.withColumn("lbl", (col("lang") === "en").cast("double"))
      val m = graft.ops.QualityClassifier.train(
        weak.filter(col("doc_id") % 2 === 0), "text", "lbl",
        buckets = 1 << 16, maxIter = 20)
      graft.ops.QualityClassifier.score(m,
          d.filter(col("doc_id") % 2 === 1), "text", "doc_id")
        .orderBy("doc_id")
    }),
    "text_ccnet_buckets" -> ((s, dir) => {
      // CCNet head/middle/tail partition: per-language ntile over the
      // stupid-backoff LM score (model = the even-doc_id half, so all
      // three scoring branches fire); doc_id breaks every ntile tie so
      // both engines rank identically
      val d = t(s, dir, "documents")
      graft.ops.TextMetrics.ccnetBuckets(d, "text", "doc_id", "lang",
          model = d.filter(col("doc_id") % 2 === 0))
        .orderBy("doc_id")
    }),
    "text_dsir" -> ((s, dir) => {
      // DSIR data selection: score every document's resemblance to the
      // English-language target slice via hashed-unigram importance
      // weights; 256 buckets keeps the oracle's ratio table small while
      // exercising real hash collisions
      val d = t(s, dir, "documents")
      graft.ops.TextMetrics.dsirWeights(d,
          d.filter(col("lang") === "en"), "text", "doc_id", buckets = 256)
        .orderBy("doc_id")
    }),
    "text_quality_score" -> ((s, dir) => {
      // portable linear quality scoring under a FIXED literal model:
      // training floats are order-dependent (text_quality_model stays
      // rows-only for that reason), but scoring is pure arithmetic —
      // md5-bucket hashed TF · weights + sigmoid — so a deterministic
      // coefficient table w(b) = (b mod 7 − 3)/10 over 64 buckets makes
      // the whole deployment path hash-gateable in DuckDB
      val coeffs = s.range(64).select(col("id").as("b"),
        (((col("id") % 7) - 3) / lit(10.0)).as("w"))
      graft.ops.QualityClassifier.scoreLinear(
          t(s, dir, "documents"), coeffs, intercept = -0.5,
          buckets = 64, "text", "doc_id")
        .orderBy("doc_id")
    }),
    "q_corpus_diff" -> ((s, dir) => {
      // dataset-versioning diff: the new snapshot is a deterministic
      // mutation of the old (drops, edits, additions constructed from the
      // same expressions in both engines), so every status is exercised
      val d = t(s, dir, "documents")
      val oldv = d.select(col("doc_id"), col("text"))
      val newv = d.filter(col("doc_id") % 10 =!= 0)
        .select(col("doc_id"),
          when(col("doc_id") % 7 === 0, concat(col("text"), lit(" v2")))
            .otherwise(col("text")).as("text"))
        .unionByName(d.filter(col("doc_id") % 5 === 0)
          .select((col("doc_id") + 100000).as("doc_id"),
            concat(lit("new doc "), col("doc_id").cast("string")).as("text")))
      graft.ops.Snapshot.diff(oldv, newv, "doc_id", Seq("text"))
        .select(col("doc_id"), col("status"))
        .orderBy("doc_id")
    }),
    "q_weighted_sample" -> ((s, dir) =>
      // Efraimidis-Spirakis weighted sampling: 20 docs per language,
      // inclusion biased by document length (n_chars as the weight) —
      // exact-size, hash-deterministic, replayed key-for-key by the
      // oracle's identical ln(u)/w arithmetic
      graft.ops.Sampling.weightedSample(
          t(s, dir, "documents").select("doc_id", "lang", "n_chars"),
          "lang", "doc_id", "n_chars", n = 20)
        .orderBy("lang", "doc_id")),
    "q_corpus_upsert" -> ((s, dir) => {
      // the versioning roundtrip law as a gate: reconstruct the new
      // snapshot from old + diff + changes through the engine's
      // diff→apply path; the oracle computes the new snapshot DIRECTLY,
      // so a hash match proves applyChanges(old, diff(old,new), new)==new
      val d = t(s, dir, "documents")
      val oldv = d.select(col("doc_id"), col("text"))
      val newv = d.filter(col("doc_id") % 10 =!= 0)
        .select(col("doc_id"),
          when(col("doc_id") % 7 === 0, concat(col("text"), lit(" v2")))
            .otherwise(col("text")).as("text"))
        .unionByName(d.filter(col("doc_id") % 5 === 0)
          .select((col("doc_id") + 100000).as("doc_id"),
            concat(lit("new doc "), col("doc_id").cast("string")).as("text")))
      val df = graft.ops.Snapshot.diff(oldv, newv, "doc_id", Seq("text"))
      graft.ops.Snapshot.applyChanges(oldv, df, newv, "doc_id")
        .orderBy("doc_id")
    }),
    "q_interval_point" -> ((s, dir) => {
      // point-in-interval join: signup events open a value-seconds service
      // window, purchases landing inside any window are matched. Bucketed
      // equi-join (no nested loop); the oracle is DuckDB's native range
      // join over the identical micros arithmetic
      val ev = eventsTsUs(s, dir)
      val iv = ev.filter(col("event_type") === "signup")
        .select(col("event_id").as("i_id"), col("ts_us").as("i_start"),
          (col("ts_us") + floor(col("value") * 1e6).cast("long")).as("i_end"))
      val pt = ev.filter(col("event_type") === "purchase")
        .select(col("event_id").as("p_id"), col("ts_us").as("p_ts"))
      graft.ops.Interval.pointInInterval(iv, pt, "i_start", "i_end", "p_ts",
          bucketWidth = 600L * 1000 * 1000)
        .select(col("i_id"), col("p_id"),
          (col("p_ts") - col("i_start")).as("offset_us"))
        .orderBy("i_id", "p_id")
    }),
    "q_interval_overlap" -> ((s, dir) => {
      // interval-overlap join: signup windows vs error windows that share
      // any instant, with the shared-segment length; each qualifying pair
      // forms exactly once (overlap-start bucket rule), no distinct pass
      val ev = eventsTsUs(s, dir)
      def win(kind: String, p: String) = ev.filter(col("event_type") === kind)
        .select(col("event_id").as(s"${p}_id"), col("ts_us").as(s"${p}_s"),
          (col("ts_us") + floor(col("value") * 1e6).cast("long")).as(s"${p}_e"))
      graft.ops.Interval.overlapJoin(win("signup", "a"), win("error", "b"),
          "a_s", "a_e", "b_s", "b_e", bucketWidth = 600L * 1000 * 1000)
        .select(col("a_id"), col("b_id"), col("overlap").as("overlap_us"))
        .orderBy("a_id", "b_id")
    }),
    "q_resample_fill" -> ((s, dir) => {
      // time-series downsample to an hourly grid per user with gap rows
      // materialized and forward-filled — the tick→bar construction; gaps
      // dominate (sparse per-user activity over the corpus span)
      val ev = eventsTsUs(s, dir)
      graft.ops.Interval.resampleFill(ev, "user_id", "ts_us", "value",
          widthMicros = 3600L * 1000 * 1000)
        .orderBy("user_id", "bucket")
    }),
    "q_funnel" -> ((s, dir) => {
      // view→click→purchase conversion within 24h of funnel entry, greedy
      // earliest-entry matching; the oracle derives the same counts via
      // the INDEPENDENT sequential-min formulation (cross-derivation)
      val ev = eventsTsUs(s, dir)
      graft.ops.Behavior.funnel(ev, "user_id", "ts_us", "event_type",
          Seq("view", "click", "purchase"), windowMicros = 86400L * 1000 * 1000)
        .orderBy("step")
    }),
    "q_cohort_retention" -> ((s, dir) => {
      // weekly cohorts by first event, activity per week offset; absent
      // (cohort, offset) rows mean zero active — not gap-filled
      val ev = eventsTsUs(s, dir)
      graft.ops.Behavior.cohortRetention(ev, "user_id", "ts_us",
          widthMicros = 7L * 86400 * 1000 * 1000)
        .orderBy("cohort", "offset")
    }),
    "q_cooccur" -> ((s, dir) => {
      // brands bought together within an order: the association-mining
      // support count; pair forms once by construction (item_a < item_b)
      val bi = t(s, dir, "lineitem").select(col("l_orderkey"), col("l_partkey"))
        .join(t(s, dir, "part").select(col("p_partkey"), col("p_brand")),
          col("l_partkey") === col("p_partkey"))
      graft.ops.Profile.coOccurrence(bi, "l_orderkey", "p_brand",
          minSupport = 40L)
        .orderBy("item_a", "item_b")
    }),
    "q_assoc_rules" -> ((s, dir) => {
      // directed brand rules with confidence and lift over the same
      // baskets; N enters as a 1-row aggregate subtree, never an action
      val bi = t(s, dir, "lineitem").select(col("l_orderkey"), col("l_partkey"))
        .join(t(s, dir, "part").select(col("p_partkey"), col("p_brand")),
          col("l_partkey") === col("p_partkey"))
      graft.ops.Profile.associationRules(bi, "l_orderkey", "p_brand",
          minSupport = 40L)
        .orderBy("antecedent", "consequent")
    }),
    "q_transitions" -> ((s, dir) => {
      // per-user first-order event transition matrix, (ts, type) ordered
      val ev = eventsTsUs(s, dir)
      graft.ops.Profile.transitionMatrix(ev, "user_id", "ts_us", "event_type")
        .orderBy("from_state", "to_state")
    }),
    "graph_triangles" -> ((s, dir) => {
      // triangle counts + clustering coefficient on the same 997-node
      // multigraph as graph_pagerank; engine runs the degree-ordered
      // orientation, the oracle the independent a<b<c triple join
      val e = t(s, dir, "orders").select(
        (col("o_custkey") % 997).as("src"), (col("o_orderkey") % 997).as("dst"))
      graft.ops.Graph.triangleCounts(e, "src", "dst")
        .orderBy("node")
    }),
    "text_bm25" -> ((s, dir) => {
      // lexical BM25 top-20 for a 3-term query (one rare discriminative
      // term); contributions add in query order — the oracle replays the
      // identical fold as explicit left-to-right arithmetic
      graft.ops.TextMetrics.bm25Scores(t(s, dir, "documents"), "text",
          "doc_id", Seq("query", "dup", "spark"))
        .orderBy(desc("bm25"), col("doc_id")).limit(20)
    }),
    "text_inverted_index" -> ((s, dir) => {
      // the retrieval-side artifact: per-term df/cf + doc-ordered
      // "doc:tf" postings rendered AFTER the struct sort. Postings are
      // flattened to ONE comma-joined string for the gate: the driver
      // harness hashes scalar columns only (a LIST column crashes its
      // pandas sort), and the flattening loses nothing — element order
      // is already deterministic doc order on both engines.
      graft.ops.TextMetrics.invertedIndex(t(s, dir, "documents"), "text",
          "doc_id")
        .withColumn("postings", array_join(col("postings"), ","))
        .orderBy("term")
    }),
    "q_rrf_fuse" -> ((s, dir) => {
      // hybrid-retrieval fusion: BM25 shortlist ⊕ length-ranked
      // shortlist via reciprocal-rank fusion; the rank windows run on
      // 50-row LIMITed frames (tiny by construction, not a global sort)
      import org.apache.spark.sql.expressions.Window
      val d = t(s, dir, "documents")
      val bm = graft.ops.TextMetrics.bm25Scores(d, "text", "doc_id",
          Seq("query", "dup", "spark"))
        .orderBy(desc("bm25"), col("doc_id")).limit(50)
        .withColumn("rank", row_number()
          .over(Window.orderBy(desc("bm25"), col("doc_id"))).cast("long"))
      val ln = d.select(col("doc_id"), length(col("text")).as("len"))
        .orderBy(desc("len"), col("doc_id")).limit(50)
        .withColumn("rank", row_number()
          .over(Window.orderBy(desc("len"), col("doc_id"))).cast("long"))
      graft.ops.Similarity.rrfFuse(bm, ln, "doc_id")
        .orderBy(desc("rrf"), col("doc_id"))
    }),
    "q_scd2" -> ((s, dir) => {
      // SCD Type 2 history of each user's event-type state: consecutive
      // identical states suppressed, [from, to) validity bounds, NULL
      // `to` on the current version; event_id breaks equal-ts ties
      val ev = eventsTsUs(s, dir)
      graft.ops.Snapshot.scd2(ev, "user_id", "ts_us", Seq("event_type"),
          tieCols = Seq("event_id"))
        .select(col("user_id"), col("event_type"), col("effective_from"),
          col("effective_to"), col("version"), col("is_current"))
        .orderBy("user_id", "version")
    }),
    "q_scd2_asof" -> ((s, dir) => {
      // point-in-time lookup over the same history: each user's state
      // mid-corpus (2024-01-16) — one valid version per user active then
      val ev = eventsTsUs(s, dir)
      val hist = graft.ops.Snapshot.scd2(ev, "user_id", "ts_us",
        Seq("event_type"), tieCols = Seq("event_id"))
      graft.ops.Snapshot.asOf(hist, lit(1705363200000000L))
        .select(col("user_id"), col("event_type"), col("effective_from"),
          col("effective_to"), col("version"))
        .orderBy("user_id")
    }),
    "q_islands" -> ((s, dir) => {
      // gaps-and-islands: merge each event type's value-minute activity
      // windows into maximal disjoint spans (the outage/coverage merge);
      // one keyed Exchange, islands build inside their key's partition
      val ev = eventsTsUs(s, dir)
      val iv = ev.select(col("event_type"), col("ts_us").as("s_us"),
        (col("ts_us") + floor(col("value") * 60e6).cast("long")).as("e_us"))
      graft.ops.Interval.coalesceIntervals(iv, "event_type", "s_us", "e_us")
        .orderBy("event_type", "island_start")
    }),
    "q_validate" -> ((s, dir) => {
      // data-quality expectation suite as one audit frame: 4 row rules
      // in ONE scan aggregation, two key-uniqueness checks, two FK
      // checks; rules chosen so both verdicts appear (qty/discount and
      // the orders-per-customer "unique" check genuinely fail)
      import graft.ops.Validate
      val li = t(s, dir, "lineitem"); val ord = t(s, dir, "orders")
      Validate.report(
        Validate.rowRules(li, Seq(
          "li_qty_le_45" -> (col("l_quantity") > 45),
          "li_price_positive" -> (col("l_extendedprice") <= 0),
          "li_discount_cap" -> (col("l_discount") > 0.08),
          "li_shipdate_present" -> col("l_shipdate").isNull)),
        Validate.uniqueKey(li, Seq("l_orderkey", "l_linenumber"),
          "li_pk_unique"),
        Validate.uniqueKey(ord, Seq("o_custkey"), "orders_custkey_unique"),
        Validate.foreignKey(li, "l_orderkey", ord, "o_orderkey",
          "li_fk_orders"),
        Validate.foreignKey(ord, "o_custkey", t(s, dir, "customer"),
          "c_custkey", "orders_fk_customer"))
        .orderBy("rule")
    }),
    "q_histogram" -> ((s, dir) => {
      // 20-bin fixed-width price histogram per return flag, empty bins
      // materialized; two keyed aggs + a G·bins grid, nothing global
      graft.ops.Profile.histogram(t(s, dir, "lineitem"), "l_extendedprice",
          20, Seq("l_returnflag"))
        .orderBy("l_returnflag", "bucket")
    }),
    "q_outliers_mad" -> ((s, dir) => {
      // robust median/MAD length outliers per source (Iglewicz–Hoaglin
      // modified z-score 0.6745·|x−med|/MAD > 2.5) — the heavy-tail-
      // immune curation cut; two exact keyed percentile aggs, stats
      // joined back group-keyed
      graft.ops.Profile.robustOutliers(t(s, dir, "documents"), "source",
          "doc_id", "n_chars", k = 2.5)
        .orderBy("source", "doc_id")
    }),
    "text_distinctive" -> ((s, dir) => {
      // per-source distinctive vocabulary: Monroe et al. log-odds with
      // the corpus as Dirichlet prior, variance-normalized, top-5 per
      // source — one explode+count shuffle, vocab joins AQE-decided
      graft.ops.TextMetrics.distinctiveTerms(t(s, dir, "documents"),
          "text", "source", k = 5, minCount = 5L)
        .orderBy("source", "rank")
    }),
    "ann_centroid_outliers" -> ((s, dir) => {
      // least-central members per embedding label (cosine to own-label
      // centroid, bottom-10) — the label-noise/off-topic detector;
      // centroids are labels×dim rows, joined back broadcast-sized
      graft.ops.Similarity.centroidOutliers(t(s, dir, "embeddings"),
          "vec_id", "embedding", "label", bottomK = 10)
        .orderBy("label", "rank")
    }),
    "q_hopping" -> ((s, dir) => {
      // hopping (sliding) windows: 30-minute aggregates every 10
      // minutes via Spark's native window(size, slide) generator —
      // each event replicates into exactly 3 overlapping buckets; the
      // oracle materializes the identical 3 start offsets arithmetically
      val ev = eventsTsUs(s, dir)
        .withColumn("ts", timestamp_micros(col("ts_us")))
      ev.groupBy(window(col("ts"), "30 minutes", "10 minutes").as("w"),
          col("event_type"))
        .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sum_value"))
        .select(unix_micros(col("w.start")).as("w_start_us"),
          col("event_type"), col("n"), col("sum_value"))
        .orderBy("w_start_us", "event_type")
    }),
    "q_psi_drift" -> ((s, dir) => {
      // distribution drift: English doc lengths as the reference grid,
      // non-English as the "new" snapshot — per-bin PSI contributions;
      // reference min/max defines the bins, outside values clamp in
      val d = t(s, dir, "documents")
      graft.ops.Profile.psiDrift(d.filter(col("lang") === "en"),
          d.filter(col("lang") =!= "en"), "n_chars", bins = 10)
        .orderBy("bucket")
    }),
    "q_compaction_plan" -> ((s, dir) => {
      // small-file compaction plan over a synthetic inventory (priority
      // = table partition, order = file, totalprice = bytes): per-
      // partition cumulative binning, deterministic and idempotent
      val inv = t(s, dir, "orders").select(
        col("o_orderpriority").as("part"),
        concat(lit("f"), col("o_orderkey").cast("string")).as("file"),
        (floor(col("o_totalprice")) + lit(1L)).as("bytes"))
      graft.ops.Layout.compactionPlan(inv, "part", "file", "bytes",
          targetBytes = 1000000L)
        .orderBy("part", "file")
    }),
    "q_soundex_block" -> ((s, dir) => {
      // phonetic block-key profile over part first words: the Soundex
      // chain is the SAME function composition on both engines (the
      // run collapse is seven per-digit passes — RE2 oracles have no
      // backreferences)
      val w = t(s, dir, "part").select(
        regexp_extract(lower(col("p_name")), "^[a-z]+", 0).as("w"))
        .filter(col("w") =!= "")
      w.select(col("w"), graft.ops.Linkage.soundex(col("w")).as("code"))
        .groupBy("code")
        .agg(count(lit(1)).as("n_parts"),
          countDistinct(col("w")).as("n_words"),
          min("w").as("sample_word"))
        .orderBy("code")
    }),
    "q_phonetic_pairs" -> ((s, dir) => {
      // sound-alike pairs: soundex blocks + exact JW verify inside —
      // the complementary recall pass next to q_jaro_linkage's lexical
      // blocking (multi-pass blocking, Christen Ch. 4). The part
      // vocabulary is sound-alike-free by construction, so the classic
      // linkage fixture names ride along (the q_retrieval_eval literal
      // convention): smith/smyth, ashcraft/ashcroft, robert/rupert and
      // jonathan/jonothan survive; mayer/meier blocks together but the
      // verify rejects it (0.76 < 0.78); catherine/kathryn never meets
      // — soundex is first-letter-blind, the documented recall gap the
      // lexical pass covers
      import s.implicits._
      val names = Seq("smith", "smyth", "ashcraft", "ashcroft", "robert",
        "rupert", "catherine", "kathryn", "jonathan", "jonothan",
        "claire", "clare", "mayer", "meier").toDF("w")
      val words = t(s, dir, "part").select(
        regexp_extract(lower(col("p_name")), "^[a-z]+", 0).as("w"))
        .filter(col("w") =!= "").distinct()
        .unionAll(names)
      graft.ops.Linkage.phoneticSelfJoin(
          words.select(col("w").as("wid"), col("w")),
          "wid", "w", minSim = 0.78)
        .orderBy("id_a", "id_b")
    }),
    "q_jaro_linkage" -> ((s, dir) => {
      // name-similarity linkage over brand blocks scored by the native
      // graft_jaro codegen kernel — exact DuckDB jaro_winkler_similarity
      // semantics (3000-pair randomized cross-check), JW length-cap
      // prune provably lossless, 4dp round-before-cut
      graft.ops.Linkage.jaroSelfJoin(
          t(s, dir, "part").select(col("p_partkey"), col("p_brand"),
            col("p_name")),
          Seq("p_brand"), "p_name", "p_partkey", minSim = 0.9)
        .orderBy("id_a", "id_b")
    }),
    "text_oov_rate" -> ((s, dir) => {
      // tokenizer vocab-coverage audit: OOV share per doc against the
      // df>=5 corpus vocabulary; explode → AQE-decided vocab join →
      // one doc-keyed aggregation, empty docs stay in the report
      val d = t(s, dir, "documents")
      val vocab = graft.ops.TextMetrics.invertedIndex(d, "text", "doc_id",
        minDf = 5L).select(col("term"))
      graft.ops.TextMetrics.oovRate(d, "text", "doc_id", vocab, "term")
        .orderBy("doc_id")
    }),
    "q_entropy" -> ((s, dir) => {
      // per-column Shannon entropy profile (block-key/partition-key
      // quality signal): all columns in ONE scan via an in-project
      // unpivot, (col, value) counts map-side combined
      graft.ops.Profile.entropyProfile(t(s, dir, "documents"),
          Seq("lang", "source"))
        .orderBy("col_name")
    }),
    "q_mutual_info" -> ((s, dir) => {
      // mutual information between return flag and line status — the
      // feature-redundancy/leakage probe; joint counts once, marginals
      // derived from them, total as a 1-row subtree
      graft.ops.Profile.mutualInfo(t(s, dir, "lineitem"),
        "l_returnflag", "l_linestatus")
    }),
    "graph_kcore" -> ((s, dir) => {
      // k-core peel on the 997-node orders multigraph (k=21 → 908
      // survivors after a real multi-round cascade); the oracle unrolls
      // the peel to a fixed-round CTE chain (idempotent past fixpoint,
      // so the unroll count only needs to be an upper bound)
      val e = t(s, dir, "orders").select(
        (col("o_custkey") % 997).as("src"),
        (col("o_orderkey") % 997).as("dst"))
      graft.ops.Graph.kCore(e, "src", "dst", k = 21)
        .orderBy("node")
    }),
    "graph_assort" -> ((s, dir) => {
      // degree assortativity of the orders graph: hubs-to-hubs or
      // hubs-to-leaves? guarded-moment Pearson over edge-end degrees
      val e = t(s, dir, "orders").select(
        (col("o_custkey") % 997).as("src"),
        (col("o_orderkey") % 997).as("dst"))
      graft.ops.Graph.assortativity(e, "src", "dst")
    }),
    "text_heaps" -> ((s, dir) =>
      // Heaps'-law vocabulary growth at 10 doc-id quantile prefixes:
      // ONE scan via first-occurrence ids (k cumulative distincts
      // decompose into k conditional counts), beta via regr_slope
      graft.ops.TextMetrics.heapsLaw(t(s, dir, "documents"), "text",
          "doc_id", checkpoints = 10)
        .orderBy("checkpoint")),
    "graph_link_pred" -> ((s, dir) => {
      // link prediction on a 1/3-density slice of the 997-node orders
      // graph (the full sf0.1 graph has deg ~250 — wedge cost tracks
      // Σ deg², the documented envelope, and the gate models the
      // realistic-density regime); deterministic top-100 by the
      // classic trio (cn / Jaccard / Adamic-Adar)
      val e = t(s, dir, "orders")
        .filter(col("o_orderkey") % 3 === 0)
        .select((col("o_custkey") % 997).as("src"),
          (col("o_orderkey") % 997).as("dst"))
      graft.ops.Graph.linkPrediction(e, "src", "dst")
        .orderBy(desc("common_neighbors"), col("id_a"), col("id_b"))
        .limit(100)
    }),
    "q_twap" -> ((s, dir) => {
      // time-weighted average event value per type: each observation
      // weighted by how long it stayed current (censored last obs),
      // published next to the unweighted mean — the burstiness gap
      val ev = eventsTsUs(s, dir)
      graft.ops.Interval.timeWeightedAvg(ev, "event_type", "ts_us",
          "value")
        .orderBy("event_type")
    }),
    "graph_lpa" -> ((s, dir) => {
      // label-propagation communities on the 997-node orders graph:
      // 4 synchronous rounds, ties to the smallest label — the whole
      // run is a pure function of the edge set, and the oracle unrolls
      // the identical rounds as CTEs (the pagerank/hits construction)
      val e = t(s, dir, "orders").select(
        (col("o_custkey") % 997).as("src"),
        (col("o_orderkey") % 997).as("dst"))
      graft.ops.Graph.labelProp(e, "src", "dst", iters = 4)
        .orderBy("node")
    }),
    "q_winsorize" -> ((s, dir) => {
      // per-source doc-length winsorization at the exact [5%, 95%]
      // band — robustOutliers flags the tail, this reins it in
      graft.ops.Profile.winsorize(t(s, dir, "documents"), "source",
          "doc_id", "n_chars", pLo = 0.05, pHi = 0.95)
        .orderBy("source", "doc_id")
    }),
    "q_cusum" -> ((s, dir) => {
      // CUSUM drift alarm over each event type's daily-mean series;
      // daily means 4dp-rounded so the series itself is engine-
      // identical before the sequential fold; oracle replays the
      // recurrence as a recursive CTE
      val daily = eventsTsUs(s, dir)
        .groupBy(col("event_type"), expr("ts_us div 86400000000").as("day"))
        .agg(round(avg("value"), 4).as("x"))
      graft.ops.Profile.cusum(daily, "event_type", "day", "x")
        .orderBy("event_type", "ts")
    }),
    "q_ewma" -> ((s, dir) => {
      // EWMA smoothing of the same daily series cusum alarms on (α=0.3);
      // the oracle replays the recurrence as a recursive CTE — the
      // denoised level a drift dashboard plots
      val daily = eventsTsUs(s, dir)
        .groupBy(col("event_type"), expr("ts_us div 86400000000").as("day"))
        .agg(round(avg("value"), 4).as("x"))
      graft.ops.Profile.ewma(daily, "event_type", "day", "x", alpha = 0.3)
        .orderBy("event_type", "ts")
    }),
    "q_rolling_z" -> ((s, dir) => {
      // rolling z-score spike flags over the daily series: each point
      // scored against its trailing-7 history (never itself); pure
      // window aggregation, one Exchange on the key
      val daily = eventsTsUs(s, dir)
        .groupBy(col("event_type"), expr("ts_us div 86400000000").as("day"))
        .agg(round(avg("value"), 4).as("x"))
      graft.ops.Profile.rollingZ(daily, "event_type", "day", "x",
          window = 7, tau = 2.5, minPts = 3)
        .orderBy("event_type", "ts")
    }),
    "q_acf" -> ((s, dir) => {
      // autocorrelation of each event type's daily series at lags 1..7:
      // the seasonality probe — ONE keyed window pass builds all lag
      // columns, one aggregation computes every corr; the oracle IS the
      // definition (corr + lag windows)
      val daily = eventsTsUs(s, dir)
        .groupBy(col("event_type"), expr("ts_us div 86400000000").as("day"))
        .agg(round(avg("value"), 4).as("x"))
      graft.ops.Profile.acf(daily, "event_type", "day", "x", maxLag = 7)
        .orderBy("event_type", "lag")
    }),
    "q_holt" -> ((s, dir) => {
      // Holt double-exponential smoothing of the daily series (α=0.3,
      // β=0.2): trend-aware level + one-step forecast; the oracle
      // replays the recurrence as a recursive CTE with identical
      // literal coefficients
      val daily = eventsTsUs(s, dir)
        .groupBy(col("event_type"), expr("ts_us div 86400000000").as("day"))
        .agg(round(avg("value"), 4).as("x"))
      graft.ops.Profile.holt(daily, "event_type", "day", "x",
          alpha = 0.3, beta = 0.2)
        .orderBy("event_type", "ts")
    }),
    "q_benford" -> ((s, dir) =>
      // Benford first-digit audit of extended prices: arithmetic leading
      // digit (never string rendering), 9-row grid with chi-square terms
      graft.ops.Profile.benford(t(s, dir, "lineitem"), "l_extendedprice")
        .orderBy("digit")),
    "q_concentration" -> ((s, dir) =>
      // revenue-concentration audit: Gini + HHI + top-share of customer
      // order totals — one keyed agg then a KEY-level ranked pass
      graft.ops.Profile.concentration(t(s, dir, "orders"), "o_custkey",
        "o_totalprice")),
    "q_cohen_kappa" -> ((s, dir) => {
      // chance-corrected agreement between two length-derived labelers
      // (char-bucket vs token-bucket) — the annotation-QA scan shape;
      // thresholds deliberately disagree on a real slice of docs
      val d = t(s, dir, "documents")
      val labeled = d.select(
        when(col("n_chars") < 200, "short")
          .when(col("n_chars") < 800, "mid").otherwise("long").as("by_chars"),
        when(size(filter(split(col("text"), " ", -1), x => x =!= "")) < 40,
            "short")
          .when(size(filter(split(col("text"), " ", -1), x => x =!= "")) < 160,
            "mid")
          .otherwise("long").as("by_tokens"))
      graft.ops.Profile.cohenKappa(labeled, "by_chars", "by_tokens")
    }),
    "q_split_train" -> ((s, dir) =>
      // deterministic 90/5/5 train/val/test hash split: a pure function
      // of doc_id (append-stable, re-read-stable), one narrow scan
      graft.ops.Sampling.splitAssign(
          t(s, dir, "documents").select("doc_id"), "doc_id")
        .orderBy("doc_id")),
    "q_top_paths" -> ((s, dir) => {
      // top user journeys: the 15 most common 3-step opening event
      // paths — per-user ordered prefix collect, one path aggregation,
      // TakeOrdered top-k (no global sort)
      val ev = eventsTsUs(s, dir)
      graft.ops.Behavior.topPaths(ev, "user_id", "ts_us", "event_type",
          maxSteps = 3, k = 15)
        .orderBy("rank")
    }),
    "graph_hits" -> ((s, dir) => {
      // HITS hubs/authorities on the directed orders graph (8 rounds,
      // L2-normalized, 10dp per-round rounding); the oracle unrolls the
      // mutual recursion to 8 CTE rounds with the identical norm order
      // and rounding (the pageRankOracle construction)
      val e = t(s, dir, "orders").select(
        (col("o_custkey") % 997).as("src"),
        (col("o_orderkey") % 997).as("dst"))
      graft.ops.Graph.hits(e, "src", "dst", iters = 8)
        .orderBy("node")
    }),
    "mm_image_dedup" -> ((s, dir) => {
      // perceptual image dedup end-to-end on the deterministic PNG
      // corpus (one image per doc_id; variant 1 of each 3-id group is
      // the SAME scene at half resolution — the planted near-dup that
      // byte-level dedup can never see). dHash over real ImageIO
      // decodes, pigeonhole-banded hamming pairs. Pixel decode has no
      // SQL form → rows-only gate; the decode/pairing semantics are
      // spec-anchored (dHash + imageNearDupPairs specs). FIXTURE-TRUTH
      // ORACLE: the planted truth is closed-form on doc_ids — pair
      // (3g, 3g+1) whenever both ids exist, at EXACTLY hamming 0 (the
      // half-res variant area-averages to bit-identical dHash cells:
      // constant gray per grid cell makes both resolutions' cell means
      // the same FP value) — so DuckDB replays the full expected output
      // from the documents table alone. Valid while max doc_id <
      // 3·100000 (the variant-2 scene offset; past it a v2 scene
      // collides with a later group's v0 — sf0.01/sf0.1 are far under)
      val imgs = graft.ops.MediaFixture.images(s,
        t(s, dir, "documents").select("doc_id"))
      graft.ops.Multimodal.imageNearDupPairs(imgs, "id", "payload",
          maxHamming = 3, bands = 4)
        .orderBy("id_a", "id_b")
    }),
    "mm_audio_dedup" -> ((s, dir) => {
      // perceptual audio dedup on the deterministic WAV corpus (variant
      // 1 = same envelope at half gain — invisible to byte hashing);
      // envelope fingerprints over real PCM decodes, banded hamming.
      // FIXTURE-TRUTH ORACLE on the pair STRUCTURE: (3g, 3g+1)
      // whenever both ids exist — closed-form on doc_ids like
      // mm_image_dedup. The hamming VALUE is projected away: 16-bit
      // PCM quantization means the half-gain variant's RMS envelope is
      // not bit-exactly half, so a near-tied adjacent block pair could
      // legitimately flip a comparison (0 < hamming <= 4) — pair
      // membership is construction-guaranteed, the exact distance is
      // not, and an oracle must only assert what construction pins
      val clips = graft.ops.MediaFixture.audio(s,
        t(s, dir, "documents").select("doc_id"))
      graft.ops.Multimodal.audioNearDupPairs(clips, "id", "payload",
          maxHamming = 4, bands = 8)
        .select("id_a", "id_b")
        .orderBy("id_a", "id_b")
    }),
    "mm_media_meta" -> ((s, dir) => {
      // container-header metadata profile over a mixed PNG/WAV corpus:
      // per-format counts + dimension/channel/rate aggregates from the
      // real header parse (the lakehouse media-catalog audit).
      // FIXTURE-TRUTH ORACLE: every aggregated field is construction-
      // determined (even ids are 72x48 or 36x24 RGB PNGs, odd ids are
      // mono 8 kHz WAVs), so DuckDB replays the expected profile from
      // doc_ids alone. Encoded byte totals are deliberately NOT in the
      // gate (PNG length is deflate-dependent — no SQL form; payload
      // sizing stays spec-anchored)
      val mixed = graft.ops.MediaFixture.mixed(s,
        t(s, dir, "documents").select("doc_id"))
      graft.ops.Multimodal.extractMetadata(mixed, "id", "payload").toDF()
        .groupBy("format")
        .agg(count(lit(1)).as("n"),
          round(avg(when(col("width") > 0, col("width"))), 4)
            .as("avg_width"),
          round(avg(when(col("height") > 0, col("height"))), 4)
            .as("avg_height"),
          round(avg(when(col("channels") > 0, col("channels"))), 4)
            .as("avg_channels"),
          round(avg(when(col("sample_rate") > 0, col("sample_rate"))), 4)
            .as("avg_rate"))
        .orderBy("format")
    }),
    "q_retrieval_eval" -> ((s, dir) => {
      // retrieval evaluation: a deliberately imperfect length-ranked
      // retriever scored against tf-graded judgments for 3 query terms
      // — recall/precision@10, MRR, graded nDCG per query
      import org.apache.spark.sql.expressions.Window
      val d = t(s, dir, "documents")
      val tf = d.select(col("doc_id"),
          explode(split(col("text"), " ", -1)).as("w"))
        .filter(col("w").isin("query", "dup", "spark"))
        .groupBy(col("w").as("qid"), col("doc_id").as("doc"))
        .agg(count(lit(1)).as("tf"))
      val results = tf
        .join(d.select(col("doc_id").as("doc"), col("n_chars")), "doc")
        .withColumn("rank", row_number().over(
          Window.partitionBy("qid").orderBy(desc("n_chars"), col("doc"))))
        .filter(col("rank") <= 10).select("qid", "doc", "rank")
      val qrels = tf.select(col("qid"), col("doc"),
        least(col("tf"), lit(3L)).as("grade"))
      graft.ops.Similarity.retrievalMetrics(results, qrels, k = 10)
        .orderBy("qid")
    }),
    "q_classifier_metrics" -> ((s, dir) => {
      // confusion metrics at a threshold for a deterministic (and
      // honestly near-random on this synthetic corpus) stopword-density
      // scorer vs the lang=en label; one full-scan aggregation
      graft.ops.Profile.classifierMetrics(classifierEvalFrame(s, dir),
        "score", "label", threshold = 0.03)
    }),
    "q_calibration" -> ((s, dir) => {
      // per-bin calibration decomposition (confidence vs observed
      // positive rate), empty bins materialized
      graft.ops.Profile.calibration(classifierEvalFrame(s, dir),
          "score", "label", bins = 10)
        .orderBy("bucket")
    }),
    "q_roc_auc" -> ((s, dir) => {
      // exact rank-sum AUC with tie half-credit; scores 4dp-rounded so
      // the distinct-score walk is bounded (the documented envelope)
      graft.ops.Profile.rocAuc(classifierEvalFrame(s, dir),
        "score", "label")
    })
  )

  /** Shared eval frame for the classifier-metrics gates: score =
   * {the,and,of}-token density (4dp), label = lang == 'en'. Both sides
   * of the oracle build the identical frame. */
  private def classifierEvalFrame(s: SparkSession, dir: String): DataFrame =
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
  private val bm25Cte: String =
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

  private def mixtureSampleOracle: String = {
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
  private def zoneMapOracle: String = {
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

  private def zorderOracle: String = {
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
  private def hilbertOracle(bits: Int): String = {
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
  private def mmrOracle(k: Int, lambda: Double): String = {
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
  private def pageRankOracle(iters: Int): String = {
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
  private def hitsOracle(iters: Int): String = {
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
  private def kcoreOracle(k: Int, rounds: Int): String = {
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
  private def bpeTrainOracle(numMerges: Int): String = {
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

  private def lpaOracle(iters: Int): String = {
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

  def oracleSql: Map[String, String] = Map(
    // mm_* fixture-truth oracles: the media corpus is a pure function
    // of doc_id (MediaFixture scaladoc), so the EXPECTED engine output
    // is closed-form on the documents table — the planted (3g, 3g+1)
    // near-dup pair per group, and the per-format header profile.
    // These gate real decode + banding end-to-end: a wrong PCM/pixel
    // decode, a lossy band join, or a header mis-parse all diverge
    // from the construction truth.
    "mm_image_dedup" ->
      """SELECT a.doc_id AS id_a, b.doc_id AS id_b, 0::BIGINT AS hamming
        |FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 1
        |WHERE a.doc_id % 3 = 0
        |ORDER BY id_a, id_b""".stripMargin,
    "mm_audio_dedup" ->
      """SELECT a.doc_id AS id_a, b.doc_id AS id_b
        |FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 1
        |WHERE a.doc_id % 3 = 0
        |ORDER BY id_a, id_b""".stripMargin,
    "mm_media_meta" ->
      """WITH m AS (SELECT doc_id,
        |    CASE WHEN doc_id % 2 = 0 THEN 'png' ELSE 'wav' END AS format,
        |    CASE WHEN doc_id % 2 = 0 THEN
        |      CASE WHEN doc_id % 3 = 1 THEN 36 ELSE 72 END END AS width,
        |    CASE WHEN doc_id % 2 = 0 THEN
        |      CASE WHEN doc_id % 3 = 1 THEN 24 ELSE 48 END END AS height,
        |    CASE WHEN doc_id % 2 = 0 THEN 3 ELSE 1 END AS channels,
        |    CASE WHEN doc_id % 2 = 1 THEN 8000 END AS rate
        |  FROM documents)
        |SELECT format, count(*)::BIGINT AS n,
        |  round(avg(width), 4) AS avg_width,
        |  round(avg(height), 4) AS avg_height,
        |  round(avg(channels), 4) AS avg_channels,
        |  round(avg(rate), 4) AS avg_rate
        |FROM m GROUP BY format ORDER BY format""".stripMargin,
    "graph_pagerank" -> pageRankOracle(5),
    "graph_hits" -> hitsOracle(8),
    "graph_kcore" -> kcoreOracle(21, 14),
    "graph_lpa" -> lpaOracle(4),
    "graph_assort" ->
      """WITH e0 AS (SELECT DISTINCT
        |    least(o_custkey % 997, o_orderkey % 997) AS a,
        |    greatest(o_custkey % 997, o_orderkey % 997) AS b
        |  FROM orders WHERE o_custkey % 997 <> o_orderkey % 997),
        |nb AS (SELECT a, b FROM e0 UNION ALL SELECT b, a FROM e0),
        |deg AS (SELECT a AS node, count(*)::BIGINT AS deg FROM nb
        |  GROUP BY 1),
        |en AS (SELECT da.deg::DOUBLE AS x, db.deg::DOUBLE AS y
        |  FROM nb JOIN deg da ON da.node = nb.a
        |  JOIN deg db ON db.node = nb.b)
        |SELECT (SELECT count(*) FROM deg)::BIGINT AS n_nodes,
        |  (count(*) // 2)::BIGINT AS n_edges,
        |  round(corr(x, y), 4) AS assortativity
        |FROM en""".stripMargin,
    "text_heaps" ->
      """WITH tok AS (SELECT doc_id AS id,
        |    unnest(list_filter(string_split(text, ' '), x -> x <> ''))
        |      AS term FROM documents),
        |fs AS (SELECT term, min(id) AS f FROM tok GROUP BY term),
        |pd AS (SELECT id, count(*)::BIGINT AS nt FROM tok GROUP BY id),
        |cu AS (SELECT [quantile_cont(id, 0.1), quantile_cont(id, 0.2),
        |    quantile_cont(id, 0.3), quantile_cont(id, 0.4),
        |    quantile_cont(id, 0.5), quantile_cont(id, 0.6),
        |    quantile_cont(id, 0.7), quantile_cont(id, 0.8),
        |    quantile_cont(id, 0.9), quantile_cont(id, 1.0)] AS cs
        |  FROM pd),
        |g AS (SELECT p AS checkpoint, cs[p] AS id_threshold,
        |    (SELECT sum(nt) FROM pd WHERE pd.id <= cs[p])::BIGINT
        |      AS n_tokens,
        |    (SELECT count(*) FROM fs WHERE fs.f <= cs[p])::BIGINT
        |      AS vocab
        |  FROM cu, unnest(generate_series(1, 10)) AS u(p)),
        |b AS (SELECT regr_slope(ln(vocab::DOUBLE), ln(n_tokens::DOUBLE))
        |    AS bb FROM g WHERE n_tokens > 0 AND vocab > 0)
        |SELECT g.checkpoint::INTEGER AS checkpoint,
        |  round(g.id_threshold, 4) AS id_threshold, g.n_tokens, g.vocab,
        |  round(b.bb, 4) + 0.0 AS beta
        |FROM g, b ORDER BY checkpoint""".stripMargin,
    "graph_link_pred" ->
      """WITH e0 AS MATERIALIZED (SELECT DISTINCT
        |    least(o_custkey % 997, o_orderkey % 997) AS a,
        |    greatest(o_custkey % 997, o_orderkey % 997) AS b
        |  FROM orders WHERE o_custkey % 997 <> o_orderkey % 997
        |    AND o_orderkey % 3 = 0),
        |nb AS (SELECT a AS ctr, b AS n FROM e0
        |  UNION ALL SELECT b, a FROM e0),
        |deg AS (SELECT ctr AS node, count(*)::BIGINT AS deg FROM nb
        |  GROUP BY 1),
        |c AS (SELECT nb.ctr, nb.n, deg.deg FROM nb
        |  JOIN deg ON deg.node = nb.ctr WHERE deg.deg <= 10000),
        |p AS (SELECT x.n AS a, y.n AS b, count(*)::BIGINT AS cn,
        |    sum(1.0 / ln(x.deg)) AS aa
        |  FROM c x JOIN c y ON x.ctr = y.ctr AND x.n < y.n
        |  GROUP BY 1, 2),
        |ne AS (SELECT p.* FROM p LEFT JOIN e0
        |    ON e0.a = p.a AND e0.b = p.b
        |  WHERE e0.a IS NULL)
        |SELECT ne.a AS id_a, ne.b AS id_b, cn AS common_neighbors,
        |  round(cn / (da.deg + db.deg - cn)::DOUBLE, 4) AS jaccard,
        |  round(aa, 4) AS adamic_adar
        |FROM ne JOIN deg da ON da.node = ne.a
        |JOIN deg db ON db.node = ne.b
        |ORDER BY common_neighbors DESC, id_a, id_b
        |LIMIT 100""".stripMargin,
    "q_twap" ->
      """WITH e AS (SELECT event_type AS k, epoch_us(ts)::BIGINT AS t,
        |    value AS v FROM events WHERE value IS NOT NULL),
        |w AS (SELECT k, v,
        |    lead(t) OVER (PARTITION BY k ORDER BY t, v) - t AS dur
        |  FROM e)
        |SELECT k AS event_type, count(*)::BIGINT AS n_obs,
        |  coalesce(sum(dur), 0)::BIGINT AS span,
        |  round(CASE WHEN sum(dur) > 0
        |    THEN sum(v * dur) / sum(dur) END, 4) AS twa,
        |  round(avg(v), 4) AS mean_unweighted
        |FROM w GROUP BY k ORDER BY event_type""".stripMargin,
    "text_bpe_train" -> bpeTrainOracle(12),
    "ann_pq" ->
      """WITH e AS (SELECT vec_id, generate_subscripts(embedding, 1) AS i,
        |    unnest(embedding)::DOUBLE AS x FROM embeddings),
        |sub AS (SELECT vec_id, (i - 1) // 8 AS s, (i - 1) % 8 AS j, x FROM e),
        |s0 AS (SELECT vec_id, row_number() OVER (ORDER BY vec_id) - 1 AS cid
        |  FROM (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT 16)),
        |c0 AS (SELECT sub.s, s0.cid, sub.j, sub.x FROM sub JOIN s0 USING (vec_id)),
        |d1 AS (SELECT sub.vec_id, sub.s, c.cid,
        |    sum((sub.x - c.x) * (sub.x - c.x)) AS d
        |  FROM sub JOIN c0 c ON c.s = sub.s AND c.j = sub.j
        |  GROUP BY sub.vec_id, sub.s, c.cid),
        |a1 AS (SELECT vec_id, s, cid FROM d1
        |  QUALIFY row_number() OVER (PARTITION BY vec_id, s ORDER BY d, cid) = 1),
        |c1 AS (SELECT sub.s, a.cid, sub.j, round(avg(sub.x), 6) AS x
        |  FROM sub JOIN a1 a ON a.vec_id = sub.vec_id AND a.s = sub.s
        |  GROUP BY sub.s, a.cid, sub.j),
        |d2 AS (SELECT sub.vec_id, sub.s, c.cid,
        |    sum((sub.x - c.x) * (sub.x - c.x)) AS d
        |  FROM sub JOIN c1 c ON c.s = sub.s AND c.j = sub.j
        |  GROUP BY sub.vec_id, sub.s, c.cid),
        |a2 AS (SELECT vec_id, s, cid FROM d2
        |  QUALIFY row_number() OVER (PARTITION BY vec_id, s ORDER BY d, cid) = 1),
        |qd AS (SELECT c.s, c.cid, sum((qs.x - c.x) * (qs.x - c.x)) AS d
        |  FROM c1 c JOIN sub qs ON qs.vec_id = 0 AND qs.s = c.s AND qs.j = c.j
        |  GROUP BY c.s, c.cid),
        |ad AS (SELECT a.vec_id, round(sum(qd.d), 6) AS adist
        |  FROM a2 a JOIN qd ON qd.s = a.s AND qd.cid = a.cid
        |  WHERE a.vec_id <> 0 GROUP BY a.vec_id)
        |SELECT vec_id, adist FROM ad ORDER BY adist, vec_id
        |LIMIT 10""".stripMargin,
    "ann_pq_rerank" ->
      """WITH e AS (SELECT vec_id, generate_subscripts(embedding, 1) AS i,
        |    unnest(embedding)::DOUBLE AS x FROM embeddings),
        |sub AS (SELECT vec_id, (i - 1) // 8 AS s, (i - 1) % 8 AS j, x FROM e),
        |s0 AS (SELECT vec_id, row_number() OVER (ORDER BY vec_id) - 1 AS cid
        |  FROM (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT 16)),
        |c0 AS (SELECT sub.s, s0.cid, sub.j, sub.x FROM sub JOIN s0 USING (vec_id)),
        |d1 AS (SELECT sub.vec_id, sub.s, c.cid,
        |    sum((sub.x - c.x) * (sub.x - c.x)) AS d
        |  FROM sub JOIN c0 c ON c.s = sub.s AND c.j = sub.j
        |  GROUP BY sub.vec_id, sub.s, c.cid),
        |a1 AS (SELECT vec_id, s, cid FROM d1
        |  QUALIFY row_number() OVER (PARTITION BY vec_id, s ORDER BY d, cid) = 1),
        |c1 AS (SELECT sub.s, a.cid, sub.j, round(avg(sub.x), 6) AS x
        |  FROM sub JOIN a1 a ON a.vec_id = sub.vec_id AND a.s = sub.s
        |  GROUP BY sub.s, a.cid, sub.j),
        |d2 AS (SELECT sub.vec_id, sub.s, c.cid,
        |    sum((sub.x - c.x) * (sub.x - c.x)) AS d
        |  FROM sub JOIN c1 c ON c.s = sub.s AND c.j = sub.j
        |  GROUP BY sub.vec_id, sub.s, c.cid),
        |a2 AS (SELECT vec_id, s, cid FROM d2
        |  QUALIFY row_number() OVER (PARTITION BY vec_id, s ORDER BY d, cid) = 1),
        |qd AS (SELECT c.s, c.cid, sum((qs.x - c.x) * (qs.x - c.x)) AS d
        |  FROM c1 c JOIN sub qs ON qs.vec_id = 0 AND qs.s = c.s AND qs.j = c.j
        |  GROUP BY c.s, c.cid),
        |ad AS (SELECT a.vec_id, round(sum(qd.d), 6) AS adist
        |  FROM a2 a JOIN qd ON qd.s = a.s AND qd.cid = a.cid
        |  WHERE a.vec_id <> 0 GROUP BY a.vec_id),
        |short AS (SELECT vec_id FROM ad ORDER BY adist, vec_id LIMIT 100),
        |rr AS (SELECT v.vec_id, round(sum((v.x - qv.x) * (v.x - qv.x)), 6) AS dist
        |  FROM e v JOIN e qv ON qv.vec_id = 0 AND qv.i = v.i
        |  JOIN short ON short.vec_id = v.vec_id
        |  GROUP BY v.vec_id)
        |SELECT vec_id, dist FROM rr ORDER BY dist, vec_id
        |LIMIT 10""".stripMargin,
    "q_sql_scalar" -> sqlScalarText,
    "q_filter_agg" -> sqlFilterAggText,
    "q_not_in_null" -> sqlNotInText,
    "q_window_frame" -> sqlWindowFrameText,
    "q_array_funcs" ->
      """SELECT doc_id,
        |  array_to_string(list_sort(list_distinct(list_intersect(a, b))), ',')
        |    AS inter_s,
        |  len(list_distinct(list_concat(a, b)))::BIGINT AS union_n,
        |  array_to_string(list_sort(list_distinct(
        |    list_filter(a, x -> NOT list_contains(b, x)))), ',') AS except_s,
        |  (CASE WHEN list_has_any(a, b) THEN 1 ELSE 0 END)::BIGINT AS overlap
        |FROM (SELECT doc_id, tok[1:10] AS a, tok[6:15] AS b
        |  FROM (SELECT doc_id, string_split(text, ' ') AS tok FROM documents)
        |  WHERE len(tok) >= 15)
        |ORDER BY doc_id""".stripMargin,
    "q_string_funcs" ->
      """SELECT p_partkey,
        |  upper(p_name) AS up,
        |  lpad(p_brand, 12, '*') AS lp,
        |  rpad(p_brand, 12, '-') AS rp,
        |  reverse(p_type) AS rev,
        |  translate(p_type, 'AEIOU', 'aeiou') AS tr,
        |  split_part(p_type, ' ', 1) AS first_word,
        |  substr(p_name, 1, 5) AS left5,
        |  repeat(p_brand, 2) AS rep2,
        |  len(p_name)::BIGINT AS name_len
        |FROM part WHERE p_partkey < 500
        |ORDER BY p_partkey""".stripMargin,
    "q_unpivot" ->
      """SELECT l_orderkey, l_linenumber, 'l_quantity' AS metric,
        |  l_quantity AS v
        |FROM lineitem WHERE l_orderkey < 100
        |UNION ALL
        |SELECT l_orderkey, l_linenumber, 'l_extendedprice', l_extendedprice
        |FROM lineitem WHERE l_orderkey < 100
        |UNION ALL
        |SELECT l_orderkey, l_linenumber, 'l_discount', l_discount
        |FROM lineitem WHERE l_orderkey < 100
        |ORDER BY l_orderkey, l_linenumber, metric""".stripMargin,
    "q_try_cast" ->
      """SELECT doc_id,
        |  try_cast(si AS INTEGER) AS i_v,
        |  try_cast(sd AS DOUBLE) AS d_v,
        |  strftime(try_cast(dt AS DATE), '%Y-%m-%d') AS date_v
        |FROM (SELECT doc_id,
        |  CASE WHEN doc_id % 2 = 0 THEN doc_id::VARCHAR
        |       ELSE 'x' || doc_id END AS si,
        |  CASE WHEN doc_id % 3 = 0 THEN doc_id || '.5'
        |       WHEN doc_id % 3 = 1 THEN 'x' || doc_id
        |       ELSE doc_id::VARCHAR END AS sd,
        |  CASE WHEN doc_id % 2 = 0 THEN '1995-03-07'
        |       ELSE '1995-13-40' END AS dt
        |  FROM documents)
        |ORDER BY doc_id""".stripMargin,
    "q_higher_order" ->
      """SELECT doc_id,
        |  len(list_filter(string_split(text, ' '), x -> len(x) > 4))::BIGINT
        |    AS n_long,
        |  coalesce(list_sum(list_transform(
        |    list_filter(string_split(text, ' '), x -> len(x) > 4),
        |    x -> len(x))), 0)::BIGINT AS sum_long_len,
        |  list_max(list_transform(string_split(text, ' '), x -> len(x)))::BIGINT
        |    AS max_len,
        |  len(list_filter(string_split(text, ' '),
        |    x -> regexp_matches(x, '^[0-9]+$')))::BIGINT AS n_numeric
        |FROM documents
        |ORDER BY doc_id""".stripMargin,
    "q_datetime" ->
      """SELECT o_orderkey,
        |  strftime(o_orderdate, '%Y-%m-%d') AS order_date,
        |  year(o_orderdate)::BIGINT AS yr,
        |  quarter(o_orderdate)::BIGINT AS qtr,
        |  month(o_orderdate)::BIGINT AS mth,
        |  isodow(o_orderdate)::BIGINT AS isodow,
        |  strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
        |  strftime(last_day(o_orderdate::DATE), '%Y-%m-%d') AS month_end,
        |  datediff('day', DATE '1995-01-01', o_orderdate::DATE)::BIGINT
        |    AS days_since_95
        |FROM orders WHERE o_orderkey < 500
        |ORDER BY o_orderkey""".stripMargin,
    "text_c4_rules" -> c4Oracle,
    "text_langid_model" -> langIdModelOracle,
    "text_chunk_bpe" -> chunkBpeOracle,
    "text_gopher" -> gopherOracle,
    "dedup_spans" ->
      """WITH corpus AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 3000000, 'clone marker ' || doc_id || ' ' || text
        |  FROM documents WHERE doc_id % 5 = 0),
        |tokd AS (SELECT doc_id, string_split(text, ' ') AS tok FROM corpus
        |  WHERE len(string_split(text, ' ')) >= 10),
        |s AS (SELECT doc_id,
        |  unnest(range(1, len(tok) - 8))::BIGINT AS pos,
        |  unnest(list_transform(range(1, len(tok) - 8), i ->
        |    md5(array_to_string(tok[i:i+9], ' ')))) AS span_hash
        |  FROM tokd),
        |d AS (SELECT span_hash, count(DISTINCT doc_id)::BIGINT AS n_docs,
        |  count(*)::BIGINT AS n_occ
        |  FROM s GROUP BY 1 HAVING count(DISTINCT doc_id) >= 2)
        |SELECT s.doc_id, s.pos, s.span_hash, d.n_docs, d.n_occ
        |FROM s JOIN d USING (span_hash)
        |ORDER BY doc_id, pos""".stripMargin,
    "dedup_spans_mask" ->
      """WITH corpus AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 3000000, 'clone marker ' || doc_id || ' ' || text
        |  FROM documents WHERE doc_id % 5 = 0),
        |tokd AS (SELECT doc_id, string_split(text, ' ') AS tok FROM corpus),
        |s AS (SELECT doc_id,
        |  unnest(range(1, len(tok) - 8))::BIGINT AS pos,
        |  unnest(list_transform(range(1, len(tok) - 8), i ->
        |    md5(array_to_string(tok[i:i+9], ' ')))) AS span_hash
        |  FROM tokd WHERE len(tok) >= 10),
        |d AS (SELECT span_hash FROM s
        |  GROUP BY 1 HAVING count(DISTINCT doc_id) >= 2),
        |f AS (SELECT s.doc_id, s.pos FROM s JOIN d USING (span_hash)),
        |g AS (SELECT doc_id, list(pos) AS starts FROM f GROUP BY doc_id),
        |m AS (SELECT t.doc_id, t.tok,
        |  CASE WHEN g.starts IS NULL THEN []::BIGINT[] ELSE g.starts END
        |    AS starts
        |  FROM tokd t LEFT JOIN g USING (doc_id)),
        |c AS (SELECT doc_id, tok,
        |  list_distinct(flatten(list_transform(starts, p -> range(p, p + 10))))
        |    AS cov
        |  FROM m)
        |SELECT doc_id,
        |  coalesce(array_to_string(list_transform(
        |    list_filter(range(1, len(tok) + 1), i -> NOT list_contains(cov, i)),
        |    i -> tok[i]), ' '), '') AS text_masked,
        |  len(cov)::BIGINT AS n_tokens_removed
        |FROM c ORDER BY doc_id""".stripMargin,
    "text_cdc_chunk" ->
      """WITH d AS (SELECT doc_id, text AS t, len(text)::BIGINT AS n
        |  FROM documents WHERE len(text) >= 1),
        |c AS (SELECT doc_id, t, n,
        |  [0::BIGINT] || list_filter(list_transform(range(8, n), i ->
        |      CASE WHEN substr(md5(substr(t, (i-7)::INT, 8)), 1, 1) = '0'
        |        THEN i END),
        |    x -> x IS NOT NULL) || [n] AS cuts
        |  FROM d),
        |e AS (SELECT doc_id,
        |  unnest(range(1, len(cuts)))::BIGINT - 1 AS chunk_id,
        |  unnest(list_transform(range(1, len(cuts)), j -> cuts[j]))::BIGINT
        |    AS chunk_start,
        |  unnest(list_transform(range(1, len(cuts)), j ->
        |    substr(t, (cuts[j]+1)::INT, (cuts[j+1]-cuts[j])::INT)))
        |    AS chunk_text
        |  FROM c)
        |SELECT doc_id, chunk_id, chunk_start, chunk_text,
        |  len(chunk_text)::BIGINT AS n_chunk_chars
        |FROM e
        |ORDER BY doc_id, chunk_id""".stripMargin,
    "dedup_url" ->
      """WITH u AS (SELECT doc_id,
        |  (CASE WHEN doc_id % 4 = 0 THEN 'https://www.'
        |        WHEN doc_id % 4 = 1 THEN 'HTTP://'
        |        WHEN doc_id % 4 = 2 THEN 'https://'
        |        ELSE 'http://www.' END) ||
        |  'd' || (doc_id % 50) || '.example.com/page/' || (doc_id % 100) ||
        |  (CASE WHEN doc_id % 5 = 0 THEN '/' ELSE '' END) ||
        |  (CASE WHEN doc_id % 2 = 0 THEN '?utm_source=feed' ELSE '' END) ||
        |  (CASE WHEN doc_id % 3 = 0 THEN '#section' ELSE '' END) AS url
        |  FROM documents),
        |c AS (SELECT doc_id, regexp_replace(regexp_replace(regexp_replace(
        |  regexp_replace(regexp_replace(lower(url), '^https?://', ''),
        |  '^www\.', ''), '#.*$', ''), '\?.*$', ''), '/+$', '') AS url_key
        |  FROM u)
        |SELECT url_key, min(doc_id) AS keep_id, count(*)::BIGINT AS n_copies
        |FROM c GROUP BY url_key
        |ORDER BY url_key""".stripMargin,
    "q_map_type" ->
      """SELECT l_orderkey, l_linenumber,
        |  m['qty'][1] AS qty_v,
        |  array_to_string(map_keys(m), ',') AS keys_s
        |FROM (SELECT l_orderkey, l_linenumber,
        |  map(['qty', 'price'], [l_quantity, l_extendedprice]) AS m
        |  FROM lineitem WHERE l_orderkey < 100)
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q_describe" ->
      """SELECT 'l_quantity' AS "column", count(l_quantity) AS n,
        |  (count(*) - count(l_quantity)) AS n_nulls,
        |  round(min(l_quantity), 4) AS min_v, round(max(l_quantity), 4) AS max_v,
        |  round(avg(l_quantity), 4) AS mean_v,
        |  round(stddev_samp(l_quantity), 4) AS sd_v
        |FROM lineitem
        |UNION ALL
        |SELECT 'l_extendedprice', count(l_extendedprice),
        |  count(*) - count(l_extendedprice),
        |  round(min(l_extendedprice), 4), round(max(l_extendedprice), 4),
        |  round(avg(l_extendedprice), 4), round(stddev_samp(l_extendedprice), 4)
        |FROM lineitem
        |UNION ALL
        |SELECT 'l_discount', count(l_discount), count(*) - count(l_discount),
        |  round(min(l_discount), 4), round(max(l_discount), 4),
        |  round(avg(l_discount), 4), round(stddev_samp(l_discount), 4)
        |FROM lineitem
        |ORDER BY "column"""".stripMargin,
    "q_group_topk" ->
      """WITH r AS (SELECT o_orderpriority, o_orderkey, o_totalprice,
        |  row_number() OVER (PARTITION BY o_orderpriority
        |    ORDER BY o_totalprice DESC, o_orderkey)::BIGINT AS rk
        |  FROM orders)
        |SELECT o_orderpriority, o_orderkey, o_totalprice, rk
        |FROM r WHERE rk <= 3 ORDER BY o_orderpriority, rk""".stripMargin,
    "q_key_skew" ->
      """WITH c AS (SELECT l_suppkey AS key, count(*) AS n
        |  FROM lineitem GROUP BY 1),
        |t AS (SELECT sum(n)::DOUBLE AS total, count(*)::DOUBLE AS n_keys
        |  FROM c)
        |SELECT key, n, round(n / t.total, 6) AS share,
        |  round(n * t.n_keys / t.total, 4) AS ratio_to_avg
        |FROM c, t
        |ORDER BY n DESC, key
        |LIMIT 10""".stripMargin,
    "text_top_terms" ->
      """WITH tok AS (SELECT unnest(string_split(text, ' ')) AS value
        |  FROM documents),
        |tk AS (SELECT value FROM tok WHERE value <> '')
        |SELECT value, count(*)::BIGINT AS n FROM tk GROUP BY value
        |ORDER BY n DESC, value
        |LIMIT 25""".stripMargin,
    "dedup_exact_incr" ->
      """WITH nb AS (SELECT doc_id + 1000000 AS doc_id,
        |  CASE WHEN doc_id % 4 = 0 THEN text
        |       ELSE text || ' novel tail' END AS text
        |  FROM documents WHERE doc_id % 2 = 0),
        |ch AS (SELECT DISTINCT md5(text) AS content_hash FROM documents)
        |SELECT nb.doc_id, md5(nb.text) AS content_hash,
        |  (CASE WHEN ch.content_hash IS NOT NULL THEN 1 ELSE 0 END)::BIGINT
        |    AS in_corpus
        |FROM nb LEFT JOIN ch ON md5(nb.text) = ch.content_hash
        |ORDER BY doc_id""".stripMargin,
    "text_unigram_lm" ->
      """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS t
        |  FROM documents),
        |tk AS (SELECT doc_id, t FROM tok WHERE t <> ''),
        |v AS (SELECT t, count(*)::DOUBLE AS c FROM tk GROUP BY t),
        |n AS (SELECT count(*)::DOUBLE AS total FROM tk)
        |SELECT doc_id, count(*)::BIGINT AS n_tokens,
        |  round(avg(ln(v.c / n.total)), 4) AS avg_logp
        |FROM tk JOIN v USING (t), n
        |GROUP BY doc_id
        |ORDER BY doc_id""".stripMargin,
    "text_urls" ->
      s"""WITH sp AS (SELECT doc_id,
        |  text || ' see https://d' || (doc_id % 20) || '.example.com/p/' ||
        |  doc_id || ' and http://ads' || (doc_id % 5) || '.bad.org/x' AS text
        |  FROM documents),
        |u AS (SELECT doc_id, unnest(regexp_extract_all(text,
        |  '${TextMetrics.urlPattern}', 0)) AS url FROM sp),
        |d AS (SELECT doc_id,
        |  regexp_extract(url, '^https?://([A-Za-z0-9.-]+)', 1) AS domain
        |  FROM u)
        |SELECT domain, count(DISTINCT doc_id)::BIGINT AS n_docs,
        |  count(*)::BIGINT AS n_urls,
        |  (CASE WHEN domain LIKE 'ads%.bad.org' THEN 1 ELSE 0 END)::BIGINT
        |    AS blocked
        |FROM d GROUP BY domain
        |ORDER BY domain""".stripMargin,
    "q1_pricing" ->
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 2) AS sum_qty,
        |  round(sum(l_extendedprice), 2) AS sum_base_price,
        |  round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS sum_disc_price,
        |  round(avg(l_quantity), 4) AS avg_qty,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-01'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q3_topk" ->
      """SELECT o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS order_date,
        |  round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1998-01-01'
        |  AND l_shipdate > TIMESTAMP '1996-01-01'
        |GROUP BY o_orderkey, order_date
        |ORDER BY revenue DESC, o_orderkey
        |LIMIT 10""".stripMargin,
    "q_star_join" ->
      """SELECT r_name, n_name,
        |  round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue,
        |  count(*) AS n_items
        |FROM lineitem
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name
        |ORDER BY r_name, n_name""".stripMargin,
    "q_window" ->
      """SELECT l_suppkey, rn, l_orderkey, l_linenumber, ship_date, run_qty FROM (
        |  SELECT l_suppkey,
        |    row_number() OVER w AS rn,
        |    l_orderkey, l_linenumber,
        |    strftime(l_shipdate, '%Y-%m-%d') AS ship_date,
        |    sum(l_quantity) OVER (PARTITION BY l_suppkey
        |      ORDER BY l_shipdate, l_orderkey, l_linenumber
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run_qty
        |  FROM lineitem
        |  WINDOW w AS (PARTITION BY l_suppkey
        |    ORDER BY l_shipdate, l_orderkey, l_linenumber)
        |) WHERE rn <= 5
        |ORDER BY l_suppkey, rn""".stripMargin,
    "q_anti_join" ->
      """SELECT c_custkey, c_mktsegment FROM customer c
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM orders o
        |  WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT')
        |ORDER BY c_custkey""".stripMargin,
    "q_semi_join" ->
      """SELECT p_partkey, p_brand FROM part
        |WHERE EXISTS (SELECT 1 FROM lineitem
        |  WHERE l_partkey = p_partkey AND l_quantity >= 45)
        |ORDER BY p_partkey""".stripMargin,
    "q_cube" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS rf,
        |  coalesce(l_linestatus, 'ALL') AS ls,
        |  count(*) AS n, round(sum(l_quantity), 2) AS qty
        |FROM lineitem
        |GROUP BY CUBE (l_returnflag, l_linestatus)
        |ORDER BY rf, ls""".stripMargin,
    "ann_hard_negatives" ->
      """WITH a AS (SELECT vec_id AS anchor, label AS albl,
        |    generate_subscripts(embedding, 1) AS i,
        |    unnest(embedding)::DOUBLE AS av
        |  FROM embeddings WHERE vec_id < 10),
        |e AS (SELECT vec_id, label AS nlbl,
        |    generate_subscripts(embedding, 1) AS i,
        |    unnest(embedding)::DOUBLE AS ev FROM embeddings),
        |d AS (SELECT a.anchor, a.albl, e.vec_id, e.nlbl,
        |    sum(e.ev * a.av) AS dp, sqrt(sum(e.ev * e.ev)) AS na
        |  FROM e JOIN a ON e.i = a.i GROUP BY 1, 2, 3, 4),
        |q AS (SELECT anchor, sqrt(sum(av * av)) AS nan FROM a
        |  GROUP BY anchor),
        |r AS (SELECT d.anchor, d.albl AS anchor_label,
        |    d.vec_id AS negative, d.nlbl AS negative_label,
        |    round(CASE WHEN d.na * q.nan > 0
        |      THEN d.dp / (d.na * q.nan) ELSE 0.0 END, 5) AS cosine
        |  FROM d JOIN q USING (anchor)
        |  WHERE d.nlbl <> d.albl AND d.vec_id <> d.anchor),
        |rk AS (SELECT anchor, anchor_label, negative, negative_label,
        |    cosine, row_number() OVER (PARTITION BY anchor
        |      ORDER BY cosine DESC, negative)::BIGINT AS rank FROM r)
        |SELECT anchor, anchor_label, negative, negative_label, cosine,
        |  rank
        |FROM rk WHERE rank <= 5 ORDER BY anchor, rank""".stripMargin,
    "ann_batch" ->
      """WITH q AS (
        |  SELECT vec_id AS qid, generate_subscripts(embedding, 1) AS i,
        |    unnest(embedding)::DOUBLE AS qv
        |  FROM embeddings WHERE vec_id < 5),
        |e AS (
        |  SELECT vec_id, generate_subscripts(embedding, 1) AS i,
        |    unnest(embedding)::DOUBLE AS ev
        |  FROM embeddings WHERE vec_id >= 5),
        |d AS (
        |  SELECT q.qid, e.vec_id, sum(e.ev * q.qv) AS dp,
        |    sqrt(sum(e.ev * e.ev)) AS na
        |  FROM e JOIN q ON e.i = q.i GROUP BY q.qid, e.vec_id),
        |nq AS (SELECT qid, sqrt(sum(qv * qv)) AS nqn FROM q GROUP BY qid),
        |r AS (
        |  SELECT d.qid, d.vec_id,
        |    round(CASE WHEN d.na * nq.nqn > 0
        |          THEN d.dp / (d.na * nq.nqn) ELSE 0.0 END, 5) AS cosine
        |  FROM d JOIN nq ON d.qid = nq.qid),
        |rk AS (
        |  SELECT qid, vec_id, cosine,
        |    row_number() OVER (PARTITION BY qid
        |      ORDER BY cosine DESC, vec_id) AS rank
        |  FROM r)
        |SELECT qid, vec_id, cosine, rank FROM rk
        |WHERE rank <= 5 ORDER BY qid, rank""".stripMargin,
    "q_rollup" ->
      """SELECT coalesce(o_orderstatus, 'ALL') AS status,
        |  coalesce(o_orderpriority, 'ALL') AS priority,
        |  count(*) AS n, round(sum(o_totalprice), 2) AS total
        |FROM orders
        |GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
        |ORDER BY status, priority""".stripMargin,
    "q_salted_join" ->
      """SELECT s_name, count(*) AS n_items,
        |  round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue
        |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        |GROUP BY s_name ORDER BY s_name""".stripMargin,
    "q_events_window" ->
      """SELECT strftime(time_bucket(INTERVAL '5 minutes', ts), '%Y-%m-%d %H:%M:%S')
        |    AS bucket_start,
        |  event_type, count(*) AS n, round(sum(value), 2) AS sum_value
        |FROM events
        |GROUP BY bucket_start, event_type
        |ORDER BY bucket_start, event_type""".stripMargin,
    "ebw_poststrat" ->
      """SELECT o.o_orderkey,
        |  round(((SELECT count(*) FROM orders) * 1.0 /
        |         (SELECT count(DISTINCT o_orderpriority) FROM orders)) / g.c, 6)
        |    AS new_weight
        |FROM orders o
        |JOIN (SELECT o_orderpriority, count(*) * 1.0 AS c
        |      FROM orders GROUP BY 1) g
        |  ON o.o_orderpriority = g.o_orderpriority
        |ORDER BY o.o_orderkey""".stripMargin,
    "ebw_moments_match" -> ebwMomentsOracle,
    "ebw_bounded_feasible" -> ebwMomentsOracle,
    "ebw_equalize_groups" ->
      """SELECT DISTINCT c_mktsegment AS grp,
        |  (SELECT round(avg(c_acctbal/1000.0), 4) FROM customer) AS mean_bal_k
        |FROM customer ORDER BY grp""".stripMargin,
    "ebw_lineitem" ->
      """SELECT 'm0_quantity' AS moment, round(avg(l_quantity), 5) AS value
        |FROM lineitem WHERE l_orderkey % 5 = 0
        |UNION ALL
        |SELECT 'm1_price_k' AS moment, round(avg(l_extendedprice/1000.0), 5) AS value
        |FROM lineitem WHERE l_orderkey % 5 = 0
        |UNION ALL
        |SELECT 'm2_discount' AS moment, round(avg(l_discount), 5) AS value
        |FROM lineitem WHERE l_orderkey % 5 = 0
        |ORDER BY moment""".stripMargin,
    "ebw_grouped_poststrat" ->
      """SELECT o.o_orderkey,
        |  round((s.cs * 1.0 /
        |         (SELECT count(DISTINCT o_orderpriority) FROM orders)) / g.c, 6)
        |    AS new_weight
        |FROM orders o
        |JOIN (SELECT o_orderstatus, count(*) AS cs
        |      FROM orders GROUP BY 1) s
        |  ON o.o_orderstatus = s.o_orderstatus
        |JOIN (SELECT o_orderstatus, o_orderpriority, count(*) * 1.0 AS c
        |      FROM orders GROUP BY 1, 2) g
        |  ON o.o_orderstatus = g.o_orderstatus
        | AND o.o_orderpriority = g.o_orderpriority
        |ORDER BY o.o_orderkey""".stripMargin,
    "ebw_grouped_scale" ->
      """WITH o AS (SELECT o_orderkey,
        |    (o_orderkey % 500)::VARCHAR AS grp,
        |    CASE WHEN o_orderkey % 7 < 3 THEN 'A' ELSE 'B' END AS cell
        |  FROM orders),
        |full_g AS (SELECT grp FROM o GROUP BY grp
        |           HAVING count(DISTINCT cell) = 2),
        |k AS (SELECT o.* FROM o JOIN full_g USING (grp)),
        |s AS (SELECT grp, count(*) AS n FROM k GROUP BY grp),
        |c AS (SELECT grp, cell, count(*) * 1.0 AS nc FROM k GROUP BY grp, cell)
        |SELECT k.o_orderkey, round((s.n * 0.5) / c.nc, 6) AS new_weight
        |FROM k JOIN s USING (grp)
        |JOIN c ON k.grp = c.grp AND k.cell = c.cell
        |ORDER BY k.o_orderkey""".stripMargin,
    "ebw_sparse_bigk" ->
      """SELECT o.o_orderkey,
        |  round(((SELECT count(*) FROM orders) * 1.0 /
        |         (SELECT count(DISTINCT o_orderkey % 997) FROM orders)) / g.c, 6)
        |    AS new_weight
        |FROM orders o
        |JOIN (SELECT o_orderkey % 997 AS grp, count(*) * 1.0 AS c
        |      FROM orders GROUP BY 1) g
        |  ON o.o_orderkey % 997 = g.grp
        |ORDER BY o.o_orderkey""".stripMargin,
    "dedup_exact" ->
      """SELECT md5(text) AS content_hash, min(doc_id) AS keep_id,
        |  count(*) AS n_copies
        |FROM documents GROUP BY 1 ORDER BY content_hash""".stripMargin,
    "dedup_minhash" ->
      """WITH tok AS (
        |  SELECT doc_id, str_split(text, ' ') AS tk FROM documents
        |  WHERE len(str_split(text, ' ')) >= 3),
        |sh AS (
        |  SELECT doc_id, array_to_string(tk[i:i+2], ' ') AS s
        |  FROM tok, unnest(generate_series(1, len(tk) - 2)) AS u(i)),
        |hh AS (
        |  SELECT doc_id, j, min(md5(concat(j::VARCHAR, '|', s))) AS mh
        |  FROM sh, unnest(generate_series(0, 7)) AS g(j)
        |  GROUP BY doc_id, j)
        |SELECT doc_id, string_agg(mh, '|' ORDER BY j) AS minhash_sig
        |FROM hh GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "text_tokens" ->
      """SELECT doc_id,
        |  len(str_split(text, ' '))::BIGINT AS n_ws_tokens,
        |  len(regexp_extract_all(text, '[A-Za-z0-9]+'))::BIGINT AS n_re_tokens
        |FROM documents ORDER BY doc_id""".stripMargin,
    "text_tokens_bpe" -> bpeOracle,
    "ann_topk" ->
      """WITH q AS (
        |  SELECT generate_subscripts(embedding, 1) AS i,
        |    unnest(embedding)::DOUBLE AS qv
        |  FROM embeddings WHERE vec_id = 0),
        |e AS (
        |  SELECT vec_id, generate_subscripts(embedding, 1) AS i,
        |    unnest(embedding)::DOUBLE AS ev
        |  FROM embeddings WHERE vec_id <> 0),
        |d AS (
        |  SELECT e.vec_id,
        |    sum(e.ev * q.qv) AS dp,
        |    sqrt(sum(e.ev * e.ev)) AS na
        |  FROM e JOIN q ON e.i = q.i GROUP BY e.vec_id),
        |nq AS (SELECT sqrt(sum(qv * qv)) AS nq FROM q)
        |SELECT d.vec_id,
        |  round(CASE WHEN d.na * nq.nq > 0
        |        THEN d.dp / (d.na * nq.nq) ELSE 0.0 END, 5) AS cosine
        |FROM d, nq
        |ORDER BY cosine DESC, d.vec_id
        |LIMIT 10""".stripMargin,
    "text_tfidf" ->
      """WITH nn AS (SELECT count(*) AS n FROM documents),
        |tok AS (
        |  SELECT doc_id, unnest(str_split(text, ' ')) AS term FROM documents),
        |tok2 AS (SELECT doc_id, term FROM tok WHERE term <> ''),
        |tf AS (SELECT doc_id, term, count(*) AS tf FROM tok2 GROUP BY 1, 2),
        |dfreq AS (
        |  SELECT term, count(DISTINCT doc_id) AS df FROM tok2 GROUP BY 1),
        |s AS (
        |  SELECT tf.doc_id, tf.term,
        |    round(tf.tf * ln((nn.n + 1.0) / (dfreq.df + 1.0)), 5) AS tfidf
        |  FROM tf JOIN dfreq USING (term) CROSS JOIN nn),
        |rk AS (
        |  SELECT doc_id, term, tfidf,
        |    row_number() OVER (PARTITION BY doc_id
        |      ORDER BY tfidf DESC, term) AS rank
        |  FROM s)
        |SELECT doc_id, term, tfidf, rank FROM rk
        |WHERE rank <= 3 ORDER BY doc_id, rank""".stripMargin,
    "q_stratified_sample" ->
      """WITH r AS (
        |  SELECT o_orderkey, o_orderpriority,
        |    row_number() OVER (PARTITION BY o_orderpriority
        |      ORDER BY md5(concat('42|', o_orderkey::VARCHAR)), o_orderkey)
        |      AS rn
        |  FROM orders)
        |SELECT o_orderkey, o_orderpriority FROM r
        |WHERE rn <= 50 ORDER BY o_orderkey""".stripMargin,
    "q_asof_join" ->
      """WITH c AS (SELECT event_id, user_id, ts FROM events
        |  WHERE event_type = 'click'),
        |v AS (SELECT event_id, user_id, ts, value FROM events
        |  WHERE event_type = 'view'),
        |j AS (
        |  SELECT c.event_id AS click_id, c.user_id,
        |    v.event_id AS view_id, v.value,
        |    row_number() OVER (PARTITION BY c.event_id
        |      ORDER BY v.ts DESC, v.event_id DESC) AS rn
        |  FROM c JOIN v ON c.user_id = v.user_id AND v.ts <= c.ts)
        |SELECT click_id, user_id, view_id, round(value, 2) AS view_value
        |FROM j WHERE rn = 1 ORDER BY click_id""".stripMargin,
    "q_asof_bucketed" ->
      """WITH c AS (SELECT event_id, user_id, epoch_us(ts) AS us FROM events
        |  WHERE event_type = 'click'),
        |v AS (SELECT event_id, user_id, epoch_us(ts) AS us, value FROM events
        |  WHERE event_type = 'view'),
        |j AS (
        |  SELECT c.event_id AS click_id, c.user_id,
        |    v.event_id AS view_id, v.value,
        |    row_number() OVER (PARTITION BY c.event_id
        |      ORDER BY v.us DESC, v.event_id DESC) AS rn
        |  FROM c JOIN v ON c.user_id = v.user_id AND v.us <= c.us
        |    AND c.us - v.us <= 1800000000)
        |SELECT click_id, user_id, view_id, round(value, 2) AS view_value
        |FROM j WHERE rn = 1 ORDER BY click_id""".stripMargin,
    // chain edges (d, d+1) for d%20<7 over contiguous doc_ids partition the
    // participants into islands {20k..20k+7}; the component minimum is the
    // closed form id - id%20. ASSUMES doc_ids are contiguous 0..N-1 with
    // N%20 == 0 (true of all driver-generated SFs: 500/500/5000, verified
    // 2026-08-12; a regenerated table breaking this shows up as a
    // boundary-island diff here, not an algorithm bug)
    "dedup_components" ->
      """SELECT a.doc_id AS id, a.doc_id - a.doc_id % 20 AS component
        |FROM documents a
        |WHERE a.doc_id % 20 <= 7
        |ORDER BY id""".stripMargin,
    // incremental fold over the same chain islands must land on the same
    // closed-form labeling as the one-shot computation
    "dedup_components_incr" ->
      """SELECT a.doc_id AS id, a.doc_id - a.doc_id % 20 AS component
        |FROM documents a
        |WHERE a.doc_id % 20 <= 7
        |ORDER BY id""".stripMargin,
    "dedup_simhash" -> simhashOracle,
    "dedup_simhash_pairs" -> simhashPairsOracle,
    "dedup_minhash_pairs" -> minhashPairsOracle,
    "dedup_lsh_eval" -> lshEvalOracle,
    "dedup_minhash_incr" -> minhashIncrOracle,
    "dedup_paragraph" ->
      """WITH base AS (
        |  SELECT doc_id,
        |    regexp_replace(text, '((\S+ ){9}\S+) ', '\1 <p> ', 'g') AS text
        |  FROM documents
        |  UNION ALL
        |  SELECT doc_id + 1000000 AS doc_id,
        |    regexp_replace(text, '((\S+ ){9}\S+) ', '\1 <p> ', 'g')
        |      || ' <p> unique suffix ' || doc_id::VARCHAR AS text
        |  FROM documents),
        |pp AS (SELECT doc_id, str_split(text, ' <p> ') AS ps FROM base),
        |inst AS (
        |  SELECT doc_id, i - 1 AS pos, ps[i] AS para, md5(ps[i]) AS h,
        |    doc_id * 1000000 + (i - 1) AS ord
        |  FROM pp, unnest(generate_series(1, len(ps))) AS u(i)
        |  WHERE len(trim(ps[i])) > 0),
        |win AS (SELECT h, min(ord) AS keep_ord FROM inst GROUP BY h)
        |SELECT inst.doc_id,
        |  count(*) AS n_paragraphs_kept,
        |  string_agg(para, ' <p> ' ORDER BY pos) AS text_dedup
        |FROM inst JOIN win ON inst.h = win.h AND inst.ord = win.keep_ord
        |GROUP BY inst.doc_id
        |ORDER BY doc_id""".stripMargin,
    "text_pii" ->
      """WITH spiked AS (
        |  SELECT doc_id,
        |    text || ' contact user' || CAST(doc_id AS VARCHAR)
        |      || '@example.com from 10.0.' || CAST(doc_id % 256 AS VARCHAR)
        |      || '.7 or call 555-867-'
        |      || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS text
        |  FROM documents)
        |SELECT doc_id,
        |  len(regexp_extract_all(text,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))::BIGINT AS n_email,
        |  len(regexp_extract_all(text,
        |    '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b'))::BIGINT AS n_ipv4,
        |  len(regexp_extract_all(text,
        |    '\b\d{3}[-. ]\d{3}[-. ]\d{4}\b'))::BIGINT AS n_phone,
        |  regexp_replace(regexp_replace(regexp_replace(text,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |    '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g'),
        |    '\b\d{3}[-. ]\d{3}[-. ]\d{4}\b', '<PHONE>', 'g') AS text_scrubbed
        |FROM spiked ORDER BY doc_id""".stripMargin,
    "q_array_agg" ->
      """SELECT o_orderpriority,
        |  array_to_string(list_sort(list(DISTINCT o_orderstatus)), ',')
        |    AS statuses,
        |  count(DISTINCT o_orderstatus) AS n_statuses
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q_json_extract" ->
      """WITH m AS (
        |  SELECT doc_id,
        |    '{"doc": {"id": ' || CAST(doc_id AS VARCHAR) || ', "lang": "'
        |      || lang || '"}, "n_chars": ' || CAST(n_chars AS VARCHAR)
        |      || '}' AS meta
        |  FROM documents)
        |SELECT doc_id,
        |  json_extract_string(meta, '$.doc.lang') AS lang_j,
        |  CAST(json_extract_string(meta, '$.doc.id') AS BIGINT) AS id_j,
        |  CAST(json_extract_string(meta, '$.n_chars') AS BIGINT) AS nc_j
        |FROM m ORDER BY doc_id""".stripMargin,
    "q_window_range" ->
      """WITH daily AS (
        |  SELECT l_suppkey, CAST(l_shipdate AS DATE) AS d,
        |    sum(l_extendedprice) AS rev
        |  FROM lineitem
        |  WHERE l_suppkey < 10 AND l_shipdate < TIMESTAMP '1996-01-01'
        |  GROUP BY 1, 2)
        |SELECT l_suppkey, strftime(d, '%Y-%m-%d') AS day,
        |  round(sum(rev) OVER (PARTITION BY l_suppkey
        |    ORDER BY datediff('day', DATE '1995-01-01', d)
        |    RANGE BETWEEN 6 PRECEDING AND CURRENT ROW), 2) AS rev_7d
        |FROM daily ORDER BY l_suppkey, day""".stripMargin,
    "q_stats_agg" ->
      """SELECT l_returnflag,
        |  round(corr(l_quantity, l_extendedprice), 6) AS corr_qp,
        |  round(covar_samp(l_quantity, l_extendedprice), 2) AS covar_qp,
        |  round(stddev_samp(l_quantity), 4) AS sd_q,
        |  round(avg(l_quantity), 4) AS avg_q
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q_setops" ->
      """WITH a AS (SELECT l_partkey FROM lineitem WHERE l_quantity >= 48),
        |b AS (SELECT l_partkey FROM lineitem WHERE l_discount <= 0.01),
        |i AS (SELECT l_partkey FROM a INTERSECT SELECT l_partkey FROM b),
        |e AS (SELECT l_partkey FROM a EXCEPT SELECT l_partkey FROM b)
        |SELECT 'intersect' AS op, l_partkey FROM i
        |UNION ALL
        |SELECT 'except' AS op, l_partkey FROM e
        |ORDER BY op, l_partkey""".stripMargin,
    "q_sql_exists" -> sqlExistsText,
    "q_sql_lateral" -> sqlLateralText,
    "q_grouping_sets" -> sqlGroupingSetsText,
    "q_setops_all" ->
      """SELECT 'intersect_all' AS op, l_partkey FROM (
        |  SELECT l_partkey FROM lineitem WHERE l_quantity >= 48
        |  INTERSECT ALL
        |  SELECT l_partkey FROM lineitem WHERE l_discount <= 0.01)
        |UNION ALL
        |SELECT 'except_all' AS op, l_partkey FROM (
        |  SELECT l_partkey FROM lineitem WHERE l_quantity >= 48
        |  EXCEPT ALL
        |  SELECT l_partkey FROM lineitem WHERE l_discount <= 0.01)
        |ORDER BY op, l_partkey""".stripMargin,
    "q_sessionize" ->
      """WITH e AS (
        |  SELECT user_id, event_id, ts, value,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |           OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE
        |         THEN 1 ELSE 0 END AS brk
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |s AS (
        |  SELECT user_id, ts, value,
        |    sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |  FROM e)
        |SELECT user_id,
        |  strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
        |  strftime(max(ts) + INTERVAL 30 MINUTE, '%Y-%m-%d %H:%M:%S')
        |    AS session_end,
        |  count(*) AS n_events, round(sum(value), 2) AS sum_value
        |FROM s GROUP BY user_id, sid
        |ORDER BY user_id, session_start""".stripMargin,
    "q_window_nav" ->
      """SELECT l_suppkey,
        |  strftime(l_shipdate, '%Y-%m-%d') AS ship_date,
        |  l_orderkey, l_linenumber,
        |  lag(l_quantity) OVER w AS prev_qty,
        |  lead(l_quantity) OVER w AS next_qty,
        |  rank() OVER wq AS qty_rank,
        |  dense_rank() OVER wq AS qty_drank,
        |  ntile(4) OVER w AS bucket4
        |FROM lineitem
        |WHERE l_suppkey < 10
        |WINDOW
        |  w AS (PARTITION BY l_suppkey
        |    ORDER BY l_shipdate, l_orderkey, l_linenumber),
        |  wq AS (PARTITION BY l_suppkey ORDER BY l_quantity)
        |ORDER BY l_suppkey, l_orderkey, l_linenumber""".stripMargin,
    "q_full_outer" ->
      """WITH o AS (
        |  SELECT o_custkey, count(*) AS n_orders,
        |    round(sum(o_totalprice), 2) AS total
        |  FROM orders WHERE o_orderpriority = '1-URGENT'
        |  GROUP BY o_custkey),
        |c AS (
        |  SELECT c_custkey, c_mktsegment FROM customer
        |  WHERE c_mktsegment = 'BUILDING')
        |SELECT coalesce(o_custkey, c_custkey) AS custkey,
        |  CASE WHEN o_custkey IS NOT NULL AND c_custkey IS NOT NULL THEN 'both'
        |       WHEN o_custkey IS NOT NULL THEN 'orders_only'
        |       ELSE 'building_only' END AS side,
        |  n_orders, total, c_mktsegment
        |FROM o FULL OUTER JOIN c ON o_custkey = c_custkey
        |ORDER BY custkey""".stripMargin,
    "text_strip_html" ->
      """WITH spiked AS (
        |  SELECT doc_id,
        |    '<html><body class="c">' || text
        |      || '</p><br/> &amp; tail &lt;b&gt; &quot;q&quot; &#39;s&#39; &amp;lt;keep&amp;gt;'
        |      AS text
        |  FROM documents),
        |stripped AS (
        |  SELECT doc_id, trim(regexp_replace(
        |    replace(replace(replace(replace(replace(
        |      regexp_replace(text, '<[^>]*>', ' ', 'g'),
        |      '&lt;', '<'), '&gt;', '>'), '&quot;', '"'), '&#39;', ''''),
        |      '&amp;', '&'),
        |    ' +', ' ', 'g')) AS text_plain
        |  FROM spiked)
        |SELECT doc_id, text_plain,
        |  length(text_plain)::BIGINT AS n_chars_plain
        |FROM stripped ORDER BY doc_id""".stripMargin,
    "text_chunk" ->
      """SELECT doc_id, i AS chunk_id, i * 32 AS chunk_start,
        |  substr(text, i * 32 + 1, 64) AS chunk_text,
        |  length(substr(text, i * 32 + 1, 64))::BIGINT AS n_chunk_chars
        |FROM documents,
        |  unnest(generate_series(0, (length(text) - 1) // 32)) AS u(i)
        |WHERE length(text) >= 1
        |ORDER BY doc_id, chunk_id""".stripMargin,
    "text_pack" ->
      """WITH b AS (
        |  SELECT doc_id, doc_id % 16 AS shard,
        |    len(str_split(text, ' '))::BIGINT AS n_tokens
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, shard, n_tokens,
        |    (sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))::BIGINT
        |      AS cum_tokens
        |  FROM b)
        |SELECT doc_id, shard, n_tokens, cum_tokens,
        |  (cum_tokens - n_tokens) // 256 AS bin,
        |  cum_tokens - n_tokens - ((cum_tokens - n_tokens) // 256) * 256
        |    AS bin_offset
        |FROM c ORDER BY doc_id""".stripMargin,
    "q_pivot" ->
      """SELECT o_orderpriority AS priority,
        |  round(sum(CASE WHEN year(o_orderdate) = 1995 THEN o_totalprice END), 2)
        |    AS rev_1995,
        |  round(sum(CASE WHEN year(o_orderdate) = 1996 THEN o_totalprice END), 2)
        |    AS rev_1996,
        |  round(sum(CASE WHEN year(o_orderdate) = 1997 THEN o_totalprice END), 2)
        |    AS rev_1997
        |FROM orders GROUP BY o_orderpriority ORDER BY priority""".stripMargin,
    "text_normalize" ->
      """SELECT doc_id,
        |  trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),
        |    ' +', ' ', 'g')) AS text_norm,
        |  len(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),
        |    ' +', ' ', 'g'))) AS n_chars_norm
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q_group_distinct" ->
      """SELECT o_orderpriority AS grp,
        |  count(DISTINCT o_custkey) AS n_distinct,
        |  count(o_custkey) AS n_values,
        |  count(*) AS n_rows
        |FROM orders GROUP BY o_orderpriority ORDER BY grp""".stripMargin,
    "q_group_quantiles" ->
      """WITH a AS (
        |  SELECT o_orderpriority AS grp,
        |    quantile_cont(o_totalprice, [0.25, 0.5, 0.75, 0.95]) AS vs,
        |    count(*) AS n
        |  FROM orders GROUP BY 1)
        |SELECT grp, CAST(([0.25, 0.5, 0.75, 0.95])[i] AS DOUBLE) AS q,
        |  round(vs[i], 4) AS value, n
        |FROM a, unnest(generate_series(1, 4)) AS u(i)
        |ORDER BY grp, q""".stripMargin,
    "text_contamination" ->
      """WITH tok AS (
        |  SELECT doc_id, str_split(text, ' ') AS tk FROM documents
        |  WHERE len(str_split(text, ' ')) >= 8),
        |gx AS (
        |  SELECT DISTINCT doc_id, array_to_string(tk[i:i+7], ' ') AS g
        |  FROM tok, unnest(generate_series(1, len(tk) - 7)) AS u(i)),
        |bg AS (SELECT DISTINCT g FROM gx WHERE doc_id % 25 = 0),
        |tot AS (SELECT doc_id, count(*) AS n_ngrams FROM gx GROUP BY 1),
        |mt AS (SELECT doc_id, count(*) AS n_matched
        |  FROM gx JOIN bg USING (g) GROUP BY 1)
        |SELECT t.doc_id, t.n_ngrams, coalesce(m.n_matched, 0) AS n_matched,
        |  round(coalesce(m.n_matched, 0) * 1.0 / t.n_ngrams, 6)
        |    AS contamination_frac
        |FROM tot t LEFT JOIN mt m USING (doc_id)
        |ORDER BY t.doc_id""".stripMargin,
    "dedup_ngram_jaccard" -> ngramJaccardOracle,
    "dedup_embed_cosine" -> embedCosineOracle,
    "text_langid" -> langidOracle,
    "text_fingerprint" ->
      """SELECT doc_id, substr(md5(text), 1, 16) AS fingerprint
        |FROM documents ORDER BY doc_id""".stripMargin,
    "text_repetition" ->
      """WITH tok AS (
        |  SELECT doc_id, str_split(text, ' ') AS tk FROM documents
        |  WHERE len(str_split(text, ' ')) >= 3),
        |sh AS (
        |  SELECT doc_id, array_to_string(tk[i:i+2], ' ') AS s
        |  FROM tok, unnest(generate_series(1, len(tk) - 2)) AS u(i))
        |SELECT doc_id, count(*)::BIGINT AS n_shingles,
        |  count(DISTINCT s)::BIGINT AS n_distinct,
        |  round(1.0 - count(DISTINCT s) * 1.0 / count(*), 4) AS dup_3gram_frac
        |FROM sh GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "text_repetition_full" -> repetitionFullOracle,
    "ann_lsh" -> annLshOracle,
    "ebw_penalty" -> ebwPenaltyOracle,
    "ebw_grouped_penalty" -> ebwGroupedPenaltyOracle,
    "text_quality" ->
      """SELECT doc_id,
        |  length(text)::BIGINT AS n_chars_m,
        |  (length(text) - length(replace(text, ' ', '')) + 1)::BIGINT AS n_tokens,
        |  round((length(text) - (length(text) - length(replace(text, ' ', ''))))
        |    * 1.0 / (length(text) - length(replace(text, ' ', '')) + 1), 4)
        |    AS avg_token_len,
        |  round(least((length(text) - length(replace(text, ' ', '')) + 1) * 1.0
        |    / 20.0, 1.0), 4) AS quality
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q_mixture_sample" -> mixtureSampleOracle,
    "dedup_components_elect" ->
      // winners: per chain island the (quality desc, id asc) best among
      // labeled members; unlabeled docs (doc_id % 20 > 7) pass through
      """WITH q AS (SELECT doc_id, (doc_id * 37) % 100 AS quality
        |  FROM documents),
        |ranked AS (
        |  SELECT doc_id, quality,
        |    row_number() OVER (PARTITION BY doc_id - doc_id % 20
        |      ORDER BY quality DESC, doc_id) AS rn
        |  FROM q WHERE doc_id % 20 <= 7)
        |SELECT doc_id, quality FROM ranked WHERE rn = 1
        |UNION ALL
        |SELECT doc_id, quality FROM q WHERE doc_id % 20 > 7
        |ORDER BY doc_id""".stripMargin,
    "q_shard_assign" ->
      """WITH h AS (SELECT o_orderkey,
        |    md5(concat('42|', o_orderkey::VARCHAR)) AS hh FROM orders),
        |a AS (SELECT o_orderkey, hh,
        |    CAST(('0x' || substring(hh, 1, 6)) AS BIGINT) % 8 AS shard
        |  FROM h)
        |SELECT shard,
        |  (row_number() OVER (PARTITION BY shard ORDER BY hh, o_orderkey))
        |    ::BIGINT AS shard_pos,
        |  o_orderkey
        |FROM a ORDER BY shard, shard_pos""".stripMargin,
    "q_fuzzy_join" ->
      """SELECT a.c_custkey AS id_a, b.c_custkey AS id_b,
        |  a.c_nationkey,
        |  levenshtein(a.c_name, b.c_name)::BIGINT AS dist
        |FROM customer a JOIN customer b
        |  ON a.c_nationkey = b.c_nationkey AND a.c_custkey < b.c_custkey
        |WHERE levenshtein(a.c_name, b.c_name) <= 2
        |ORDER BY id_a, id_b""".stripMargin,
    "q_zorder" -> zorderOracle,
    "q_zone_map" -> zoneMapOracle,
    "q_asof_forward" ->
      """WITH c AS (SELECT event_id, user_id, ts FROM events
        |  WHERE event_type = 'click'),
        |v AS (SELECT event_id, user_id, ts, value FROM events
        |  WHERE event_type = 'view'),
        |j AS (
        |  SELECT c.event_id AS click_id, c.user_id,
        |    v.event_id AS view_id, v.value,
        |    row_number() OVER (PARTITION BY c.event_id
        |      ORDER BY v.ts ASC, v.event_id ASC) AS rn
        |  FROM c JOIN v ON c.user_id = v.user_id AND v.ts >= c.ts)
        |SELECT click_id, user_id, view_id, round(value, 2) AS view_value
        |FROM j WHERE rn = 1 ORDER BY click_id""".stripMargin,
    "q_ks_test" ->
      """WITH a AS (SELECT round(n_chars::DOUBLE, 4) AS v FROM documents
        |  WHERE lang = 'en' AND n_chars IS NOT NULL),
        |b AS (SELECT round(n_chars::DOUBLE, 4) AS v FROM documents
        |  WHERE lang <> 'en' AND n_chars IS NOT NULL),
        |ca AS (SELECT v, count(*)::BIGINT AS c FROM a GROUP BY v),
        |cb AS (SELECT v, count(*)::BIGINT AS c FROM b GROUP BY v),
        |m AS (SELECT v, coalesce(ca.c, 0) AS cca,
        |    coalesce(cb.c, 0) AS ccb
        |  FROM ca FULL OUTER JOIN cb USING (v)),
        |t AS (SELECT sum(cca)::BIGINT AS na, sum(ccb)::BIGINT AS nb
        |  FROM m),
        |wlk AS (SELECT v, round(abs(
        |    sum(cca) OVER win / t.na::DOUBLE
        |      - sum(ccb) OVER win / t.nb::DOUBLE), 6) AS d
        |  FROM m, t WINDOW win AS (ORDER BY v
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |mx AS (SELECT max(d) AS md FROM wlk)
        |SELECT t.na AS n_a, t.nb AS n_b, round(mx.md, 4) AS d_stat,
        |  round((SELECT min(v) FROM wlk WHERE wlk.d = mx.md), 4)
        |    AS d_at,
        |  round(1.358 * sqrt((t.na + t.nb) / (t.na * t.nb)::DOUBLE), 4)
        |    AS d_crit95,
        |  round(mx.md, 4)
        |    > round(1.358 * sqrt((t.na + t.nb)
        |      / (t.na * t.nb)::DOUBLE), 4) AS significant
        |FROM t, mx""".stripMargin,
    "q_qq_compare" ->
      """WITH a AS (SELECT n_chars::DOUBLE AS x FROM documents
        |  WHERE lang = 'en' AND n_chars IS NOT NULL),
        |b AS (SELECT n_chars::DOUBLE AS x FROM documents
        |  WHERE lang <> 'en' AND n_chars IS NOT NULL),
        |qa AS (SELECT [quantile_cont(x, 0.1), quantile_cont(x, 0.2),
        |    quantile_cont(x, 0.3), quantile_cont(x, 0.4),
        |    quantile_cont(x, 0.5), quantile_cont(x, 0.6),
        |    quantile_cont(x, 0.7), quantile_cont(x, 0.8),
        |    quantile_cont(x, 0.9)] AS cs FROM a),
        |qb AS (SELECT [quantile_cont(x, 0.1), quantile_cont(x, 0.2),
        |    quantile_cont(x, 0.3), quantile_cont(x, 0.4),
        |    quantile_cont(x, 0.5), quantile_cont(x, 0.6),
        |    quantile_cont(x, 0.7), quantile_cont(x, 0.8),
        |    quantile_cont(x, 0.9)] AS cs FROM b)
        |SELECT round(p / 10.0, 4) AS p, round(qa.cs[p], 4) AS q_a,
        |  round(qb.cs[p], 4) AS q_b,
        |  round(qb.cs[p] - qa.cs[p], 4) + 0.0 AS gap
        |FROM unnest(generate_series(1, 9)) AS u(p), qa, qb
        |ORDER BY p""".stripMargin,
    "q_pareto_tail" ->
      """SELECT 300000.0 AS xmin,
        |  count(*) FILTER (WHERE o_totalprice >= 300000.0)::BIGINT
        |    AS n_tail,
        |  count(*)::BIGINT AS n_total,
        |  round(count(*) FILTER (WHERE o_totalprice >= 300000.0)
        |    / count(*)::DOUBLE, 4) AS tail_frac,
        |  CASE WHEN count(*) FILTER (WHERE o_totalprice >= 300000.0) >= 2
        |      AND sum(CASE WHEN o_totalprice >= 300000.0
        |        THEN ln(o_totalprice::DOUBLE / 300000.0) END) > 0
        |    THEN round(1.0
        |      + count(*) FILTER (WHERE o_totalprice >= 300000.0)
        |      / sum(CASE WHEN o_totalprice >= 300000.0
        |        THEN ln(o_totalprice::DOUBLE / 300000.0) END), 4)
        |  END AS alpha,
        |  CASE WHEN count(*) FILTER (WHERE o_totalprice >= 300000.0) >= 2
        |      AND sum(CASE WHEN o_totalprice >= 300000.0
        |        THEN ln(o_totalprice::DOUBLE / 300000.0) END) > 0
        |    THEN round(count(*) FILTER (WHERE o_totalprice >= 300000.0)
        |      / sum(CASE WHEN o_totalprice >= 300000.0
        |        THEN ln(o_totalprice::DOUBLE / 300000.0) END)
        |      / sqrt(count(*) FILTER (WHERE o_totalprice >= 300000.0)
        |        ::DOUBLE), 4)
        |  END AS se
        |FROM orders WHERE o_totalprice IS NOT NULL""".stripMargin,
    "q_survival" ->
      """WITH e AS (SELECT user_id AS u, epoch_us(ts)::BIGINT AS t,
        |    event_type AS ty FROM events),
        |per AS (SELECT u, min(t) AS f, max(t) AS l,
        |    min(CASE WHEN ty = 'purchase' THEN t END) AS fp
        |  FROM e GROUP BY u),
        |subj AS (SELECT u % 3 AS cohort,
        |    (coalesce(fp, l) - f) // 86400000000 AS t,
        |    fp IS NOT NULL AS ev FROM per),
        |at AS (SELECT cohort, t::DOUBLE AS t,
        |    count(*) FILTER (WHERE ev)::BIGINT AS d,
        |    count(*) FILTER (WHERE NOT ev)::BIGINT AS c
        |  FROM subj GROUP BY 1, 2),
        |tot AS (SELECT cohort, count(*)::BIGINT AS n FROM subj
        |  GROUP BY cohort),
        |risk AS (SELECT at.cohort, at.t, at.d, at.c,
        |    tot.n - coalesce(sum(at.d + at.c) OVER (PARTITION BY at.cohort
        |      ORDER BY at.t ROWS BETWEEN UNBOUNDED PRECEDING
        |      AND 1 PRECEDING), 0) AS n_at_risk
        |  FROM at JOIN tot USING (cohort)),
        |km AS (SELECT cohort, t, n_at_risk, d, c,
        |    max(CASE WHEN d = n_at_risk THEN 1 ELSE 0 END)
        |      OVER win AS dead,
        |    sum(CASE WHEN d > 0 AND d < n_at_risk
        |      THEN ln(1 - d / n_at_risk::DOUBLE)
        |      ELSE 0.0 END) OVER win AS lsum
        |  FROM risk WINDOW win AS (PARTITION BY cohort ORDER BY t
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
        |SELECT cohort, t, n_at_risk::BIGINT AS n_at_risk,
        |  d AS d_events, c AS c_censored,
        |  CASE WHEN dead = 1 THEN 0.0 ELSE round(exp(lsum), 4) END
        |    AS survival
        |FROM km ORDER BY cohort, t""".stripMargin,
    "q_chi_square" ->
      """WITH j AS (SELECT lang::VARCHAR AS a, source::VARCHAR AS b,
        |    count(*)::BIGINT AS c FROM documents
        |  WHERE lang IS NOT NULL AND source IS NOT NULL GROUP BY 1, 2),
        |ma AS (SELECT a, sum(c)::DOUBLE AS ca FROM j GROUP BY a),
        |mb AS (SELECT b, sum(c)::DOUBLE AS cb FROM j GROUP BY b),
        |t AS (SELECT sum(c)::DOUBLE AS n FROM j),
        |agg AS (SELECT max(t.n)::BIGINT AS n,
        |    count(DISTINCT j.a)::BIGINT AS n_a,
        |    count(DISTINCT j.b)::BIGINT AS n_b,
        |    sum(pow(j.c - ma.ca * mb.cb / t.n, 2)
        |      / (ma.ca * mb.cb / t.n) - ma.ca * mb.cb / t.n)
        |      + max(t.n) AS chi2
        |  FROM j JOIN ma USING (a) JOIN mb USING (b), t)
        |SELECT n, n_a, n_b, (n_a - 1) * (n_b - 1) AS dof,
        |  round(CASE WHEN n_a > 1 AND n_b > 1 THEN chi2 ELSE 0.0 END, 4)
        |    AS chi2,
        |  round(CASE WHEN n_a > 1 AND n_b > 1
        |    THEN sqrt(greatest(0.0, chi2)
        |      / (n * least(n_a - 1, n_b - 1)))
        |    ELSE 0.0 END, 4) AS cramers_v
        |FROM agg""".stripMargin,
    "q_attribution" ->
      """WITH e AS (SELECT user_id AS u, epoch_us(ts)::BIGINT AS t,
        |    event_id AS eid, event_type AS ty FROM events
        |  WHERE event_type IN ('purchase', 'view', 'click', 'signup')),
        |k AS (SELECT u, t, eid,
        |    CASE WHEN ty = 'purchase' THEN 1 ELSE 0 END AS kind,
        |    CASE WHEN ty <> 'purchase' THEN ty END AS ch FROM e),
        |wv AS (SELECT *, last_value(ch IGNORE NULLS) OVER win AS lc,
        |    last_value(CASE WHEN ch IS NOT NULL THEN t END IGNORE NULLS)
        |      OVER win AS lt
        |  FROM k WINDOW win AS (PARTITION BY u ORDER BY t, kind, eid
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING))
        |SELECT eid AS event_id, u AS user_id, t AS conv_ts,
        |  CASE WHEN t - lt <= 7200000000 THEN lc END AS channel,
        |  CASE WHEN t - lt <= 7200000000 THEN lt END AS channel_ts,
        |  CASE WHEN t - lt <= 7200000000 THEN t - lt END AS gap_us
        |FROM wv WHERE kind = 1 ORDER BY event_id""".stripMargin,
    "q_reconcile" ->
      """WITH a0 AS (SELECT o_orderkey, o_totalprice, o_orderstatus
        |  FROM orders),
        |b0 AS (SELECT o_orderkey,
        |    CASE WHEN o_orderkey % 101 = 0 THEN o_totalprice + 1
        |    ELSE o_totalprice END AS o_totalprice, o_orderstatus
        |  FROM orders WHERE o_orderkey % 97 <> 0),
        |ha AS (SELECT
        |    CAST(('0x' || substring(md5(o_orderkey::VARCHAR), 1, 4))
        |      AS BIGINT) % 32 AS bucket,
        |    CAST(('0x' || substring(md5(concat_ws('|',
        |      CASE WHEN o_orderkey IS NULL THEN 'n'
        |        ELSE 'v' || o_orderkey::VARCHAR END,
        |      CASE WHEN o_totalprice IS NULL THEN 'n'
        |        ELSE 'v' || o_totalprice::VARCHAR END,
        |      CASE WHEN o_orderstatus IS NULL THEN 'n'
        |        ELSE 'v' || o_orderstatus END)), 1, 8))
        |      AS BIGINT) AS h FROM a0),
        |hb AS (SELECT
        |    CAST(('0x' || substring(md5(o_orderkey::VARCHAR), 1, 4))
        |      AS BIGINT) % 32 AS bucket,
        |    CAST(('0x' || substring(md5(concat_ws('|',
        |      CASE WHEN o_orderkey IS NULL THEN 'n'
        |        ELSE 'v' || o_orderkey::VARCHAR END,
        |      CASE WHEN o_totalprice IS NULL THEN 'n'
        |        ELSE 'v' || o_totalprice::VARCHAR END,
        |      CASE WHEN o_orderstatus IS NULL THEN 'n'
        |        ELSE 'v' || o_orderstatus END)), 1, 8))
        |      AS BIGINT) AS h FROM b0),
        |ga AS (SELECT bucket, count(*)::BIGINT AS n_a,
        |    sum(h)::BIGINT AS sum_a FROM ha GROUP BY bucket),
        |gb AS (SELECT bucket, count(*)::BIGINT AS n_b,
        |    sum(h)::BIGINT AS sum_b FROM hb GROUP BY bucket)
        |SELECT bucket, coalesce(n_a, 0) AS n_a, coalesce(n_b, 0) AS n_b,
        |  coalesce(sum_a, 0) AS sum_a, coalesce(sum_b, 0) AS sum_b,
        |  coalesce(n_a, 0) = coalesce(n_b, 0)
        |    AND coalesce(sum_a, 0) = coalesce(sum_b, 0) AS matches
        |FROM ga FULL OUTER JOIN gb USING (bucket)
        |ORDER BY bucket""".stripMargin,
    "q_ab_welch" ->
      """WITH x AS (SELECT source, n_chars::DOUBLE AS x FROM documents
        |  WHERE source IN ('src1', 'src8') AND n_chars IS NOT NULL),
        |a AS (SELECT count(*)::BIGINT AS n_a, avg(x) AS ma,
        |    var_samp(x) AS va FROM x WHERE source = 'src1'),
        |b AS (SELECT count(*)::BIGINT AS n_b, avg(x) AS mb,
        |    var_samp(x) AS vb FROM x WHERE source = 'src8')
        |SELECT n_a, n_b, round(ma, 4) AS mean_a, round(mb, 4) AS mean_b,
        |  round(ma - mb, 4) + 0.0 AS diff,
        |  CASE WHEN n_a >= 2 AND n_b >= 2 AND (va / n_a + vb / n_b) > 0
        |    THEN round((ma - mb) / sqrt(va / n_a + vb / n_b), 4) + 0.0
        |  END AS t_stat,
        |  CASE WHEN n_a >= 2 AND n_b >= 2 AND (va / n_a + vb / n_b) > 0
        |    THEN round(pow(va / n_a + vb / n_b, 2)
        |      / (pow(va / n_a, 2) / (n_a - 1)
        |        + pow(vb / n_b, 2) / (n_b - 1)), 2)
        |  END AS df,
        |  coalesce(CASE WHEN n_a >= 2 AND n_b >= 2
        |      AND (va / n_a + vb / n_b) > 0
        |    THEN abs((ma - mb) / sqrt(va / n_a + vb / n_b)) > 1.96
        |  END, false) AS significant
        |FROM a, b""".stripMargin,
    "q_gains_table" -> (classifierEvalCte +
      """base AS (SELECT score AS s, label AS y FROM sc
        |  WHERE score IS NOT NULL),
        |cuts AS (SELECT [quantile_cont(s, 0.1), quantile_cont(s, 0.2),
        |    quantile_cont(s, 0.3), quantile_cont(s, 0.4),
        |    quantile_cont(s, 0.5), quantile_cont(s, 0.6),
        |    quantile_cont(s, 0.7), quantile_cont(s, 0.8),
        |    quantile_cont(s, 0.9)] AS cs FROM base),
        |binned AS (SELECT 1 + len(list_filter(cs, c -> c >= s)) AS decile,
        |    y FROM base, cuts),
        |pb AS (SELECT decile, count(*)::BIGINT AS n,
        |    count(*) FILTER (WHERE y)::BIGINT AS n_pos
        |  FROM binned GROUP BY decile),
        |tt AS (SELECT sum(n)::DOUBLE AS tn, sum(n_pos)::DOUBLE AS tp
        |  FROM pb),
        |cum AS (SELECT decile, n, n_pos,
        |    sum(n) OVER (ORDER BY decile ROWS UNBOUNDED PRECEDING) AS cn,
        |    sum(n_pos) OVER (ORDER BY decile ROWS UNBOUNDED PRECEDING)
        |      AS cp FROM pb)
        |SELECT decile::BIGINT AS decile, n, n_pos,
        |  round(n_pos / n::DOUBLE, 4) AS pos_rate,
        |  round(CASE WHEN tp > 0 THEN cp / tp ELSE 0.0 END, 4) AS cum_gain,
        |  round(CASE WHEN tp > 0 THEN (cp / tp) / (cn / tn)
        |    ELSE 0.0 END, 4) AS lift
        |FROM cum, tt ORDER BY decile""".stripMargin),
    "q_corr_matrix" ->
      """SELECT * FROM (
        |  SELECT 'l_quantity' AS col_a, 'l_extendedprice' AS col_b,
        |    count(*)::BIGINT AS n_pairs,
        |    round(corr(l_quantity, l_extendedprice), 4) + 0.0 AS corr
        |  FROM lineitem UNION ALL
        |  SELECT 'l_quantity', 'l_discount', count(*)::BIGINT,
        |    round(corr(l_quantity, l_discount), 4) + 0.0 FROM lineitem
        |  UNION ALL
        |  SELECT 'l_quantity', 'l_tax', count(*)::BIGINT,
        |    round(corr(l_quantity, l_tax), 4) + 0.0 FROM lineitem
        |  UNION ALL
        |  SELECT 'l_extendedprice', 'l_discount', count(*)::BIGINT,
        |    round(corr(l_extendedprice, l_discount), 4) + 0.0 FROM lineitem
        |  UNION ALL
        |  SELECT 'l_extendedprice', 'l_tax', count(*)::BIGINT,
        |    round(corr(l_extendedprice, l_tax), 4) + 0.0 FROM lineitem
        |  UNION ALL
        |  SELECT 'l_discount', 'l_tax', count(*)::BIGINT,
        |    round(corr(l_discount, l_tax), 4) + 0.0 FROM lineitem)
        |ORDER BY col_a, col_b""".stripMargin,
    "text_rake" ->
      """WITH raw AS (SELECT doc_id,
        |    list_filter(string_split(text, ' '), x -> x <> '') AS l
        |  FROM documents),
        |tok AS (SELECT doc_id, unnest(l) AS t,
        |    generate_subscripts(l, 1) AS pos FROM raw),
        |fl AS (SELECT doc_id, pos, t, t IN ('the', 'a') AS stop FROM tok),
        |grp AS (SELECT doc_id, pos, t, stop,
        |    count(*) FILTER (WHERE stop) OVER (PARTITION BY doc_id
        |      ORDER BY pos) AS g FROM fl),
        |ph AS (SELECT doc_id, g, string_agg(t, ' ' ORDER BY pos) AS phrase,
        |    count(*)::BIGINT AS n_words
        |  FROM grp WHERE NOT stop GROUP BY doc_id, g),
        |wo AS (SELECT doc_id, phrase, n_words,
        |    unnest(string_split(phrase, ' ')) AS word FROM ph),
        |ws AS (SELECT doc_id, word, count(*)::DOUBLE AS freq,
        |    sum(n_words)::DOUBLE AS deg FROM wo GROUP BY 1, 2),
        |dw AS (SELECT DISTINCT doc_id, phrase, n_words, word FROM wo),
        |sc AS (SELECT dw.doc_id, dw.phrase, dw.n_words,
        |    round(sum(deg / freq), 4) AS score
        |  FROM dw JOIN ws ON ws.doc_id = dw.doc_id AND ws.word = dw.word
        |  GROUP BY 1, 2, 3),
        |rk AS (SELECT doc_id, phrase, n_words, score,
        |    row_number() OVER (PARTITION BY doc_id
        |      ORDER BY score DESC, phrase)::BIGINT AS rank FROM sc)
        |SELECT doc_id, phrase, n_words, score, rank FROM rk
        |WHERE rank <= 3 ORDER BY doc_id, rank""".stripMargin,
    "q_bootstrap_ci" ->
      """WITH base AS (SELECT source AS g, doc_id::VARCHAR AS id,
        |    n_chars::DOUBLE AS x FROM documents WHERE n_chars IS NOT NULL),
        |rep AS (SELECT g, id, x, unnest(range(0, 32)) AS r FROM base),
        |uu AS (SELECT g, r, x,
        |    CAST(('0x' || substring(md5(concat('42|', id, '|',
        |      r::VARCHAR)), 1, 8)) AS BIGINT) / 4294967296.0 AS u
        |  FROM rep),
        |mm AS (SELECT g, r, x,
        |    CASE WHEN u < 0.36787944117144233 THEN 0
        |         WHEN u < 0.7357588823428847 THEN 1
        |         WHEN u < 0.9196986029286058 THEN 2
        |         WHEN u < 0.9810118431238462 THEN 3 ELSE 4 END AS m
        |  FROM uu),
        |rm AS (SELECT g, r, CASE WHEN sum(m) > 0
        |    THEN round(sum(m * x) / sum(m), 6) END AS rm
        |  FROM mm GROUP BY g, r),
        |pt AS (SELECT g, round(avg(x), 4) AS mean FROM base GROUP BY g)
        |SELECT pt.g AS source, pt.mean,
        |  round(quantile_cont(rm, 0.025), 4) AS ci_lo,
        |  round(quantile_cont(rm, 0.975), 4) AS ci_hi,
        |  count(rm)::BIGINT AS b_effective
        |FROM rm JOIN pt USING (g) GROUP BY pt.g, pt.mean
        |ORDER BY source""".stripMargin,
    "q_dedup_stats" ->
      """WITH sizes AS (SELECT md5(text) AS c, count(doc_id)::BIGINT AS n
        |  FROM documents GROUP BY 1)
        |SELECT sum(n)::BIGINT AS n_docs, count(*)::BIGINT AS n_clusters,
        |  sum(n - 1)::BIGINT AS n_dups,
        |  round((sum(n) - count(*)) / sum(n)::DOUBLE, 4) AS dup_frac,
        |  count(*) FILTER (WHERE n = 1)::BIGINT AS n_singletons,
        |  max(n)::BIGINT AS max_cluster_size
        |FROM sizes""".stripMargin,
    "q_weight_diag" ->
      """WITH w AS (SELECT o_orderpriority AS g,
        |    o_totalprice::DOUBLE / 100000.0 AS w FROM orders
        |  WHERE o_totalprice IS NOT NULL AND o_totalprice > 0)
        |SELECT g AS o_orderpriority, count(*)::BIGINT AS n,
        |  round(sum(w), 4) AS sum_w,
        |  round(sum(w) * sum(w) / sum(w * w), 4) AS ess,
        |  round(count(*) * sum(w * w) / (sum(w) * sum(w)), 4)
        |    AS design_effect,
        |  round(sqrt(greatest(0.0, sum(w * w) / count(*)
        |    - pow(sum(w) / count(*), 2))) / (sum(w) / count(*)), 4)
        |    AS cv_w,
        |  min(w) AS min_w, max(w) AS max_w,
        |  round(max(w) / min(w), 4) AS w_ratio
        |FROM w GROUP BY g ORDER BY o_orderpriority""".stripMargin,
    "q_max_concurrent" ->
      """WITH iv AS (SELECT event_type AS k, epoch_us(ts)::BIGINT AS s,
        |    epoch_us(ts)::BIGINT + floor(value * 1e6)::BIGINT AS e
        |  FROM events),
        |b AS (SELECT k, s AS t, 1 AS d FROM iv
        |  UNION ALL SELECT k, e, -1 FROM iv),
        |l AS (SELECT k, t, sum(d) OVER (PARTITION BY k ORDER BY t, d
        |    ROWS UNBOUNDED PRECEDING) AS lvl FROM b),
        |m AS (SELECT k, max(lvl) AS mc FROM l GROUP BY k)
        |SELECT l.k AS event_type, m.mc::BIGINT AS max_concurrent,
        |  min(l.t) AS peak_ts
        |FROM l JOIN m USING (k) WHERE l.lvl = m.mc
        |GROUP BY l.k, m.mc ORDER BY event_type""".stripMargin,
    "ann_centroid_sim" ->
      """WITH e AS (SELECT vec_id, label,
        |    generate_subscripts(embedding, 1) AS i,
        |    unnest(embedding)::DOUBLE AS x FROM embeddings),
        |c AS (SELECT label, i, round(avg(x), 6) AS m,
        |    count(*)::BIGINT AS n FROM e GROUP BY 1, 2),
        |g AS (SELECT label, max(n) AS n FROM c GROUP BY label),
        |p AS (SELECT a.label AS label_a, b.label AS label_b,
        |    sum(a.m * b.m) AS dot, sqrt(sum(a.m * a.m)) AS na,
        |    sqrt(sum(b.m * b.m)) AS nb
        |  FROM c a JOIN c b ON a.i = b.i AND a.label < b.label
        |  GROUP BY 1, 2)
        |SELECT p.label_a, p.label_b, ga.n AS n_a, gb.n AS n_b,
        |  CASE WHEN na > 0 AND nb > 0 THEN round(dot / (na * nb), 4)
        |  END AS cos
        |FROM p JOIN g ga ON ga.label = p.label_a
        |JOIN g gb ON gb.label = p.label_b
        |ORDER BY label_a, label_b""".stripMargin,
    "q_approx_quantiles" ->
      """SELECT l_returnflag,
        |  quantile_disc(l_extendedprice, 0.25) AS p25,
        |  quantile_disc(l_extendedprice, 0.50) AS p50,
        |  quantile_disc(l_extendedprice, 0.75) AS p75,
        |  quantile_disc(l_extendedprice, 0.90) AS p90
        |FROM lineitem GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,
    "q_stats_drift" ->
      """WITH o AS (SELECT doc_id, lang, n_chars, source FROM documents),
        |nw AS (SELECT doc_id,
        |    CASE WHEN doc_id % 7 = 0 THEN NULL ELSE lang END AS lang,
        |    n_chars + 37 AS n_chars, source FROM documents
        |  WHERE doc_id % 10 <> 0),
        |po AS (
        |  SELECT 'doc_id' AS col_name, count(*)::BIGINT AS n_old,
        |    round(count(*) FILTER (WHERE doc_id IS NULL)
        |      / count(*)::DOUBLE, 4) AS null_frac_old,
        |    count(DISTINCT doc_id)::BIGINT AS distinct_old,
        |    round(avg(try_cast(doc_id::VARCHAR AS DOUBLE)), 4) AS mean_old
        |  FROM o UNION ALL
        |  SELECT 'lang', count(*)::BIGINT,
        |    round(count(*) FILTER (WHERE lang IS NULL)
        |      / count(*)::DOUBLE, 4),
        |    count(DISTINCT lang)::BIGINT,
        |    round(avg(try_cast(lang AS DOUBLE)), 4) FROM o UNION ALL
        |  SELECT 'n_chars', count(*)::BIGINT,
        |    round(count(*) FILTER (WHERE n_chars IS NULL)
        |      / count(*)::DOUBLE, 4),
        |    count(DISTINCT n_chars)::BIGINT,
        |    round(avg(try_cast(n_chars::VARCHAR AS DOUBLE)), 4) FROM o
        |  UNION ALL
        |  SELECT 'source', count(*)::BIGINT,
        |    round(count(*) FILTER (WHERE source IS NULL)
        |      / count(*)::DOUBLE, 4),
        |    count(DISTINCT source)::BIGINT,
        |    round(avg(try_cast(source AS DOUBLE)), 4) FROM o),
        |pn AS (
        |  SELECT 'doc_id' AS col_name, count(*)::BIGINT AS n_new,
        |    round(count(*) FILTER (WHERE doc_id IS NULL)
        |      / count(*)::DOUBLE, 4) AS null_frac_new,
        |    count(DISTINCT doc_id)::BIGINT AS distinct_new,
        |    round(avg(try_cast(doc_id::VARCHAR AS DOUBLE)), 4) AS mean_new
        |  FROM nw UNION ALL
        |  SELECT 'lang', count(*)::BIGINT,
        |    round(count(*) FILTER (WHERE lang IS NULL)
        |      / count(*)::DOUBLE, 4),
        |    count(DISTINCT lang)::BIGINT,
        |    round(avg(try_cast(lang AS DOUBLE)), 4) FROM nw UNION ALL
        |  SELECT 'n_chars', count(*)::BIGINT,
        |    round(count(*) FILTER (WHERE n_chars IS NULL)
        |      / count(*)::DOUBLE, 4),
        |    count(DISTINCT n_chars)::BIGINT,
        |    round(avg(try_cast(n_chars::VARCHAR AS DOUBLE)), 4) FROM nw
        |  UNION ALL
        |  SELECT 'source', count(*)::BIGINT,
        |    round(count(*) FILTER (WHERE source IS NULL)
        |      / count(*)::DOUBLE, 4),
        |    count(DISTINCT source)::BIGINT,
        |    round(avg(try_cast(source AS DOUBLE)), 4) FROM nw)
        |SELECT po.col_name, n_old, n_new, null_frac_old, null_frac_new,
        |  round(null_frac_new - null_frac_old, 4) + 0.0 AS null_frac_delta,
        |  distinct_old, distinct_new, mean_old, mean_new,
        |  round(mean_new - mean_old, 4) + 0.0 AS mean_delta
        |FROM po JOIN pn USING (col_name) ORDER BY col_name""".stripMargin,
    "q_hilbert" -> hilbertOracle(8),
    "ann_mmr" -> mmrOracle(5, 0.7),
    "dedup_golden" ->
      """WITH d AS (SELECT doc_id % 50 AS cl,
        |    CASE WHEN doc_id % 7 = 0 THEN NULL ELSE lang END AS lang,
        |    source
        |  FROM documents),
        |wl AS (SELECT cl, lang FROM (
        |    SELECT cl, lang, count(*) AS n,
        |      row_number() OVER (PARTITION BY cl
        |        ORDER BY count(*) DESC, lang) AS r
        |    FROM d WHERE lang IS NOT NULL GROUP BY cl, lang)
        |  WHERE r = 1),
        |ws AS (SELECT cl, source FROM (
        |    SELECT cl, source, count(*) AS n,
        |      row_number() OVER (PARTITION BY cl
        |        ORDER BY count(*) DESC, source) AS r
        |    FROM d WHERE source IS NOT NULL GROUP BY cl, source)
        |  WHERE r = 1),
        |cs AS (SELECT DISTINCT cl FROM d)
        |SELECT cs.cl AS cluster, wl.lang, ws.source
        |FROM cs LEFT JOIN wl USING (cl) LEFT JOIN ws USING (cl)
        |ORDER BY cluster""".stripMargin,
    "q_impute" ->
      """WITH e AS (SELECT event_id, event_type,
        |    CASE WHEN event_id % 7 = 0 THEN NULL ELSE value END AS value
        |  FROM events),
        |gm AS (SELECT event_type, quantile_cont(value, 0.5) AS gmed
        |  FROM e WHERE value IS NOT NULL GROUP BY 1),
        |gg AS (SELECT quantile_cont(value, 0.5) AS gmed_all FROM e
        |  WHERE value IS NOT NULL)
        |SELECT e.event_id, e.event_type, e.value,
        |  round(coalesce(e.value, gm.gmed, gg.gmed_all), 4)
        |    AS value_imputed,
        |  (e.value IS NULL
        |    AND coalesce(e.value, gm.gmed, gg.gmed_all) IS NOT NULL)
        |    AS was_imputed
        |FROM e LEFT JOIN gm USING (event_type), gg
        |ORDER BY event_id""".stripMargin,
    "q_pop" ->
      """WITH daily AS (SELECT
        |    epoch_us(o_orderdate)::BIGINT // 86400000000 AS day,
        |    round(sum(o_totalprice), 4) AS revenue
        |  FROM orders GROUP BY 1)
        |SELECT day, revenue,
        |  round((revenue - lag(revenue, 1) OVER (ORDER BY day))
        |    / lag(revenue, 1) OVER (ORDER BY day), 6) AS pct_1d,
        |  round((revenue - lag(revenue, 7) OVER (ORDER BY day))
        |    / lag(revenue, 7) OVER (ORDER BY day), 6) AS pct_7d
        |FROM daily ORDER BY day""".stripMargin,
    "dedup_containment" ->
      """WITH tok AS (SELECT doc_id, str_split(text, ' ') AS tk
        |  FROM documents WHERE len(str_split(text, ' ')) >= 3),
        |sh AS (SELECT DISTINCT doc_id AS sid,
        |    array_to_string(tk[i:i+2], ' ') AS s
        |  FROM tok, unnest(generate_series(1, len(tk) - 2)) AS u(i)),
        |sz AS (SELECT sid, count(*)::BIGINT AS nsh FROM sh GROUP BY sid),
        |df AS (SELECT s, count(*) AS df FROM sh GROUP BY s),
        |rare AS (SELECT sh.sid, sh.s FROM sh JOIN df USING (s)
        |  WHERE df.df <= 100),
        |dense AS (SELECT sh.sid, sh.s FROM sh JOIN df USING (s)
        |  WHERE df.df > 100),
        |rp AS (SELECT a.sid AS id_a, b.sid AS id_b,
        |    count(*)::BIGINT AS shared_rare
        |  FROM rare a JOIN rare b ON a.s = b.s AND a.sid < b.sid
        |  GROUP BY 1, 2),
        |dp AS (SELECT c.id_a, c.id_b, count(*)::BIGINT AS shared_dense
        |  FROM (SELECT id_a, id_b FROM rp) c
        |  JOIN dense da ON da.sid = c.id_a
        |  JOIN dense db ON db.sid = c.id_b AND db.s = da.s
        |  GROUP BY c.id_a, c.id_b),
        |i AS (SELECT rp.id_a, rp.id_b,
        |    rp.shared_rare + coalesce(dp.shared_dense, 0) AS inter
        |  FROM rp LEFT JOIN dp USING (id_a, id_b))
        |SELECT i.id_a, i.id_b, za.nsh AS nsh_a, zb.nsh AS nsh_b, i.inter,
        |  round(i.inter * 1.0 / least(za.nsh, zb.nsh), 4) AS containment
        |FROM i JOIN sz za ON za.sid = i.id_a JOIN sz zb ON zb.sid = i.id_b
        |WHERE i.inter * 1.0 / least(za.nsh, zb.nsh) >= 0.8
        |ORDER BY id_a, id_b""".stripMargin,
    "q_adoption" ->
      """WITH e AS (SELECT event_type AS g, user_id AS u,
        |    epoch_us(ts)::BIGINT // 86400000000 AS day FROM events),
        |fd AS (SELECT g, u, min(day) AS first_day FROM e GROUP BY 1, 2),
        |np AS (SELECT g, first_day AS day, count(*)::BIGINT AS n_new_users
        |  FROM fd GROUP BY 1, 2),
        |daily AS (SELECT g, day, count(*)::BIGINT AS n_events,
        |    count(DISTINCT u)::BIGINT AS n_active_users
        |  FROM e GROUP BY 1, 2)
        |SELECT daily.g AS event_type, daily.day AS day, daily.n_events,
        |  daily.n_active_users,
        |  coalesce(np.n_new_users, 0)::BIGINT AS n_new_users,
        |  sum(coalesce(np.n_new_users, 0)) OVER (PARTITION BY daily.g
        |    ORDER BY daily.day ROWS BETWEEN UNBOUNDED PRECEDING
        |    AND CURRENT ROW)::BIGINT AS cum_users
        |FROM daily LEFT JOIN np ON np.g = daily.g AND np.day = daily.day
        |ORDER BY 1, 2""".stripMargin,
    "q_rfm" ->
      """WITH a AS (SELECT o_custkey,
        |    max(epoch(o_orderdate))::BIGINT AS last_ts,
        |    count(*)::BIGINT AS n_orders,
        |    round(sum(o_totalprice::DOUBLE), 4) AS total_value
        |  FROM orders GROUP BY 1)
        |SELECT o_custkey, last_ts, n_orders, total_value,
        |  ntile(5) OVER (ORDER BY last_ts, o_custkey)::BIGINT AS r_score,
        |  ntile(5) OVER (ORDER BY n_orders, o_custkey)::BIGINT AS f_score,
        |  ntile(5) OVER (ORDER BY total_value, o_custkey)::BIGINT
        |    AS m_score,
        |  (ntile(5) OVER (ORDER BY last_ts, o_custkey))::VARCHAR
        |    || (ntile(5) OVER (ORDER BY n_orders, o_custkey))::VARCHAR
        |    || (ntile(5) OVER (ORDER BY total_value, o_custkey))::VARCHAR
        |    AS segment
        |FROM a ORDER BY o_custkey""".stripMargin,
    "q_geo_join" ->
      """WITH c AS (SELECT c_custkey,
        |    ((c_custkey * 37) % 1200)::DOUBLE / 10.0 - 60.0 AS lat,
        |    ((c_custkey * 73) % 3600)::DOUBLE / 10.0 - 180.0 AS lon
        |  FROM customer),
        |s AS (SELECT s_suppkey,
        |    ((s_suppkey * 41) % 1200)::DOUBLE / 10.0 - 60.0 AS lat,
        |    ((s_suppkey * 97) % 3600)::DOUBLE / 10.0 - 180.0 AS lon
        |  FROM supplier),
        |p AS (SELECT s.s_suppkey, c.c_custkey,
        |    2 * 6371.0088 * asin(sqrt(
        |      sin(radians(c.lat - s.lat) / 2)
        |        * sin(radians(c.lat - s.lat) / 2)
        |      + cos(radians(s.lat)) * cos(radians(c.lat))
        |        * sin(radians(c.lon - s.lon) / 2)
        |        * sin(radians(c.lon - s.lon) / 2))) AS d
        |  FROM s, c)
        |SELECT s_suppkey, c_custkey, round(d, 3) AS dist_km
        |FROM p WHERE d <= 150.0 ORDER BY 1, 2""".stripMargin,
    "q_lsh_tune" ->
      """WITH d AS (SELECT b::BIGINT AS b, (128 // b)::BIGINT AS r
        |  FROM (SELECT unnest(range(1, 129)) AS b) WHERE 128 % b = 0),
        |g AS (SELECT (unnest(range(0, 200)) + 0.5) / 200.0 AS s),
        |x AS (SELECT b, r, s, 1 - pow(1 - pow(s, r), b) AS p FROM d, g),
        |a AS (SELECT b, r,
        |    round(sum(CASE WHEN s < 0.8 THEN p ELSE 0.0 END) / 200, 6)
        |      AS fp_area,
        |    round(sum(CASE WHEN s >= 0.8 THEN 1.0 - p ELSE 0.0 END) / 200,
        |      6) AS fn_area
        |  FROM x GROUP BY 1, 2),
        |t2 AS (SELECT b, r, fp_area, fn_area,
        |    round(fp_area + fn_area, 6) AS total_err FROM a)
        |SELECT b AS bands, r AS rows_per_band, fp_area, fn_area,
        |  total_err,
        |  row_number() OVER (ORDER BY total_err, b)::BIGINT AS rank
        |FROM t2 ORDER BY rank""".stripMargin,
    "ann_ivf_append" ->
      """WITH e AS (SELECT vec_id, generate_subscripts(embedding, 1) AS i,
        |    unnest(embedding)::DOUBLE AS x FROM embeddings),
        |em AS (SELECT * FROM e WHERE vec_id % 2 = 0),
        |eo AS (SELECT * FROM e WHERE vec_id % 2 = 1),
        |s0 AS (SELECT vec_id, row_number() OVER (ORDER BY vec_id) - 1 AS cid
        |  FROM (SELECT vec_id FROM embeddings WHERE vec_id % 2 = 0
        |        ORDER BY vec_id LIMIT 8)),
        |c0 AS (SELECT s0.cid, em.i, em.x FROM em JOIN s0 USING (vec_id)),
        |d1 AS (SELECT em.vec_id, c.cid, sum((em.x - c.x) * (em.x - c.x)) AS d
        |  FROM em JOIN c0 c USING (i) GROUP BY em.vec_id, c.cid),
        |a1 AS (SELECT vec_id, cid FROM d1
        |  QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY d, cid) = 1),
        |c1 AS (SELECT a.cid, em.i, round(avg(em.x), 6) AS x
        |  FROM em JOIN a1 a USING (vec_id) GROUP BY a.cid, em.i),
        |da AS (SELECT eo.vec_id, c.cid, sum((eo.x - c.x) * (eo.x - c.x)) AS d
        |  FROM eo JOIN c1 c USING (i) GROUP BY eo.vec_id, c.cid)
        |SELECT vec_id, cid::INT AS cell, round(sqrt(d), 6) AS dist
        |FROM da
        |QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY d, cid) = 1
        |ORDER BY vec_id""".stripMargin,
    "ann_int8" ->
      """WITH v AS (SELECT vec_id,
        |    list_transform(embedding, x -> x::DOUBLE) AS v
        |  FROM embeddings),
        |m AS (SELECT vec_id, v,
        |    list_max(list_transform(v, x -> abs(x))) / 127.0 AS sc FROM v),
        |c AS (SELECT vec_id, v, sc,
        |    list_transform(v, x -> CASE WHEN sc <> 0
        |      THEN greatest(-127, least(127, round(x / sc, 0)::BIGINT))
        |      ELSE 0 END) AS codes
        |  FROM m)
        |SELECT vec_id, len(v)::INT AS dim, round(sc, 8) AS scale,
        |  array_to_string(list_transform(codes, e -> e::VARCHAR), ',')
        |    AS codes,
        |  round(list_sum(list_transform(list_zip(v, codes),
        |    p -> pow(p[1] - p[2] * sc, 2))) / len(v), 10)
        |    AS mse
        |FROM c ORDER BY vec_id""".stripMargin,
    "dedup_semantic" ->
      """WITH e AS (SELECT vec_id, generate_subscripts(embedding, 1) AS i,
        |    unnest(embedding)::DOUBLE AS x FROM embeddings),
        |s0 AS (SELECT vec_id, row_number() OVER (ORDER BY vec_id) - 1 AS cid
        |  FROM (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT 8)),
        |c0 AS (SELECT s0.cid, e.i, e.x FROM e JOIN s0 USING (vec_id)),
        |d1 AS (SELECT e.vec_id, c.cid, sum((e.x - c.x) * (e.x - c.x)) AS d
        |  FROM e JOIN c0 c USING (i) GROUP BY e.vec_id, c.cid),
        |a1 AS (SELECT vec_id, cid FROM d1
        |  QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY d, cid) = 1),
        |c1 AS (SELECT a.cid, e.i, round(avg(e.x), 6) AS x
        |  FROM e JOIN a1 a USING (vec_id) GROUP BY a.cid, e.i),
        |d2 AS (SELECT e.vec_id, c.cid, sum((e.x - c.x) * (e.x - c.x)) AS d
        |  FROM e JOIN c1 c USING (i) GROUP BY e.vec_id, c.cid),
        |a2 AS (SELECT vec_id, cid FROM d2
        |  QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY d, cid) = 1),
        |cand AS (SELECT a.cid, a.vec_id AS ia, b.vec_id AS ib
        |  FROM a2 a JOIN a2 b ON a.cid = b.cid AND a.vec_id < b.vec_id),
        |cs AS (SELECT c.cid, c.ia, c.ib,
        |    sum(ea.x * eb.x)
        |      / (sqrt(sum(ea.x * ea.x)) * sqrt(sum(eb.x * eb.x))) AS cosine
        |  FROM cand c JOIN e ea ON ea.vec_id = c.ia
        |  JOIN e eb ON eb.vec_id = c.ib AND eb.i = ea.i
        |  GROUP BY c.cid, c.ia, c.ib)
        |SELECT cid AS cluster, ia AS id_a, ib AS id_b,
        |  round(cosine, 5) AS cosine FROM cs
        |WHERE cosine >= 0.35
        |ORDER BY cluster, id_a, id_b""".stripMargin,
    "text_bigram_lm" ->
      """WITH raw AS (SELECT doc_id,
        |    list_filter(string_split(text, ' '), x -> x <> '') AS l
        |  FROM documents WHERE len(list_filter(string_split(text, ' '),
        |    x -> x <> '')) > 0),
        |tok AS (SELECT doc_id, unnest(l) AS t, generate_subscripts(l, 1) AS pos
        |  FROM raw),
        |seq AS (SELECT doc_id, pos, t,
        |    lag(t) OVER (PARTITION BY doc_id ORDER BY pos) AS prev FROM tok),
        |c1 AS (SELECT t, count(*)::DOUBLE AS c FROM tok WHERE doc_id % 2 = 0
        |  GROUP BY t),
        |n AS (SELECT count(*)::DOUBLE AS total FROM tok WHERE doc_id % 2 = 0),
        |c2 AS (SELECT prev, t, count(*)::DOUBLE AS c FROM seq
        |  WHERE prev IS NOT NULL AND doc_id % 2 = 0 GROUP BY prev, t),
        |sc AS (SELECT s.doc_id,
        |    CASE WHEN s.prev IS NULL THEN ln(coalesce(ct.c, 1.0) / n.total)
        |         WHEN c2.c IS NOT NULL THEN ln(c2.c / cp.c)
        |         ELSE ln(0.4 * coalesce(ct.c, 1.0) / n.total) END AS lp
        |  FROM seq s
        |  LEFT JOIN c1 ct ON ct.t = s.t
        |  LEFT JOIN c1 cp ON cp.t = s.prev
        |  LEFT JOIN c2 ON c2.prev = s.prev AND c2.t = s.t, n)
        |SELECT doc_id, count(*)::BIGINT AS n_tokens,
        |  round(avg(lp), 4) + 0.0 AS avg_logp
        |FROM sc GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "text_trigram_lm" ->
      """WITH raw AS (SELECT doc_id,
        |    list_filter(string_split(text, ' '), x -> x <> '') AS l
        |  FROM documents WHERE len(list_filter(string_split(text, ' '),
        |    x -> x <> '')) > 0),
        |tok AS (SELECT doc_id, unnest(l) AS t, generate_subscripts(l, 1) AS pos
        |  FROM raw),
        |seq AS (SELECT doc_id, pos, t,
        |    lag(t) OVER (PARTITION BY doc_id ORDER BY pos) AS prev,
        |    lag(t, 2) OVER (PARTITION BY doc_id ORDER BY pos) AS prev2
        |  FROM tok),
        |c1 AS (SELECT t, count(*)::DOUBLE AS c FROM tok WHERE doc_id % 2 = 0
        |  GROUP BY t),
        |n AS (SELECT count(*)::DOUBLE AS total FROM tok WHERE doc_id % 2 = 0),
        |c2 AS (SELECT prev, t, count(*)::DOUBLE AS c FROM seq
        |  WHERE prev IS NOT NULL AND doc_id % 2 = 0 GROUP BY prev, t),
        |c3 AS (SELECT prev2, prev, t, count(*)::DOUBLE AS c FROM seq
        |  WHERE prev2 IS NOT NULL AND doc_id % 2 = 0
        |  GROUP BY prev2, prev, t),
        |sc AS (SELECT s.doc_id,
        |    CASE WHEN s.prev IS NULL
        |           THEN ln(coalesce(ct.c, 1.0) / n.total)
        |         WHEN s.prev2 IS NULL THEN
        |           CASE WHEN c2.c IS NOT NULL THEN ln(c2.c / cp.c)
        |                ELSE ln(0.4) + ln(coalesce(ct.c, 1.0) / n.total)
        |           END
        |         ELSE
        |           CASE WHEN c3.c IS NOT NULL THEN ln(c3.c / c2d.c)
        |                WHEN c2.c IS NOT NULL
        |                  THEN ln(0.4) + ln(c2.c / cp.c)
        |                ELSE ln(0.4::DOUBLE * 0.4::DOUBLE)
        |                  + ln(coalesce(ct.c, 1.0) / n.total)
        |           END
        |    END AS lp
        |  FROM seq s
        |  LEFT JOIN c1 ct ON ct.t = s.t
        |  LEFT JOIN c1 cp ON cp.t = s.prev
        |  LEFT JOIN c2 ON c2.prev = s.prev AND c2.t = s.t
        |  LEFT JOIN c2 c2d ON c2d.prev = s.prev2 AND c2d.t = s.prev
        |  LEFT JOIN c3 ON c3.prev2 = s.prev2 AND c3.prev = s.prev
        |    AND c3.t = s.t, n)
        |SELECT doc_id, count(*)::BIGINT AS n_tokens,
        |  round(avg(lp), 4) + 0.0 AS avg_logp
        |FROM sc GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "text_collocations" ->
      """WITH raw AS (SELECT list_filter(string_split(text, ' '),
        |    x -> x <> '') AS l FROM documents
        |  WHERE len(list_filter(string_split(text, ' '), x -> x <> '')) > 0),
        |tok AS (SELECT unnest(l) AS t FROM raw),
        |uni AS (SELECT t, count(*)::DOUBLE AS c FROM tok GROUP BY t),
        |n AS (SELECT sum(c) AS n_total FROM uni),
        |seq AS (SELECT unnest(l) AS b,
        |    unnest(list_prepend(NULL::VARCHAR,
        |      l[1:len(l) - 1])) AS a FROM raw),
        |p AS (SELECT a, b, count(*)::BIGINT AS n_pair FROM seq
        |  WHERE a IS NOT NULL GROUP BY a, b
        |  HAVING count(*) >= 5)
        |SELECT p.a AS term_a, p.b AS term_b, p.n_pair,
        |  round(ln(p.n_pair * n.n_total / (ua.c * ub.c)), 4) + 0.0 AS pmi
        |FROM p JOIN uni ua ON ua.t = p.a JOIN uni ub ON ub.t = p.b, n
        |ORDER BY pmi DESC, term_a, term_b LIMIT 50""".stripMargin,
    "text_zipf" ->
      """WITH tok AS (SELECT unnest(list_filter(string_split(text, ' '),
        |    x -> x <> '')) AS t FROM documents),
        |c AS (SELECT t, count(*)::BIGINT AS c FROM tok GROUP BY t),
        |r AS (SELECT c, row_number() OVER (ORDER BY c DESC, t) AS rank
        |  FROM c),
        |s AS (SELECT count(*)::BIGINT AS n_terms, sum(c)::BIGINT AS n_tokens
        |  FROM c),
        |f AS (SELECT regr_slope(ln(c::DOUBLE), ln(rank::DOUBLE)) AS sl,
        |    regr_intercept(ln(c::DOUBLE), ln(rank::DOUBLE)) AS ic,
        |    regr_r2(ln(c::DOUBLE), ln(rank::DOUBLE)) AS r2
        |  FROM r WHERE rank <= 500)
        |SELECT s.n_terms, s.n_tokens, round(f.sl, 4) + 0.0 AS slope,
        |  round(f.ic, 4) + 0.0 AS intercept, round(f.r2, 4) + 0.0 AS r2
        |FROM f, s""".stripMargin,
    "text_readability" ->
      """SELECT doc_id,
        |  len(list_filter(string_split(text, ' '), x -> x <> ''))::BIGINT
        |    AS n_words,
        |  greatest(len(regexp_extract_all(text, '[.!?]+')), 1)::BIGINT
        |    AS n_sentences,
        |  (len(regexp_extract_all(lower(text), '[aeiouy]+'))
        |    + len(list_filter(string_split(text, ' '), x -> x <> ''))
        |    - len(list_filter(string_split(lower(text), ' '),
        |        x -> regexp_matches(x, '[aeiouy]'))))::BIGINT AS n_syllables,
        |  CASE WHEN n_words > 0 THEN
        |    round(206.835 - 1.015 * n_words / n_sentences
        |      - 84.6 * n_syllables / n_words, 4)
        |  END AS flesch
        |FROM documents ORDER BY doc_id""".stripMargin,
    "text_script" ->
      """SELECT event_id, length(props)::BIGINT AS n_chars,
        |  (length(props) - length(regexp_replace(props, '[A-Za-z]', '', 'g')))
        |    ::BIGINT AS n_letter,
        |  (length(props) - length(regexp_replace(props, '[0-9]', '', 'g')))
        |    ::BIGINT AS n_digit,
        |  (length(props) - length(regexp_replace(props, '[ \t\n\r]', '', 'g')))
        |    ::BIGINT AS n_space,
        |  (length(props)
        |    - length(regexp_replace(props, '[!-/:-@\[-`{-~]', '', 'g')))
        |    ::BIGINT AS n_punct,
        |  (n_chars - n_letter - n_digit - n_space - n_punct)::BIGINT
        |    AS n_other,
        |  CASE
        |    WHEN n_letter >= n_digit AND n_letter >= n_punct
        |      AND n_letter >= n_space AND n_letter >= n_other THEN 'letter'
        |    WHEN n_digit >= n_punct AND n_digit >= n_space
        |      AND n_digit >= n_other THEN 'digit'
        |    WHEN n_punct >= n_space AND n_punct >= n_other THEN 'punct'
        |    WHEN n_space >= n_other THEN 'space'
        |    ELSE 'other' END AS dominant
        |FROM events ORDER BY event_id""".stripMargin,
    "text_length_buckets" ->
      """WITH n AS (SELECT len(list_filter(
        |    regexp_split_to_array(text, '\s+'), x -> x <> ''))::BIGINT
        |    AS n
        |  FROM documents),
        |b AS (SELECT n,
        |    (CASE WHEN least(n, 256) <= 1 THEN 1
        |          WHEN least(n, 256) <= 2 THEN 2
        |          WHEN least(n, 256) <= 4 THEN 4
        |          WHEN least(n, 256) <= 8 THEN 8
        |          WHEN least(n, 256) <= 16 THEN 16
        |          WHEN least(n, 256) <= 32 THEN 32
        |          WHEN least(n, 256) <= 64 THEN 64
        |          WHEN least(n, 256) <= 128 THEN 128
        |          ELSE 256 END)::BIGINT AS bucket_len
        |  FROM n WHERE n > 0)
        |SELECT bucket_len, count(*)::BIGINT AS n_docs,
        |  sum(least(n, 256))::BIGINT AS total_tokens,
        |  (count(*) * bucket_len)::BIGINT AS capacity,
        |  round(1.0 - sum(least(n, 256))
        |    / (count(*) * bucket_len)::DOUBLE, 4) AS padding_frac
        |FROM b GROUP BY bucket_len ORDER BY bucket_len""".stripMargin,
    "text_char_entropy" ->
      """WITH ch AS (SELECT doc_id,
        |    unnest(list_filter(string_split(text, ''), x -> x <> '')) AS c
        |  FROM documents),
        |cc AS (SELECT doc_id, c, count(*)::BIGINT AS n FROM ch
        |  GROUP BY 1, 2),
        |pd AS (SELECT doc_id, sum(n)::BIGINT AS n_chars,
        |    count(*)::BIGINT AS n_distinct, sum(n * ln(n)) AS snln
        |  FROM cc GROUP BY 1),
        |ids AS (SELECT DISTINCT doc_id FROM documents),
        |e AS (SELECT ids.doc_id,
        |    coalesce(pd.n_chars, 0)::BIGINT AS n_chars,
        |    coalesce(pd.n_distinct, 0)::BIGINT AS n_distinct,
        |    round(coalesce(ln(pd.n_chars) - pd.snln / pd.n_chars, 0.0), 4)
        |      AS entropy
        |  FROM ids LEFT JOIN pd USING (doc_id))
        |SELECT doc_id, n_chars, n_distinct, entropy,
        |  CASE WHEN n_distinct > 1
        |    THEN round(entropy / ln(n_distinct), 4) ELSE 0.0 END
        |    AS norm_entropy
        |FROM e ORDER BY doc_id""".stripMargin,
    "text_ccnet_buckets" ->
      """WITH raw AS (SELECT doc_id, lang,
        |    list_filter(string_split(text, ' '), x -> x <> '') AS l
        |  FROM documents WHERE len(list_filter(string_split(text, ' '),
        |    x -> x <> '')) > 0),
        |tok AS (SELECT doc_id, unnest(l) AS t, generate_subscripts(l, 1) AS pos
        |  FROM raw),
        |seq AS (SELECT doc_id, pos, t,
        |    lag(t) OVER (PARTITION BY doc_id ORDER BY pos) AS prev FROM tok),
        |c1 AS (SELECT t, count(*)::DOUBLE AS c FROM tok WHERE doc_id % 2 = 0
        |  GROUP BY t),
        |n AS (SELECT count(*)::DOUBLE AS total FROM tok WHERE doc_id % 2 = 0),
        |c2 AS (SELECT prev, t, count(*)::DOUBLE AS c FROM seq
        |  WHERE prev IS NOT NULL AND doc_id % 2 = 0 GROUP BY prev, t),
        |sc AS (SELECT s.doc_id,
        |    CASE WHEN s.prev IS NULL THEN ln(coalesce(ct.c, 1.0) / n.total)
        |         WHEN c2.c IS NOT NULL THEN ln(c2.c / cp.c)
        |         ELSE ln(0.4 * coalesce(ct.c, 1.0) / n.total) END AS lp
        |  FROM seq s
        |  LEFT JOIN c1 ct ON ct.t = s.t
        |  LEFT JOIN c1 cp ON cp.t = s.prev
        |  LEFT JOIN c2 ON c2.prev = s.prev AND c2.t = s.t, n),
        |agg AS (SELECT doc_id, count(*)::BIGINT AS n_tokens,
        |    round(avg(lp), 4) + 0.0 AS avg_logp
        |  FROM sc GROUP BY doc_id),
        |g AS (SELECT a.doc_id, d.lang, a.n_tokens, a.avg_logp,
        |    ntile(3) OVER (PARTITION BY d.lang
        |      ORDER BY a.avg_logp DESC, a.doc_id)::BIGINT AS bucket
        |  FROM agg a JOIN documents d USING (doc_id))
        |SELECT doc_id, lang, n_tokens, avg_logp, bucket,
        |  CASE WHEN bucket = 1 THEN 'head' WHEN bucket = 3 THEN 'tail'
        |       ELSE 'middle' END AS ppl_bucket
        |FROM g ORDER BY doc_id""".stripMargin,
    "text_dsir" ->
      """WITH tok AS (SELECT doc_id, lang, unnest(string_split(text, ' ')) AS t
        |  FROM documents),
        |tk AS (SELECT doc_id, lang,
        |    CAST('0x' || substring(md5(t), 1, 6) AS BIGINT) % 256 AS b
        |  FROM tok WHERE t <> ''),
        |rc AS (SELECT b, count(*)::DOUBLE AS cr FROM tk GROUP BY b),
        |tc AS (SELECT b, count(*)::DOUBLE AS ctg FROM tk WHERE lang = 'en'
        |  GROUP BY b),
        |nr AS (SELECT count(*)::DOUBLE AS nr FROM tk),
        |nt AS (SELECT count(*)::DOUBLE AS nt FROM tk WHERE lang = 'en'),
        |r AS (SELECT rc.b,
        |    ln((coalesce(ctg, 0) + 1) / (nt.nt + 256))
        |      - ln((cr + 1) / (nr.nr + 256)) AS lr
        |  FROM rc LEFT JOIN tc USING (b), nr, nt)
        |SELECT tk.doc_id, count(*)::BIGINT AS n_tokens,
        |  round(sum(lr), 4) + 0.0 AS dsir_logw
        |FROM tk JOIN r USING (b) GROUP BY tk.doc_id
        |ORDER BY doc_id""".stripMargin,
    "text_quality_score" ->
      """WITH tok AS (SELECT doc_id,
        |    unnest(string_split(lower(text), ' ')) AS t FROM documents),
        |tk AS (SELECT doc_id,
        |    CAST('0x' || substring(md5(t), 1, 6) AS BIGINT) % 64 AS b
        |  FROM tok WHERE t <> ''),
        |tf AS (SELECT doc_id, b, count(*)::DOUBLE AS tf FROM tk
        |  GROUP BY 1, 2),
        |co AS (SELECT range AS b, ((range % 7) - 3) / 10.0 AS w
        |  FROM range(64)),
        |z AS (SELECT doc_id, sum(tf)::BIGINT AS n_tokens,
        |    sum(tf * coalesce(w, 0)) AS z
        |  FROM tf LEFT JOIN co USING (b) GROUP BY doc_id)
        |SELECT d.doc_id, coalesce(n_tokens, 0)::BIGINT AS n_tokens,
        |  round(1.0 / (1.0 + exp(-(-0.5 + coalesce(z, 0)))), 4)
        |    AS quality_prob
        |FROM (SELECT DISTINCT doc_id FROM documents) d
        |LEFT JOIN z USING (doc_id)
        |ORDER BY doc_id""".stripMargin,
    "q_weighted_sample" ->
      """WITH k AS (SELECT doc_id, lang, n_chars,
        |  round(ln((CAST('0x' || substring(md5('42|' || doc_id::VARCHAR),
        |      1, 12) AS BIGINT) + 1) / 281474976710657.0) / n_chars, 10)
        |    AS wkey
        |  FROM documents WHERE n_chars > 0),
        |r AS (SELECT doc_id, lang, n_chars,
        |  row_number() OVER (PARTITION BY lang ORDER BY wkey DESC, doc_id)
        |    AS rk
        |  FROM k)
        |SELECT doc_id, lang, n_chars FROM r WHERE rk <= 20
        |ORDER BY lang, doc_id""".stripMargin,
    "q_corpus_upsert" ->
      """WITH newv AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 7 = 0 THEN text || ' v2' ELSE text END AS text
        |  FROM documents WHERE doc_id % 10 <> 0
        |  UNION ALL
        |  SELECT doc_id + 100000, 'new doc ' || doc_id::VARCHAR
        |  FROM documents WHERE doc_id % 5 = 0)
        |SELECT doc_id, text FROM newv ORDER BY doc_id""".stripMargin,
    "q_corpus_diff" ->
      """WITH oldv AS (SELECT doc_id, text FROM documents),
        |newv AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 7 = 0 THEN text || ' v2' ELSE text END AS text
        |  FROM documents WHERE doc_id % 10 <> 0
        |  UNION ALL
        |  SELECT doc_id + 100000, 'new doc ' || doc_id::VARCHAR
        |  FROM documents WHERE doc_id % 5 = 0),
        |oh AS (SELECT doc_id, md5(text) AS old_hash FROM oldv),
        |nh AS (SELECT doc_id, md5(text) AS new_hash FROM newv)
        |SELECT coalesce(oh.doc_id, nh.doc_id) AS doc_id,
        |  CASE WHEN old_hash IS NULL THEN 'added'
        |       WHEN new_hash IS NULL THEN 'removed'
        |       WHEN old_hash = new_hash THEN 'unchanged'
        |       ELSE 'changed' END AS status
        |FROM oh FULL OUTER JOIN nh ON oh.doc_id = nh.doc_id
        |ORDER BY doc_id""".stripMargin,
    "q_interval_point" ->
      """WITH iv AS (SELECT event_id AS i_id, epoch_us(ts) AS i_start,
        |    epoch_us(ts) + CAST(floor(value * 1e6) AS BIGINT) AS i_end
        |  FROM events WHERE event_type = 'signup'),
        |pt AS (SELECT event_id AS p_id, epoch_us(ts) AS p_ts
        |  FROM events WHERE event_type = 'purchase')
        |SELECT i.i_id, p.p_id, p.p_ts - i.i_start AS offset_us
        |FROM iv i JOIN pt p ON p.p_ts BETWEEN i.i_start AND i.i_end
        |ORDER BY i_id, p_id""".stripMargin,
    "q_interval_overlap" ->
      """WITH a AS (SELECT event_id AS a_id, epoch_us(ts) AS a_s,
        |    epoch_us(ts) + CAST(floor(value * 1e6) AS BIGINT) AS a_e
        |  FROM events WHERE event_type = 'signup'),
        |b AS (SELECT event_id AS b_id, epoch_us(ts) AS b_s,
        |    epoch_us(ts) + CAST(floor(value * 1e6) AS BIGINT) AS b_e
        |  FROM events WHERE event_type = 'error')
        |SELECT a_id, b_id, least(a_e, b_e) - greatest(a_s, b_s) AS overlap_us
        |FROM a JOIN b ON a_s <= b_e AND b_s <= a_e
        |ORDER BY a_id, b_id""".stripMargin,
    "q_resample_fill" ->
      """WITH e AS (SELECT user_id, epoch_us(ts)::BIGINT AS us, value
        |  FROM events),
        |a AS (SELECT user_id, us // 3600000000 AS bucket,
        |    count(*)::BIGINT AS n, round(avg(value), 4) AS avg_value
        |  FROM e GROUP BY 1, 2),
        |sp AS (SELECT user_id, min(bucket) AS b0, max(bucket) AS b1
        |  FROM a GROUP BY 1),
        |g AS (SELECT user_id, unnest(range(b0, b1 + 1)) AS bucket FROM sp),
        |j AS (SELECT g.user_id, g.bucket, coalesce(a.n, 0)::BIGINT AS n,
        |    a.avg_value
        |  FROM g LEFT JOIN a USING (user_id, bucket))
        |SELECT user_id, bucket, n, avg_value,
        |  last_value(avg_value IGNORE NULLS) OVER (PARTITION BY user_id
        |    ORDER BY bucket ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |    AS filled_value
        |FROM j ORDER BY user_id, bucket""".stripMargin,
    "q_funnel" ->
      """WITH e AS (SELECT user_id AS u, epoch_us(ts)::BIGINT AS ts,
        |    event_type AS et FROM events),
        |t1 AS (SELECT u, min(ts) AS t FROM e WHERE et = 'view' GROUP BY 1),
        |t2 AS (SELECT e.u, min(e.ts) AS t FROM e JOIN t1 ON e.u = t1.u
        |  WHERE e.et = 'click' AND e.ts > t1.t
        |    AND e.ts <= t1.t + 86400000000 GROUP BY 1),
        |t3 AS (SELECT e.u, min(e.ts) AS t FROM e
        |  JOIN t2 ON e.u = t2.u JOIN t1 ON e.u = t1.u
        |  WHERE e.et = 'purchase' AND e.ts > t2.t
        |    AND e.ts <= t1.t + 86400000000 GROUP BY 1),
        |n AS (SELECT (SELECT count(*) FROM t1)::BIGINT AS n1,
        |             (SELECT count(*) FROM t2)::BIGINT AS n2,
        |             (SELECT count(*) FROM t3)::BIGINT AS n3)
        |SELECT 1 AS step, 'view' AS event_type, n1 AS n_users,
        |  round(n1 / n1::DOUBLE, 4) AS conv_rate FROM n
        |UNION ALL SELECT 2, 'click', n2, round(n2 / n1::DOUBLE, 4) FROM n
        |UNION ALL SELECT 3, 'purchase', n3, round(n3 / n1::DOUBLE, 4) FROM n
        |ORDER BY step""".stripMargin,
    "q_cohort_retention" ->
      """WITH e AS (SELECT DISTINCT user_id AS u,
        |    epoch_us(ts)::BIGINT // 604800000000 AS wk FROM events),
        |f AS (SELECT u, min(wk) AS cohort FROM e GROUP BY 1),
        |a AS (SELECT f.cohort, e.wk - f.cohort AS "offset",
        |    count(*)::BIGINT AS n_active
        |  FROM e JOIN f ON e.u = f.u GROUP BY 1, 2),
        |s AS (SELECT cohort, count(*)::BIGINT AS n_cohort FROM f GROUP BY 1)
        |SELECT a.cohort, a."offset", a.n_active,
        |  round(a.n_active / s.n_cohort::DOUBLE, 4) AS retention
        |FROM a JOIN s ON a.cohort = s.cohort
        |ORDER BY a.cohort, a."offset"""".stripMargin,
    "q_cooccur" ->
      """WITH bi AS (SELECT DISTINCT l.l_orderkey AS basket,
        |    p.p_brand AS item
        |  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey)
        |SELECT a.item AS item_a, b.item AS item_b,
        |  count(*)::BIGINT AS n_baskets
        |FROM bi a JOIN bi b ON a.basket = b.basket AND a.item < b.item
        |GROUP BY 1, 2 HAVING count(*) >= 40
        |ORDER BY 1, 2""".stripMargin,
    "q_assoc_rules" ->
      """WITH bi AS (SELECT DISTINCT l.l_orderkey AS basket,
        |    p.p_brand AS item
        |  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey),
        |pairs AS (SELECT a.item AS item_a, b.item AS item_b,
        |    count(*)::BIGINT AS n_baskets
        |  FROM bi a JOIN bi b ON a.basket = b.basket AND a.item < b.item
        |  GROUP BY 1, 2 HAVING count(*) >= 40),
        |directed AS (
        |  SELECT item_a AS antecedent, item_b AS consequent, n_baskets
        |  FROM pairs
        |  UNION ALL
        |  SELECT item_b, item_a, n_baskets FROM pairs),
        |items AS (SELECT item, count(*)::BIGINT AS n_item FROM bi GROUP BY 1),
        |tot AS (SELECT count(DISTINCT basket)::DOUBLE AS n_tot FROM bi)
        |SELECT d.antecedent, d.consequent, d.n_baskets,
        |  round(d.n_baskets / ia.n_item::DOUBLE, 4) AS confidence,
        |  round(d.n_baskets * t.n_tot / (ia.n_item * ic.n_item), 4) AS lift
        |FROM directed d
        |JOIN items ia ON d.antecedent = ia.item
        |JOIN items ic ON d.consequent = ic.item
        |CROSS JOIN tot t
        |ORDER BY d.antecedent, d.consequent""".stripMargin,
    "q_transitions" ->
      """WITH e AS (SELECT user_id AS u, epoch_us(ts)::BIGINT AS ts,
        |    event_type AS from_state FROM events),
        |seq AS (SELECT from_state,
        |    lead(from_state) OVER (PARTITION BY u ORDER BY ts, from_state)
        |      AS to_state
        |  FROM e),
        |pairs AS (SELECT from_state, to_state, count(*)::BIGINT AS n
        |  FROM seq WHERE to_state IS NOT NULL GROUP BY 1, 2),
        |tot AS (SELECT from_state, sum(n)::BIGINT AS n_from
        |  FROM pairs GROUP BY 1)
        |SELECT p.from_state, p.to_state, p.n,
        |  round(p.n / t.n_from::DOUBLE, 4) AS p
        |FROM pairs p JOIN tot t ON p.from_state = t.from_state
        |ORDER BY p.from_state, p.to_state""".stripMargin,
    "graph_triangles" ->
      """WITH raw AS (SELECT o_custkey % 997 AS u, o_orderkey % 997 AS v
        |  FROM orders),
        |e AS (SELECT DISTINCT least(u, v) AS a, greatest(u, v) AS b
        |  FROM raw WHERE u <> v),
        |deg AS (SELECT node, count(*)::BIGINT AS deg FROM (
        |    SELECT a AS node FROM e UNION ALL SELECT b FROM e)
        |  GROUP BY 1),
        |tri AS (SELECT e1.a AS x, e1.b AS y, e2.b AS z
        |  FROM e e1 JOIN e e2 ON e1.b = e2.a
        |  JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b),
        |pn AS (SELECT node, count(*)::BIGINT AS n_tri FROM (
        |    SELECT x AS node FROM tri
        |    UNION ALL SELECT y FROM tri
        |    UNION ALL SELECT z FROM tri)
        |  GROUP BY 1)
        |SELECT d.node, d.deg,
        |  coalesce(pn.n_tri, 0)::BIGINT AS n_triangles,
        |  CASE WHEN d.deg >= 2 THEN
        |    round(2.0 * coalesce(pn.n_tri, 0) / (d.deg * (d.deg - 1)), 4)
        |  END AS clustering
        |FROM deg d LEFT JOIN pn ON d.node = pn.node
        |ORDER BY d.node""".stripMargin,
    "text_bm25" -> (bm25Cte +
      """SELECT doc_id, bm25 FROM bm
        |ORDER BY bm25 DESC, doc_id LIMIT 20""".stripMargin),
    "text_inverted_index" ->
      """WITH tok AS (SELECT doc_id AS doc,
        |    unnest(str_split(text, ' ')) AS term FROM documents),
        |tf AS (SELECT term, doc, count(*)::BIGINT AS tf FROM tok
        |  WHERE term <> '' GROUP BY 1, 2)
        |SELECT term, count(*)::BIGINT AS df, sum(tf)::BIGINT AS cf,
        |  string_agg(doc::VARCHAR || ':' || tf::VARCHAR, ',' ORDER BY doc)
        |    AS postings
        |FROM tf GROUP BY term ORDER BY term""".stripMargin,
    "q_rrf_fuse" -> (bm25Cte +
      """, ra AS (SELECT doc_id,
        |    row_number() OVER (ORDER BY bm25 DESC, doc_id) AS rank_a
        |  FROM bm QUALIFY rank_a <= 50),
        |rb AS (SELECT doc_id,
        |    row_number() OVER (ORDER BY length(text) DESC, doc_id) AS rank_b
        |  FROM documents QUALIFY rank_b <= 50)
        |SELECT coalesce(ra.doc_id, rb.doc_id) AS doc_id,
        |  round(coalesce(1.0 / (60 + rank_a), 0)
        |      + coalesce(1.0 / (60 + rank_b), 0), 6) AS rrf
        |FROM ra FULL OUTER JOIN rb ON ra.doc_id = rb.doc_id
        |ORDER BY rrf DESC, doc_id""".stripMargin),
    "q_scd2" -> (scd2Cte +
      """SELECT user_id, event_type, effective_from, effective_to, version,
        |  effective_to IS NULL AS is_current
        |FROM v ORDER BY user_id, version""".stripMargin),
    "q_scd2_asof" -> (scd2Cte +
      """SELECT user_id, event_type, effective_from, effective_to, version
        |FROM v
        |WHERE effective_from <= 1705363200000000
        |  AND (effective_to IS NULL OR 1705363200000000 < effective_to)
        |ORDER BY user_id""".stripMargin),
    "q_islands" ->
      """WITH iv AS (SELECT event_type, epoch_us(ts)::BIGINT AS s,
        |    epoch_us(ts)::BIGINT + floor(value * 60000000.0)::BIGINT AS e
        |  FROM events),
        |c AS (SELECT *, max(e) OVER (PARTITION BY event_type
        |    ORDER BY s, e ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |    AS maxe FROM iv),
        |f AS (SELECT *, CASE WHEN maxe IS NULL OR s > maxe
        |    THEN 1 ELSE 0 END AS nw FROM c),
        |g AS (SELECT *, sum(nw) OVER (PARTITION BY event_type
        |    ORDER BY s, e ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |    AS island FROM f)
        |SELECT event_type, min(s) AS island_start, max(e) AS island_end,
        |  count(*)::BIGINT AS n_merged
        |FROM g GROUP BY event_type, island
        |ORDER BY event_type, island_start""".stripMargin,
    "q_validate" ->
      """WITH rr AS (SELECT count(*)::BIGINT AS n,
        |    count(*) FILTER (WHERE l_quantity > 45)::BIGINT AS v1,
        |    count(*) FILTER (WHERE l_extendedprice <= 0)::BIGINT AS v2,
        |    count(*) FILTER (WHERE l_discount > 0.08)::BIGINT AS v3,
        |    count(*) FILTER (WHERE l_shipdate IS NULL)::BIGINT AS v4
        |  FROM lineitem),
        |u1 AS (SELECT (SELECT count(*) FROM lineitem)::BIGINT AS n,
        |    ((SELECT count(*) FROM lineitem) - (SELECT count(*) FROM
        |      (SELECT DISTINCT l_orderkey, l_linenumber FROM lineitem)))
        |      ::BIGINT AS v),
        |u2 AS (SELECT (SELECT count(*) FROM orders)::BIGINT AS n,
        |    ((SELECT count(*) FROM orders) - (SELECT count(*) FROM
        |      (SELECT DISTINCT o_custkey FROM orders)))::BIGINT AS v),
        |f1 AS (SELECT (SELECT count(*) FROM lineitem)::BIGINT AS n,
        |    (SELECT count(*) FROM lineitem l
        |      WHERE l.l_orderkey IS NOT NULL AND NOT EXISTS
        |        (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey))
        |      ::BIGINT AS v),
        |f2 AS (SELECT (SELECT count(*) FROM orders)::BIGINT AS n,
        |    (SELECT count(*) FROM orders o
        |      WHERE o.o_custkey IS NOT NULL AND NOT EXISTS
        |        (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey))
        |      ::BIGINT AS v),
        |rows_ AS (
        |  SELECT 'li_qty_le_45' AS rule, v1 AS n_violations, n AS n_rows
        |    FROM rr
        |  UNION ALL SELECT 'li_price_positive', v2, n FROM rr
        |  UNION ALL SELECT 'li_discount_cap', v3, n FROM rr
        |  UNION ALL SELECT 'li_shipdate_present', v4, n FROM rr
        |  UNION ALL SELECT 'li_pk_unique', v, n FROM u1
        |  UNION ALL SELECT 'orders_custkey_unique', v, n FROM u2
        |  UNION ALL SELECT 'li_fk_orders', v, n FROM f1
        |  UNION ALL SELECT 'orders_fk_customer', v, n FROM f2)
        |SELECT rule, n_violations, n_rows,
        |  round(n_violations / n_rows::DOUBLE, 4) AS violation_frac,
        |  n_violations = 0 AS passed
        |FROM rows_ ORDER BY rule""".stripMargin,
    "q_histogram" ->
      """WITH k AS (SELECT l_returnflag AS g, l_extendedprice::DOUBLE AS v
        |  FROM lineitem WHERE l_extendedprice IS NOT NULL),
        |s AS (SELECT g, min(v) AS lo, max(v) AS hi FROM k GROUP BY g),
        |w AS (SELECT g, lo, hi, CASE WHEN hi > lo THEN (hi - lo) / 20
        |    ELSE 1.0 END AS width FROM s),
        |b AS (SELECT k.g, CASE WHEN w.hi > w.lo
        |    THEN least(floor((k.v - w.lo) / w.width), 19)
        |    ELSE 0 END::BIGINT AS bucket
        |  FROM k JOIN w ON k.g = w.g),
        |c AS (SELECT g, bucket, count(*)::BIGINT AS n FROM b GROUP BY 1, 2),
        |grid AS (SELECT g, unnest(range(0, 20))::BIGINT AS bucket, lo, width
        |  FROM w)
        |SELECT grid.g AS l_returnflag, grid.bucket AS bucket,
        |  round(lo + grid.bucket * width, 6) AS lo_edge,
        |  round(lo + (grid.bucket + 1) * width, 6) AS hi_edge,
        |  coalesce(c.n, 0)::BIGINT AS n
        |FROM grid LEFT JOIN c ON grid.g = c.g AND grid.bucket = c.bucket
        |ORDER BY 1, 2""".stripMargin,
    "q_outliers_mad" ->
      """WITH b AS (SELECT source, doc_id, n_chars::DOUBLE AS v
        |  FROM documents WHERE n_chars IS NOT NULL),
        |m AS (SELECT source, quantile_cont(v, 0.5) AS med FROM b
        |  GROUP BY source),
        |d AS (SELECT b.source, b.doc_id, b.v, m.med, abs(b.v - m.med) AS ad
        |  FROM b JOIN m USING (source)),
        |md AS (SELECT source, quantile_cont(ad, 0.5) AS mad FROM d
        |  GROUP BY source),
        |z AS (SELECT d.source, d.doc_id, d.v, d.med, md.mad,
        |    CASE WHEN md.mad > 0 THEN round(0.6745 * d.ad / md.mad, 4)
        |         WHEN d.ad > 0 THEN 'infinity'::DOUBLE ELSE 0.0 END
        |      AS robust_z
        |  FROM d JOIN md USING (source))
        |SELECT source, doc_id, v AS value,
        |  round(med, 4) AS group_median, round(mad, 4) AS group_mad,
        |  robust_z
        |FROM z WHERE robust_z > 2.5
        |ORDER BY source, doc_id""".stripMargin,
    "text_distinctive" ->
      """WITH tok AS (SELECT source AS grp,
        |    unnest(list_filter(string_split(text, ' '), x -> x <> ''))
        |      AS term
        |  FROM documents),
        |gt AS (SELECT grp, term, count(*)::BIGINT AS y_iw
        |  FROM tok GROUP BY 1, 2),
        |tt AS (SELECT term, sum(y_iw)::BIGINT AS c_w FROM gt GROUP BY 1),
        |gr AS (SELECT grp, sum(y_iw)::BIGINT AS n_i FROM gt GROUP BY 1),
        |nn AS (SELECT sum(c_w)::DOUBLE AS n_total FROM tt),
        |sc AS (SELECT gt.grp, gt.term, gt.y_iw,
        |    1.0 * tt.c_w / nn.n_total AS a_w,
        |    (tt.c_w - gt.y_iw)::DOUBLE AS y_jw,
        |    nn.n_total - gr.n_i AS n_j, gr.n_i AS n_i
        |  FROM gt JOIN tt USING (term) JOIN gr USING (grp), nn
        |  WHERE gt.y_iw >= 5),
        |dd AS (SELECT grp, term, y_iw,
        |    ln((y_iw + a_w) / (n_i + 1.0 - y_iw - a_w))
        |      - ln((y_jw + a_w) / (n_j + 1.0 - y_jw - a_w)) AS delta,
        |    round((ln((y_iw + a_w) / (n_i + 1.0 - y_iw - a_w))
        |      - ln((y_jw + a_w) / (n_j + 1.0 - y_jw - a_w)))
        |      / sqrt(1.0 / (y_iw + a_w) + 1.0 / (y_jw + a_w)), 4) AS z
        |  FROM sc),
        |rk AS (SELECT grp AS source, term, y_iw AS n_group_term,
        |    round(delta, 4) AS delta, z,
        |    row_number() OVER (PARTITION BY grp ORDER BY z DESC, term)
        |      ::BIGINT AS rank
        |  FROM dd)
        |SELECT source, term, n_group_term, delta, z, rank FROM rk
        |WHERE rank <= 5 ORDER BY source, rank""".stripMargin,
    "ann_centroid_outliers" ->
      """WITH e AS (SELECT vec_id, label,
        |    generate_subscripts(embedding, 1) AS i,
        |    unnest(embedding)::DOUBLE AS x FROM embeddings),
        |c AS (SELECT label, i, round(avg(x), 6) AS m FROM e GROUP BY 1, 2),
        |d AS (SELECT e.vec_id, e.label, sum(e.x * c.m) AS dp,
        |    sqrt(sum(e.x * e.x)) AS nv, sqrt(sum(c.m * c.m)) AS nc
        |  FROM e JOIN c ON e.label = c.label AND e.i = c.i
        |  GROUP BY e.vec_id, e.label),
        |r AS (SELECT label, vec_id,
        |    round(CASE WHEN nv * nc > 0 THEN dp / (nv * nc)
        |      ELSE 0.0 END, 5) AS cosine
        |  FROM d),
        |rk AS (SELECT label, vec_id, cosine,
        |    row_number() OVER (PARTITION BY label ORDER BY cosine, vec_id)
        |      ::BIGINT AS rank
        |  FROM r)
        |SELECT label, vec_id, cosine, rank FROM rk WHERE rank <= 10
        |ORDER BY label, rank""".stripMargin,
    "q_hopping" ->
      """WITH e AS (SELECT epoch_us(ts)::BIGINT AS us, event_type, value
        |  FROM events),
        |x AS (SELECT ((us // 600000000) - i) * 600000000 AS w_start_us,
        |    event_type, value
        |  FROM e CROSS JOIN range(0, 3) t(i))
        |SELECT w_start_us, event_type, count(*)::BIGINT AS n,
        |  round(sum(value), 2) AS sum_value
        |FROM x GROUP BY 1, 2
        |ORDER BY w_start_us, event_type""".stripMargin,
    "q_psi_drift" ->
      """WITH r AS (SELECT n_chars::DOUBLE AS v FROM documents
        |  WHERE lang = 'en' AND n_chars IS NOT NULL),
        |c AS (SELECT n_chars::DOUBLE AS v FROM documents
        |  WHERE lang <> 'en' AND n_chars IS NOT NULL),
        |s AS (SELECT min(v) AS lo, max(v) AS hi FROM r),
        |w AS (SELECT lo, hi, CASE WHEN hi > lo THEN (hi - lo) / 10
        |    ELSE 1.0 END AS wd FROM s),
        |br AS (SELECT greatest(least(floor((r.v - w.lo) / w.wd), 9), 0)
        |    ::BIGINT AS bucket, count(*)::BIGINT AS n_ref
        |  FROM r, w GROUP BY 1),
        |bc AS (SELECT greatest(least(floor((c.v - w.lo) / w.wd), 9), 0)
        |    ::BIGINT AS bucket, count(*)::BIGINT AS n_new
        |  FROM c, w GROUP BY 1),
        |grid AS (SELECT unnest(range(0, 10))::BIGINT AS bucket, lo, wd
        |  FROM w),
        |j AS (SELECT grid.bucket, grid.lo, grid.wd,
        |    coalesce(br.n_ref, 0)::BIGINT AS n_ref,
        |    coalesce(bc.n_new, 0)::BIGINT AS n_new
        |  FROM grid LEFT JOIN br ON grid.bucket = br.bucket
        |    LEFT JOIN bc ON grid.bucket = bc.bucket),
        |t AS (SELECT sum(n_ref)::DOUBLE AS tr, sum(n_new)::DOUBLE AS tn
        |  FROM j),
        |p AS (SELECT j.*, greatest(j.n_ref / t.tr, 0.0001) AS p_ref,
        |    greatest(j.n_new / t.tn, 0.0001) AS p_new
        |  FROM j, t)
        |SELECT bucket, round(lo + bucket * wd, 6) AS lo_edge,
        |  round(lo + (bucket + 1) * wd, 6) AS hi_edge, n_ref, n_new,
        |  round(p_ref, 6) AS p_ref, round(p_new, 6) AS p_new,
        |  round((p_new - p_ref) * ln(p_new / p_ref), 6) AS contrib
        |FROM p ORDER BY bucket""".stripMargin,
    "q_compaction_plan" ->
      """WITH inv AS (SELECT o_orderpriority AS part,
        |    'f' || o_orderkey::VARCHAR AS file,
        |    (floor(o_totalprice) + 1)::BIGINT AS bytes FROM orders),
        |c AS (SELECT part, file, bytes,
        |    coalesce(sum(bytes) OVER (PARTITION BY part ORDER BY file
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS before
        |  FROM inv)
        |SELECT part, file, bytes, (before // 1000000)::BIGINT AS bin,
        |  (before - (before // 1000000) * 1000000)::BIGINT AS bin_offset
        |FROM c ORDER BY part, file""".stripMargin,
    "q_soundex_block" ->
      """WITH f AS (SELECT regexp_extract(lower(p_name), '^[a-z]+') AS w
        |  FROM part WHERE regexp_extract(lower(p_name), '^[a-z]+') <> ''),
        |t0 AS (SELECT w, translate(substr(w, 1, 1),
        |      'abcdefgijklmnopqrstuvxyz', '012301202245501262301202')
        |    || translate(translate(regexp_replace(w, '^.', ''),
        |      'hw', ''), 'abcdefgijklmnopqrstuvxyz',
        |      '012301202245501262301202') AS t
        |  FROM f),
        |t1 AS (SELECT w, regexp_replace(regexp_replace(regexp_replace(
        |    regexp_replace(regexp_replace(regexp_replace(regexp_replace(
        |    t, '0+', '0', 'g'), '1+', '1', 'g'), '2+', '2', 'g'),
        |    '3+', '3', 'g'), '4+', '4', 'g'), '5+', '5', 'g'),
        |    '6+', '6', 'g') AS t FROM t0),
        |c AS (SELECT w, upper(substr(w, 1, 1)) || rpad(substr(
        |    regexp_replace(regexp_replace(t, '^.', ''), '0', '', 'g'),
        |    1, 3), 3, '0') AS code FROM t1)
        |SELECT code, count(*)::BIGINT AS n_parts,
        |  count(DISTINCT w)::BIGINT AS n_words, min(w) AS sample_word
        |FROM c GROUP BY code ORDER BY code""".stripMargin,
    "q_phonetic_pairs" ->
      """WITH f AS (SELECT DISTINCT
        |    regexp_extract(lower(p_name), '^[a-z]+') AS w
        |  FROM part WHERE regexp_extract(lower(p_name), '^[a-z]+') <> ''
        |  UNION ALL SELECT * FROM (VALUES ('smith'), ('smyth'),
        |    ('ashcraft'), ('ashcroft'), ('robert'), ('rupert'),
        |    ('catherine'), ('kathryn'), ('jonathan'), ('jonothan'),
        |    ('claire'), ('clare'), ('mayer'), ('meier')) v(w)),
        |t0 AS (SELECT w, translate(substr(w, 1, 1),
        |      'abcdefgijklmnopqrstuvxyz', '012301202245501262301202')
        |    || translate(translate(regexp_replace(w, '^.', ''),
        |      'hw', ''), 'abcdefgijklmnopqrstuvxyz',
        |      '012301202245501262301202') AS t
        |  FROM f),
        |t1 AS (SELECT w, regexp_replace(regexp_replace(regexp_replace(
        |    regexp_replace(regexp_replace(regexp_replace(regexp_replace(
        |    t, '0+', '0', 'g'), '1+', '1', 'g'), '2+', '2', 'g'),
        |    '3+', '3', 'g'), '4+', '4', 'g'), '5+', '5', 'g'),
        |    '6+', '6', 'g') AS t FROM t0),
        |c AS (SELECT w, upper(substr(w, 1, 1)) || rpad(substr(
        |    regexp_replace(regexp_replace(t, '^.', ''), '0', '', 'g'),
        |    1, 3), 3, '0') AS code FROM t1)
        |SELECT a.w AS id_a, b.w AS id_b, a.code AS soundex,
        |  round(jaro_winkler_similarity(a.w, b.w), 4) AS sim
        |FROM c a JOIN c b ON a.code = b.code AND a.w < b.w
        |WHERE round(jaro_winkler_similarity(a.w, b.w), 4) >= 0.78
        |ORDER BY id_a, id_b""".stripMargin,
    "q_jaro_linkage" ->
      """SELECT a.p_partkey AS id_a, b.p_partkey AS id_b, a.p_brand,
        |  round(jaro_winkler_similarity(a.p_name, b.p_name), 4) AS sim
        |FROM part a JOIN part b ON a.p_brand = b.p_brand
        |  AND a.p_partkey < b.p_partkey
        |WHERE round(jaro_winkler_similarity(a.p_name, b.p_name), 4) >= 0.9
        |ORDER BY id_a, id_b""".stripMargin,
    "text_oov_rate" ->
      """WITH tok AS (SELECT doc_id,
        |    unnest(list_filter(string_split(text, ' '), x -> x <> ''))
        |      AS term
        |  FROM documents),
        |voc AS (SELECT term FROM (SELECT term,
        |      count(DISTINCT doc_id) AS df FROM tok GROUP BY 1)
        |  WHERE df >= 5),
        |j AS (SELECT t.doc_id, t.term, v.term IS NOT NULL AS inv
        |  FROM tok t LEFT JOIN voc v USING (term)),
        |a AS (SELECT doc_id, count(*)::BIGINT AS n_tokens,
        |    count(*) FILTER (WHERE NOT inv)::BIGINT AS n_oov
        |  FROM j GROUP BY 1)
        |SELECT d.doc_id, coalesce(a.n_tokens, 0)::BIGINT AS n_tokens,
        |  coalesce(a.n_oov, 0)::BIGINT AS n_oov,
        |  CASE WHEN coalesce(a.n_tokens, 0) > 0
        |    THEN round(coalesce(a.n_oov, 0) / a.n_tokens::DOUBLE, 4)
        |    ELSE 0.0 END AS oov_frac
        |FROM documents d LEFT JOIN a USING (doc_id)
        |ORDER BY d.doc_id""".stripMargin,
    "q_entropy" ->
      """WITH pairs AS (
        |  SELECT 'lang' AS col_name, lang::VARCHAR AS v FROM documents
        |  UNION ALL
        |  SELECT 'source', source::VARCHAR FROM documents),
        |c AS (SELECT col_name, v, count(*)::BIGINT AS c FROM pairs
        |  GROUP BY 1, 2),
        |a AS (SELECT col_name, sum(c)::BIGINT AS n,
        |    coalesce(sum(c) FILTER (WHERE v IS NULL), 0)::BIGINT
        |      AS n_nulls,
        |    count(*) FILTER (WHERE v IS NOT NULL)::BIGINT AS n_distinct,
        |    (sum(c) FILTER (WHERE v IS NOT NULL))::DOUBLE AS nn,
        |    sum(c * ln(c)) FILTER (WHERE v IS NOT NULL) AS clogc
        |  FROM c GROUP BY 1)
        |SELECT col_name, n, n_nulls, n_distinct,
        |  round(CASE WHEN nn > 0 THEN ln(nn) - clogc / nn
        |    ELSE 0.0 END, 4) AS entropy,
        |  round(CASE WHEN n_distinct > 1
        |    THEN (ln(nn) - clogc / nn) / ln(n_distinct::DOUBLE)
        |    ELSE 0.0 END, 4) AS norm_entropy
        |FROM a ORDER BY col_name""".stripMargin,
    "q_mutual_info" ->
      """WITH j AS (SELECT l_returnflag::VARCHAR AS a,
        |    l_linestatus::VARCHAR AS b, count(*)::BIGINT AS c_ab
        |  FROM lineitem
        |  WHERE l_returnflag IS NOT NULL AND l_linestatus IS NOT NULL
        |  GROUP BY 1, 2),
        |ma AS (SELECT a, sum(c_ab)::BIGINT AS c_a FROM j GROUP BY 1),
        |mb AS (SELECT b, sum(c_ab)::BIGINT AS c_b FROM j GROUP BY 1),
        |t AS (SELECT sum(c_ab)::DOUBLE AS n FROM j)
        |SELECT max(t.n)::BIGINT AS n,
        |  count(DISTINCT j.a)::BIGINT AS n_distinct_a,
        |  count(DISTINCT j.b)::BIGINT AS n_distinct_b,
        |  round(coalesce(sum((j.c_ab / t.n)
        |    * ln(t.n * j.c_ab / (ma.c_a * mb.c_b))), 0.0), 4) AS mi
        |FROM j JOIN ma USING (a) JOIN mb USING (b), t""".stripMargin,
    "q_winsorize" ->
      """WITH b AS (SELECT source, doc_id, n_chars::DOUBLE AS v
        |  FROM documents WHERE n_chars IS NOT NULL),
        |c AS (SELECT source, quantile_cont(v, 0.05) AS lo,
        |    quantile_cont(v, 0.95) AS hi FROM b GROUP BY source)
        |SELECT b.source, b.doc_id, b.v AS value,
        |  round(greatest(least(b.v, c.hi), c.lo), 4) AS clipped,
        |  (b.v > c.hi OR b.v < c.lo) AS was_clipped
        |FROM b JOIN c USING (source) ORDER BY source, doc_id""".stripMargin,
    "q_cusum" ->
      """WITH RECURSIVE e AS (SELECT event_type AS k,
        |    epoch_us(ts)::BIGINT // 86400000000 AS d, value FROM events),
        |daily AS (SELECT k, d, round(avg(value), 4) AS x FROM e
        |  GROUP BY 1, 2),
        |st AS (SELECT k, avg(x) AS mu, coalesce(stddev_samp(x), 0.0) AS sd
        |  FROM daily GROUP BY 1),
        |seq AS (SELECT daily.k, d, x, mu, sd,
        |    row_number() OVER (PARTITION BY daily.k ORDER BY d) AS rn
        |  FROM daily JOIN st ON daily.k = st.k),
        |r AS (
        |  SELECT k, rn, d, x, mu, sd,
        |    greatest(0.0, x - mu - 0.5 * sd) AS hi,
        |    greatest(0.0, mu - x - 0.5 * sd) AS lo
        |  FROM seq WHERE rn = 1
        |  UNION ALL
        |  SELECT s.k, s.rn, s.d, s.x, s.mu, s.sd,
        |    greatest(0.0, r.hi + (s.x - s.mu - 0.5 * s.sd)),
        |    greatest(0.0, r.lo + (s.mu - s.x - 0.5 * s.sd))
        |  FROM r JOIN seq s ON s.k = r.k AND s.rn = r.rn + 1)
        |SELECT k AS event_type, d AS ts, x, round(hi, 4) AS cusum_hi,
        |  round(lo, 4) AS cusum_lo,
        |  (hi > 4.0 * sd OR lo > 4.0 * sd) AS alarm
        |FROM r ORDER BY event_type, ts""".stripMargin,
    "q_ewma" ->
      """WITH RECURSIVE e AS (SELECT event_type AS k,
        |    epoch_us(ts)::BIGINT // 86400000000 AS d, value FROM events),
        |daily AS (SELECT k, d, round(avg(value), 4) AS x FROM e
        |  GROUP BY 1, 2),
        |seq AS (SELECT k, d, x,
        |    row_number() OVER (PARTITION BY k ORDER BY d) AS rn
        |  FROM daily),
        |r AS (
        |  SELECT k, rn, d, x, x AS ew FROM seq WHERE rn = 1
        |  UNION ALL
        |  SELECT s.k, s.rn, s.d, s.x, 0.3 * s.x + 0.7 * r.ew
        |  FROM r JOIN seq s ON s.k = r.k AND s.rn = r.rn + 1)
        |SELECT k AS event_type, d AS ts, x, round(ew, 4) AS ewma
        |FROM r ORDER BY event_type, ts""".stripMargin,
    "q_rolling_z" ->
      """WITH e AS (SELECT event_type AS k,
        |    epoch_us(ts)::BIGINT // 86400000000 AS d, value FROM events),
        |daily AS (SELECT k, d, round(avg(value), 4) AS x FROM e
        |  GROUP BY 1, 2),
        |w AS (SELECT k, d, x,
        |    count(x) OVER win AS nh,
        |    avg(x) OVER win AS m,
        |    stddev_samp(x) OVER win AS sd
        |  FROM daily
        |  WINDOW win AS (PARTITION BY k ORDER BY d
        |    ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)),
        |z AS (SELECT k, d, x, nh, m,
        |    CASE WHEN nh >= 3 AND sd > 0 THEN round((x - m) / sd, 4)
        |    END AS z
        |  FROM w)
        |SELECT k AS event_type, d AS ts, x, nh::BIGINT AS n_hist,
        |  round(m, 4) AS mean_hist, z,
        |  coalesce(abs(z) > 2.5, false) AS anomaly
        |FROM z ORDER BY event_type, ts""".stripMargin,
    "q_acf" ->
      """WITH e AS (SELECT event_type AS k,
        |    epoch_us(ts)::BIGINT // 86400000000 AS d, value FROM events),
        |daily AS (SELECT k, d, round(avg(value), 4) AS x FROM e
        |  GROUP BY 1, 2),
        |lagged AS (SELECT k, x,
        |    lag(x, 1) OVER win AS l1, lag(x, 2) OVER win AS l2,
        |    lag(x, 3) OVER win AS l3, lag(x, 4) OVER win AS l4,
        |    lag(x, 5) OVER win AS l5, lag(x, 6) OVER win AS l6,
        |    lag(x, 7) OVER win AS l7
        |  FROM daily WINDOW win AS (PARTITION BY k ORDER BY d, x)),
        |per AS (SELECT k,
        |    count(l1)::BIGINT AS n1, corr(x, l1) AS r1,
        |    count(l2)::BIGINT AS n2, corr(x, l2) AS r2,
        |    count(l3)::BIGINT AS n3, corr(x, l3) AS r3,
        |    count(l4)::BIGINT AS n4, corr(x, l4) AS r4,
        |    count(l5)::BIGINT AS n5, corr(x, l5) AS r5,
        |    count(l6)::BIGINT AS n6, corr(x, l6) AS r6,
        |    count(l7)::BIGINT AS n7, corr(x, l7) AS r7
        |  FROM lagged GROUP BY k),
        |u AS (
        |  SELECT k, 1 AS lag, n1 AS n_pairs, r1 AS r FROM per UNION ALL
        |  SELECT k, 2, n2, r2 FROM per UNION ALL
        |  SELECT k, 3, n3, r3 FROM per UNION ALL
        |  SELECT k, 4, n4, r4 FROM per UNION ALL
        |  SELECT k, 5, n5, r5 FROM per UNION ALL
        |  SELECT k, 6, n6, r6 FROM per UNION ALL
        |  SELECT k, 7, n7, r7 FROM per)
        |SELECT k AS event_type, lag::INTEGER AS lag, n_pairs,
        |  round(r, 4) AS acf
        |FROM u ORDER BY event_type, lag""".stripMargin,
    "q_holt" ->
      """WITH RECURSIVE e AS (SELECT event_type AS k,
        |    epoch_us(ts)::BIGINT // 86400000000 AS d, value FROM events),
        |daily AS (SELECT k, d, round(avg(value), 4) AS x FROM e
        |  GROUP BY 1, 2),
        |seq AS (SELECT k, d, x,
        |    row_number() OVER (PARTITION BY k ORDER BY d) AS rn
        |  FROM daily),
        |r AS (
        |  SELECT k, rn, d, x, x AS l, 0.0::DOUBLE AS b FROM seq WHERE rn = 1
        |  UNION ALL
        |  SELECT s.k, s.rn, s.d, s.x,
        |    0.3 * s.x + 0.7 * (r.l + r.b),
        |    0.2 * ((0.3 * s.x + 0.7 * (r.l + r.b)) - r.l) + 0.8 * r.b
        |  FROM r JOIN seq s ON s.k = r.k AND s.rn = r.rn + 1)
        |SELECT k AS event_type, d AS ts, x, round(l, 4) AS level,
        |  round(b, 4) AS trend, round(l + b, 4) AS forecast_next
        |FROM r ORDER BY event_type, ts""".stripMargin,
    "q_benford" ->
      """WITH v AS (SELECT abs(l_extendedprice::DOUBLE) AS a
        |  FROM lineitem
        |  WHERE l_extendedprice IS NOT NULL AND abs(l_extendedprice) > 0),
        |c AS (SELECT floor(a / pow(10, floor(log10(a))))::BIGINT AS digit,
        |    count(*)::BIGINT AS n FROM v GROUP BY 1),
        |t AS (SELECT sum(n)::DOUBLE AS tot FROM c)
        |SELECT g.digit, coalesce(c.n, 0)::BIGINT AS n,
        |  round(coalesce(c.n, 0) / t.tot, 6) AS p_obs,
        |  round(log10(1 + 1.0 / g.digit), 6) AS p_benford,
        |  round(pow(coalesce(c.n, 0) - t.tot * log10(1 + 1.0 / g.digit), 2)
        |    / (t.tot * log10(1 + 1.0 / g.digit)), 4) AS chi2_term
        |FROM (SELECT unnest(range(1, 10))::BIGINT AS digit) g
        |LEFT JOIN c USING (digit), t ORDER BY g.digit""".stripMargin,
    "q_concentration" ->
      """WITH t AS (SELECT o_custkey AS k, sum(o_totalprice::DOUBLE) AS x
        |  FROM orders GROUP BY 1),
        |r AS (SELECT x,
        |    row_number() OVER (ORDER BY x, k)::DOUBLE AS i FROM t)
        |SELECT count(*)::BIGINT AS n_keys, round(sum(x), 4) AS total,
        |  round(2.0 * sum(i * x) / (count(*) * sum(x))
        |    - (count(*) + 1.0) / count(*), 4) AS gini,
        |  round(sum(x * x) / pow(sum(x), 2), 4) AS hhi,
        |  round(max(x) / sum(x), 4) AS top_share
        |FROM r""".stripMargin,
    "q_cohen_kappa" ->
      """WITH lab AS (SELECT
        |    CASE WHEN n_chars < 200 THEN 'short'
        |         WHEN n_chars < 800 THEN 'mid' ELSE 'long' END AS a,
        |    CASE WHEN len(list_filter(string_split(text, ' '),
        |        x -> x <> '')) < 40 THEN 'short'
        |      WHEN len(list_filter(string_split(text, ' '),
        |        x -> x <> '')) < 160 THEN 'mid'
        |      ELSE 'long' END AS b
        |  FROM documents),
        |j AS (SELECT a, b, count(*)::BIGINT AS c FROM lab GROUP BY 1, 2),
        |ma AS (SELECT a, sum(c) AS ca FROM j GROUP BY 1),
        |mb AS (SELECT b, sum(c) AS cb FROM j GROUP BY 1),
        |tt AS (SELECT sum(c)::DOUBLE AS n FROM j),
        |pe AS (SELECT coalesce(sum(ma.ca * mb.cb), 0)::DOUBLE AS pen
        |  FROM ma JOIN mb ON ma.a = mb.b),
        |ag AS (SELECT coalesce(sum(c), 0)::DOUBLE AS agree FROM j
        |  WHERE a = b),
        |p AS (SELECT tt.n, round(ag.agree / tt.n, 4) AS p_o,
        |    round(pe.pen / (tt.n * tt.n), 4) AS p_e FROM tt, pe, ag)
        |SELECT n::BIGINT AS n, p_o, p_e,
        |  CASE WHEN p_e < 1.0
        |    THEN round((p_o - p_e) / (1.0 - p_e), 4) ELSE 1.0 END AS kappa
        |FROM p""".stripMargin,
    "q_split_train" ->
      """WITH h AS (SELECT doc_id,
        |    md5(concat('42|', doc_id::VARCHAR)) AS hh FROM documents),
        |u AS (SELECT doc_id,
        |    round(CAST(('0x' || substring(hh, 1, 8)) AS BIGINT)
        |      / 4294967296.0, 6) AS u FROM h)
        |SELECT doc_id, u,
        |  CASE WHEN u < 0.9 THEN 'train'
        |       WHEN u < 0.95 THEN 'val' ELSE 'test' END AS split
        |FROM u ORDER BY doc_id""".stripMargin,
    "q_top_paths" ->
      """WITH e AS (SELECT user_id AS u, epoch_us(ts)::BIGINT AS t,
        |    event_type AS et FROM events),
        |p AS (SELECT u, array_to_string(
        |    (list(et ORDER BY t, et))[1:3], '>') AS path
        |  FROM e GROUP BY u),
        |c AS (SELECT path, count(*)::BIGINT AS n_users FROM p GROUP BY 1),
        |tt AS (SELECT sum(n_users)::DOUBLE AS tot FROM c),
        |r AS (SELECT path, n_users, round(n_users / tt.tot, 4) AS share,
        |    row_number() OVER (ORDER BY n_users DESC, path)::BIGINT AS rank
        |  FROM c, tt)
        |SELECT path, n_users, share, rank FROM r WHERE rank <= 15
        |ORDER BY rank""".stripMargin,
    "q_temperature_sample" ->
      """WITH c AS (SELECT lang, count(*)::DOUBLE AS n FROM documents
        |  GROUP BY lang),
        |p AS (SELECT lang, n, pow(n, 0.5) AS w FROM c),
        |m AS (SELECT min(n / w) AS rmin FROM p),
        |q AS (SELECT lang, floor(w * rmin + 1e-9)::BIGINT AS quota FROM p, m),
        |r AS (SELECT doc_id, lang,
        |    row_number() OVER (PARTITION BY lang
        |      ORDER BY md5(concat('42|', doc_id::VARCHAR)), doc_id) AS rn
        |  FROM documents)
        |SELECT doc_id, lang FROM r JOIN q USING (lang)
        |WHERE rn <= quota ORDER BY doc_id""".stripMargin,
    "q_balanced_sample" ->
      """WITH n AS (SELECT min(c) AS target FROM (
        |    SELECT count(*)::BIGINT AS c FROM documents GROUP BY lang)),
        |r AS (SELECT doc_id, lang,
        |    row_number() OVER (PARTITION BY lang
        |      ORDER BY md5(concat('42|', doc_id::VARCHAR)), doc_id) AS rn
        |  FROM documents)
        |SELECT doc_id, lang FROM r, n WHERE rn <= n.target
        |ORDER BY doc_id""".stripMargin,
    "q_dwell" ->
      """WITH e AS (SELECT user_id AS u, epoch_us(ts)::BIGINT AS t,
        |    event_type AS et FROM events),
        |w AS (SELECT et,
        |    (lead(t) OVER (PARTITION BY u ORDER BY t, et) - t) / 1e6
        |      AS gap FROM e),
        |g AS (SELECT et, gap FROM w WHERE gap IS NOT NULL)
        |SELECT et AS event_type, count(*)::BIGINT AS n_gaps,
        |  round(avg(gap), 3) AS avg_s,
        |  round(quantile_cont(gap, 0.5), 3) AS p50_s,
        |  round(quantile_cont(gap, 0.9), 3) AS p90_s,
        |  round(max(gap), 3) AS max_s
        |FROM g GROUP BY et ORDER BY event_type""".stripMargin,
    "q_retrieval_eval" ->
      """WITH tok AS (SELECT doc_id,
        |    unnest(list_filter(string_split(text, ' '), x -> x <> ''))
        |      AS w FROM documents),
        |tf AS (SELECT w AS qid, doc_id AS doc, count(*)::BIGINT AS tf
        |  FROM tok WHERE w IN ('query', 'dup', 'spark') GROUP BY 1, 2),
        |res AS (SELECT tf.qid, tf.doc, row_number() OVER (
        |      PARTITION BY tf.qid ORDER BY d.n_chars DESC, tf.doc)
        |      ::BIGINT AS rank
        |  FROM tf JOIN documents d ON d.doc_id = tf.doc
        |  QUALIFY rank <= 10),
        |qr AS (SELECT qid, doc, least(tf, 3)::DOUBLE AS grade FROM tf),
        |nrel AS (SELECT qid,
        |    count(*) FILTER (WHERE grade > 0)::BIGINT AS n_rel
        |  FROM qr GROUP BY 1),
        |j AS (SELECT r.qid, r.doc, r.rank, coalesce(q.grade, 0.0) AS grade
        |  FROM res r LEFT JOIN qr q ON q.qid = r.qid AND q.doc = r.doc),
        |h AS (SELECT qid,
        |    count(*) FILTER (WHERE grade > 0)::BIGINT AS n_hit,
        |    min(rank) FILTER (WHERE grade > 0) AS first_rel,
        |    sum((pow(2.0, grade) - 1.0) / (ln(rank + 1.0) / ln(2.0)))
        |      AS dcg
        |  FROM j GROUP BY 1),
        |ideal AS (SELECT qid, grade, row_number() OVER (
        |      PARTITION BY qid ORDER BY grade DESC, doc)::BIGINT AS irank
        |  FROM qr WHERE grade > 0 QUALIFY irank <= 10),
        |i AS (SELECT qid,
        |    sum((pow(2.0, grade) - 1.0) / (ln(irank + 1.0) / ln(2.0)))
        |      AS idcg
        |  FROM ideal GROUP BY 1)
        |SELECT n.qid, n.n_rel,
        |  round(CASE WHEN n.n_rel > 0
        |    THEN coalesce(h.n_hit, 0) / n.n_rel::DOUBLE
        |    ELSE 0.0 END, 4) AS recall_k,
        |  round(coalesce(h.n_hit, 0) / 10.0, 4) AS precision_k,
        |  round(coalesce(1.0 / h.first_rel, 0.0), 4) AS mrr_k,
        |  round(CASE WHEN i.idcg > 0
        |    THEN coalesce(h.dcg, 0.0) / i.idcg
        |    ELSE 0.0 END, 4) AS ndcg_k
        |FROM nrel n LEFT JOIN h USING (qid) LEFT JOIN i USING (qid)
        |ORDER BY qid""".stripMargin,
    "q_classifier_metrics" -> (classifierEvalCte +
      """m AS (SELECT count(*)::BIGINT AS n,
        |    count(*) FILTER (WHERE score >= 0.03 AND label)::BIGINT AS tp,
        |    count(*) FILTER (WHERE score >= 0.03 AND NOT label)::BIGINT
        |      AS fp,
        |    count(*) FILTER (WHERE score < 0.03 AND NOT label)::BIGINT
        |      AS tn,
        |    count(*) FILTER (WHERE score < 0.03 AND label)::BIGINT AS fn
        |  FROM sc WHERE score IS NOT NULL AND label IS NOT NULL)
        |SELECT n, tp, fp, tn, fn,
        |  round(CASE WHEN n > 0 THEN (tp + tn) / n::DOUBLE
        |    ELSE 0.0 END, 4) AS accuracy,
        |  round(CASE WHEN tp + fp > 0 THEN tp / (tp + fp)::DOUBLE
        |    ELSE 0.0 END, 4) AS precision,
        |  round(CASE WHEN tp + fn > 0 THEN tp / (tp + fn)::DOUBLE
        |    ELSE 0.0 END, 4) AS recall,
        |  round(CASE WHEN 2 * tp + fp + fn > 0
        |    THEN 2.0 * tp / (2 * tp + fp + fn)::DOUBLE
        |    ELSE 0.0 END, 4) AS f1
        |FROM m""".stripMargin),
    "q_calibration" -> (classifierEvalCte +
      """b AS (SELECT least(floor(score * 10), 9)::BIGINT AS bucket,
        |    count(*)::BIGINT AS n, avg(score) AS conf,
        |    avg(label::INT::DOUBLE) AS acc
        |  FROM sc WHERE score IS NOT NULL AND label IS NOT NULL
        |    AND score >= 0.0 AND score <= 1.0
        |  GROUP BY 1)
        |SELECT g.bucket, coalesce(b.n, 0)::BIGINT AS n,
        |  round(b.conf, 4) AS mean_score, round(b.acc, 4) AS frac_pos,
        |  round(b.acc - b.conf, 4) AS gap
        |FROM (SELECT unnest(range(0, 10))::BIGINT AS bucket) g
        |LEFT JOIN b ON g.bucket = b.bucket
        |ORDER BY g.bucket""".stripMargin),
    "q_roc_auc" -> (classifierEvalCte +
      """ps AS (SELECT score,
        |    count(*) FILTER (WHERE label)::BIGINT AS np,
        |    count(*) FILTER (WHERE NOT label)::BIGINT AS nn
        |  FROM sc WHERE score IS NOT NULL AND label IS NOT NULL
        |  GROUP BY score),
        |c AS (SELECT *, coalesce(sum(nn) OVER (ORDER BY score
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |    AS below FROM ps)
        |SELECT sum(np + nn)::BIGINT AS n, sum(np)::BIGINT AS n_pos,
        |  sum(nn)::BIGINT AS n_neg,
        |  round(CASE WHEN sum(np) > 0 AND sum(nn) > 0
        |    THEN sum(np * (below + nn / 2.0))
        |      / (sum(np) * sum(nn))::DOUBLE
        |    ELSE 0.0 END, 4) AS auc
        |FROM c""".stripMargin)
  )

  /** Shared classifier-eval CTE (`sc(doc_id, score, label)`): the exact
   * frame [[classifierEvalFrame]] builds — {the,and,of}-token density
   * 4dp over the nonempty-token count, label = lang = 'en'. */
  private val classifierEvalCte: String =
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
  private val scd2Cte: String =
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
}
