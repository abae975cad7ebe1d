package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ebw.{DesignMatrix, EbwOptions, EntropyBalance, GroupedEntropyBalance}
import graft.ops.{Dedup, Similarity, Skew, TextMetrics}
import graft.QShared._

/** embedding/ANN gates (top-k, LSH, IVF, PQ, retrieval eval) — one `queries` entry per gate with its DuckDB oracle in
 * `oracles` (same names, same column aliases, same rounding; the
 * SparkEntry contract). Split out of the SparkEntry monolith so an
 * edit to one family can never touch another family's oracle text. */
private[graft] object QueriesAnn {
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
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
    "ann_lsh" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val q = emb.filter(col("vec_id") === 0)
        .select(col("embedding").cast("array<double>")).collect()(0)
        .getSeq[Double](0)
      Similarity.lshTopK(emb.filter(col("vec_id") =!= 0), "embedding",
          "vec_id", q, 10, bits = 3, roundDigits = Some(5))
        .orderBy(desc("cosine"), col("vec_id"))
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
    "ann_norm_profile" -> ((s, dir) =>
      // embedding plumbing sanity: null/zero/non-finite counts, dim
      // spread, exact norm quantiles — the check that runs BEFORE any
      // cosine math trusts the corpus
      graft.ops.Similarity.normProfile(t(s, dir, "embeddings"),
        "embedding")),
    "ann_centroid_drift" -> ((s, dir) => {
      // embedding-distribution drift: per-dimension mean shift between
      // the even-id snapshot (reference) and the odd-id snapshot
      // (current) — the embedding member of the drift family (PSI =
      // numeric, KL/JS = text, this = vectors)
      val e = t(s, dir, "embeddings")
      graft.ops.Similarity.centroidDrift(
          e.filter(col("vec_id") % 2 === 0),
          e.filter(col("vec_id") % 2 =!= 0), "embedding")
        .orderBy("pos")
    }),
    "ann_centroid_sim" -> ((s, dir) =>
      // domain-similarity map: pairwise cosine between label centroids
      // — the labels-sized self-join, never the corpus
      graft.ops.Similarity.centroidSimMatrix(t(s, dir, "embeddings"),
          "embedding", "label")
        .orderBy("label_a", "label_b")),
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
    "ann_centroid_outliers" -> ((s, dir) => {
      // least-central members per embedding label (cosine to own-label
      // centroid, bottom-10) — the label-noise/off-topic detector;
      // centroids are labels×dim rows, joined back broadcast-sized
      graft.ops.Similarity.centroidOutliers(t(s, dir, "embeddings"),
          "vec_id", "embedding", "label", bottomK = 10)
        .orderBy("label", "rank")
    }),
    "ann_silhouette" -> ((s, dir) =>
      // simplified (centroid-form) silhouette over the label
      // clustering: per cluster, mean/min of (b−a)/max(a,b) with a =
      // own-centroid distance, b = nearest-other distance — the
      // choose-k readout before a SemDeDup prune; one zero-shuffle
      // argmin scan, clusters-sized output
      graft.ops.Similarity.silhouetteSimplified(t(s, dir, "embeddings"),
          "embedding", "label")
        .orderBy("cluster")),
  )

  val oracles: Map[String, String] = Map(
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
    "ann_lsh" -> annLshOracle,
    "ann_norm_profile" ->
      """WITH m AS (SELECT embedding IS NULL AS isn,
        |    CASE WHEN embedding IS NOT NULL
        |      THEN len(embedding) END AS dim,
        |    CASE WHEN embedding IS NOT NULL THEN list_aggregate(
        |      list_transform(embedding, x -> isfinite(x)), 'bool_and')
        |      END AS fin,
        |    CASE WHEN embedding IS NOT NULL AND list_aggregate(
        |        list_transform(embedding, x -> isfinite(x)), 'bool_and')
        |      THEN sqrt(list_sum(list_transform(embedding,
        |        x -> x * x))) END AS nrm
        |  FROM embeddings)
        |SELECT count(*)::BIGINT AS n,
        |  sum(CASE WHEN isn THEN 1 ELSE 0 END)::BIGINT AS n_null,
        |  sum(CASE WHEN nrm = 0.0 THEN 1 ELSE 0 END)::BIGINT AS n_zero,
        |  sum(CASE WHEN fin = false THEN 1 ELSE 0 END)::BIGINT
        |    AS n_nonfinite,
        |  min(dim) AS dim_min, max(dim) AS dim_max,
        |  round(quantile_cont(nrm, 0.01), 6) AS norm_p01,
        |  round(quantile_cont(nrm, 0.5), 6) AS norm_p50,
        |  round(quantile_cont(nrm, 0.99), 6) AS norm_p99
        |FROM m""".stripMargin,
    "ann_centroid_drift" ->
      """WITH r AS (SELECT generate_subscripts(embedding, 1) - 1 AS pos,
        |    unnest(embedding)::DOUBLE AS x FROM embeddings
        |  WHERE vec_id % 2 = 0),
        |c AS (SELECT generate_subscripts(embedding, 1) - 1 AS pos,
        |    unnest(embedding)::DOUBLE AS x FROM embeddings
        |  WHERE vec_id % 2 <> 0),
        |mr AS (SELECT pos, round(avg(x), 6) AS mean_ref,
        |    count(*)::BIGINT AS n_ref FROM r GROUP BY pos),
        |mc AS (SELECT pos, round(avg(x), 6) AS mean_cur,
        |    count(*)::BIGINT AS n_cur FROM c GROUP BY pos)
        |SELECT pos, coalesce(n_ref, 0)::BIGINT AS n_ref,
        |  coalesce(n_cur, 0)::BIGINT AS n_cur, mean_ref, mean_cur,
        |  round(mean_cur - mean_ref, 6) + 0.0 AS delta
        |FROM mr FULL OUTER JOIN mc USING (pos)
        |ORDER BY pos""".stripMargin,
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
    "ann_mmr" -> mmrOracle(5, 0.7),
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
    // simplified silhouette replay: 6dp centroids, per (point, centroid)
    // squared euclidean, a = own / b = nearest-other (both 6dp after
    // sqrt, so the s division replays bit-for-bit), mean 4dp
    "ann_silhouette" ->
      """WITH e AS (SELECT vec_id, label,
        |    generate_subscripts(embedding, 1) AS i,
        |    unnest(embedding)::DOUBLE AS x FROM embeddings
        |  WHERE embedding IS NOT NULL AND label IS NOT NULL),
        |c AS (SELECT label AS cl, i, round(avg(x), 6) AS m
        |  FROM e GROUP BY 1, 2),
        |d AS (SELECT e.vec_id, e.label, c.cl,
        |    sum((e.x - c.m) * (e.x - c.m)) AS d2
        |  FROM e JOIN c ON e.i = c.i GROUP BY 1, 2, 3),
        |ab AS (SELECT vec_id, label,
        |    round(sqrt(min(CASE WHEN cl = label THEN d2 END)), 6) AS a,
        |    round(sqrt(min(CASE WHEN cl <> label THEN d2 END)), 6) AS b
        |  FROM d GROUP BY 1, 2),
        |s AS (SELECT label, CASE WHEN greatest(a, b) > 0
        |    THEN round((b - a) / greatest(a, b), 6) ELSE 0.0 END AS s
        |  FROM ab)
        |SELECT label AS cluster, count(*)::BIGINT AS n,
        |  round(avg(s), 4) AS mean_s, min(s) + 0.0 AS min_s
        |FROM s GROUP BY 1 ORDER BY cluster""".stripMargin,
  )
}
