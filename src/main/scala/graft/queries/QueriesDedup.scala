package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ebw.{DesignMatrix, EbwOptions, EntropyBalance, GroupedEntropyBalance}
import graft.ops.{Dedup, Similarity, Skew, TextMetrics}
import graft.QShared._

/** document-dedup gates (exact, MinHash, SimHash, semantic, spans) — one `queries` entry per gate with its DuckDB oracle in
 * `oracles` (same names, same column aliases, same rounding; the
 * SparkEntry contract). Split out of the SparkEntry monolith so an
 * edit to one family can never touch another family's oracle text. */
private[graft] object QueriesDedup {
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dedup_source_overlap" -> ((s, dir) =>
      // feeds-level dedup planning: pairwise 3-shingle Jaccard between
      // document sources, every pair materialized (0-overlap rows
      // included — "these feeds are disjoint" is a finding)
      graft.ops.Dedup.sourceOverlap(t(s, dir, "documents"), "text",
          "source")
        .orderBy("source_a", "source_b")),
    // §2c — LLM-data pipeline ops
    "dedup_exact" -> ((s, dir) =>
      Dedup.exact(t(s, dir, "documents"), "text", "doc_id").orderBy("content_hash")),
    "dedup_report" -> ((s, dir) => {
      // per-source dedup-rate telemetry: one exact copy and one
      // near-dup copy of every doc, so each source reads n_docs 3x its
      // corpus share with one third exact-dropped, one third
      // near-dropped, one third kept — the fate rules are exactly the
      // curation pipeline's dedup stages, replayed per feed
      val docs = t(s, dir, "documents").select("doc_id", "text", "source")
      val exactDups = docs.select((col("doc_id") + 1000000).as("doc_id"),
        col("text"), col("source"))
      val nearDups = docs.select((col("doc_id") + 2000000).as("doc_id"),
        concat(col("text"), lit(" tail tokens appended here")).as("text"),
        col("source"))
      Dedup.dedupReport(docs.unionByName(exactDups).unionByName(nearDups),
          "text", "doc_id", "source", maxBucketSize = ngramMaxBucket)
        .orderBy("source")
    }),
    "dedup_homoglyph" -> ((s, dir) => {
      // homoglyph-spam dedup: odd ids carry the PRECEDING even doc's
      // text with Latin aeopcxy swapped to Cyrillic lookalikes and a
      // zero-width space planted up front — pixel-identical text that
      // walks through exact/shingle dedup, caught by the TR#39
      // confusable skeleton; the oracle replays the planting AND the
      // skeleton verbatim (translate/lower/md5 are engine-shared)
      val even = t(s, dir, "documents").select("doc_id", "text")
        .filter(col("doc_id") % 2 === 0)
      val odd = even.select((col("doc_id") + 1).as("doc_id"),
        concat(lit("\u200b"),
          translate(col("text"), "aeopcxy", "аеорсху")).as("text"))
      Dedup.homoglyphDedup(even.unionByName(odd), "text", "doc_id")
        .orderBy("doc_id")
    }),
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
    "dedup_simhash_pairs_mb" -> ((s, dir) => {
      // the d = 2 multi-block SCALE path (Manku composite keys — the
      // shape a 100 TB corpus actually runs, PairScaling-measured 6.4x
      // faster than d = 1 at 128x) under the same full-SQL oracle:
      // portable md5 composite keys over the portable fingerprint, hot
      // buckets capped, exact hamming verification. The spec pins the
      // verified pair set identical to d = 1 (exact pigeonhole recall),
      // so this gate and dedup_simhash_pairs must agree row-for-row.
      val docs = t(s, dir, "documents").select("doc_id", "text")
      val mutated = docs.select((col("doc_id") + 1000000).as("doc_id"),
        concat(col("text"), lit(" tail tokens appended here")).as("text"))
      Dedup.simhashCandidatePairs(docs.unionAll(mutated), "text", "doc_id",
          maxHamming = 8, maxBucketSize = ngramMaxBucket, portable = true,
          blocksPerKey = 2)
        .orderBy("id_a", "id_b")
    }),
    "dedup_simhash" -> ((s, dir) =>
      Dedup.simhash(t(s, dir, "documents"), "text", "doc_id", portable = true)
        .select(col("doc_id"),
          lower(lpad(hex(col("simhash")), 16, "0")).as("simhash_hex"))
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
    "dedup_containment" -> ((s, dir) =>
      // asymmetric quote/subsumption pairs: |A∩B|/min(|A|,|B|) over
      // 3-gram shingles, candidates from the rare-shingle inverted
      // index (df <= 100), exact intersection over ALL shingles
      graft.ops.Dedup.containmentPairs(t(s, dir, "documents"), "text",
          "doc_id", minContainment = 0.8, maxShingleDf = 100)
        .orderBy("id_a", "id_b")),
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
  )

  val oracles: Map[String, String] = Map(
    // the skeleton's confusable tables interpolate from the SAME
    // constants the operator uses (TextMetrics.confusablesFrom/To), so
    // the oracle can never drift from the shipped mapping; DuckDB's
    // translate shares Spark's semantics exactly (1:1 positional map,
    // surplus FROM characters delete)
    "dedup_homoglyph" -> {
      val from = graft.ops.TextMetrics.confusablesFrom.replace("'", "''")
      val to = graft.ops.TextMetrics.confusablesTo.replace("'", "''")
      s"""WITH even AS (SELECT doc_id, text FROM documents
        |  WHERE doc_id % 2 = 0),
        |corpus AS (
        |  SELECT doc_id, text FROM even
        |  UNION ALL
        |  SELECT doc_id + 1,
        |    chr(8203) || translate(text, 'aeopcxy', 'аеорсху')
        |  FROM even),
        |k AS (SELECT doc_id,
        |    md5(lower(translate(text, '$from', '$to'))) AS skeleton_hash
        |  FROM corpus)
        |SELECT doc_id, skeleton_hash,
        |  doc_id = min(doc_id) OVER (PARTITION BY skeleton_hash) AS keep
        |FROM k ORDER BY doc_id""".stripMargin
    },
    "dedup_source_overlap" ->
      """WITH tok AS (SELECT source AS g, str_split(text, ' ') AS tk
        |  FROM documents WHERE len(str_split(text, ' ')) >= 3),
        |sh0 AS (SELECT g, array_to_string(tk[i:i+2], ' ') AS s
        |  FROM tok, unnest(generate_series(1, len(tk) - 2)) AS u(i)),
        |gs AS (SELECT DISTINCT g, s FROM sh0),
        |sz0 AS (SELECT g, count(*)::BIGINT AS n FROM gs GROUP BY g),
        |allg AS (SELECT DISTINCT source AS g FROM documents),
        |sz AS (SELECT allg.g, coalesce(n, 0)::BIGINT AS n FROM allg
        |  LEFT JOIN sz0 ON sz0.g = allg.g),
        |iv AS (SELECT a.g AS source_a, b.g AS source_b,
        |    count(*)::BIGINT AS inter
        |  FROM gs a JOIN gs b ON a.s = b.s AND a.g < b.g
        |  GROUP BY 1, 2)
        |SELECT sa.g AS source_a, sb.g AS source_b, sa.n AS n_a,
        |  sb.n AS n_b, coalesce(iv.inter, 0)::BIGINT AS inter,
        |  round(CASE WHEN sa.n + sb.n - coalesce(iv.inter, 0) > 0
        |    THEN coalesce(iv.inter, 0)
        |      / (sa.n + sb.n - coalesce(iv.inter, 0)) END, 4) AS jaccard
        |FROM sz sa JOIN sz sb ON sa.g < sb.g
        |LEFT JOIN iv ON iv.source_a = sa.g AND iv.source_b = sb.g
        |ORDER BY source_a, source_b""".stripMargin,
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
    "dedup_exact" ->
      """SELECT md5(text) AS content_hash, min(doc_id) AS keep_id,
        |  count(*) AS n_copies
        |FROM documents GROUP BY 1 ORDER BY content_hash""".stripMargin,
    "dedup_report" ->
      s"""WITH docs2 AS (
         |  SELECT doc_id, text, source FROM documents
         |  UNION ALL SELECT doc_id + 1000000, text, source FROM documents
         |  UNION ALL SELECT doc_id + 2000000,
         |    text || ' tail tokens appended here', source FROM documents),
         |reps AS (SELECT md5(text) AS h, min(doc_id) AS kid
         |  FROM docs2 GROUP BY 1),
         |bj AS (SELECT d.doc_id, d.text, d.source,
         |    (d.doc_id = r.kid) AS isrep
         |  FROM docs2 d JOIN reps r ON md5(d.text) = r.h),
         |tok AS (SELECT doc_id, str_split(text, ' ') AS tk FROM bj
         |  WHERE isrep AND len(str_split(text, ' ')) >= 3),
         |sh AS (SELECT doc_id, array_to_string(tk[i:i+2], ' ') AS s
         |  FROM tok, unnest(generate_series(1, len(tk) - 2)) AS u(i)),
         |hh AS (SELECT doc_id, j,
         |    min(md5(concat(j::VARCHAR, '|', s))) AS mh
         |  FROM sh, unnest(generate_series(0, 7)) AS g(j)
         |  GROUP BY doc_id, j),
         |bk AS (SELECT doc_id, j // 2 AS band,
         |    string_agg(mh, '|' ORDER BY j) AS key
         |  FROM hh GROUP BY doc_id, j // 2),
         |bn AS (SELECT band, key, count(*) AS c FROM bk GROUP BY 1, 2),
         |bk2 AS (SELECT bk.* FROM bk JOIN bn USING (band, key)
         |  WHERE bn.c <= $ngramMaxBucket),
         |nd AS (SELECT DISTINCT b.doc_id FROM bk2 a JOIN bk2 b
         |  ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id),
         |fate AS (SELECT source,
         |    CASE WHEN NOT isrep THEN 'e'
         |      WHEN doc_id IN (SELECT doc_id FROM nd) THEN 'n'
         |      ELSE 'k' END AS f
         |  FROM bj),
         |g AS (SELECT source, count(*)::BIGINT AS n_docs,
         |    sum(CASE WHEN f = 'e' THEN 1 ELSE 0 END)::BIGINT
         |      AS n_exact_dups,
         |    sum(CASE WHEN f = 'n' THEN 1 ELSE 0 END)::BIGINT
         |      AS n_near_dups,
         |    sum(CASE WHEN f = 'k' THEN 1 ELSE 0 END)::BIGINT AS n_kept
         |  FROM fate GROUP BY 1)
         |SELECT source, n_docs, n_exact_dups, n_near_dups, n_kept,
         |  round(n_kept / n_docs::DOUBLE, 4) AS pct_kept
         |FROM g ORDER BY source""".stripMargin,
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
    "dedup_simhash_pairs_mb" -> simhashPairsMbOracle,
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
    "dedup_ngram_jaccard" -> ngramJaccardOracle,
    "dedup_embed_cosine" -> embedCosineOracle,
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
  )
}
