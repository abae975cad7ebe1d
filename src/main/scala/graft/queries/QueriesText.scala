package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ebw.{DesignMatrix, EbwOptions, EntropyBalance, GroupedEntropyBalance}
import graft.ops.{Dedup, Similarity, Skew, TextMetrics}
import graft.QShared._

/** text/curation gates (quality, LMs, dedup-adjacent text metrics) — one `queries` entry per gate with its DuckDB oracle in
 * `oracles` (same names, same column aliases, same rounding; the
 * SparkEntry contract). Split out of the SparkEntry monolith so an
 * edit to one family can never touch another family's oracle text. */
private[graft] object QueriesText {
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "text_tokens" -> ((s, dir) =>
      TextMetrics.tokenCounts(t(s, dir, "documents"), "text", "doc_id")
        .orderBy("doc_id")),
    "text_tokens_bpe" -> ((s, dir) =>
      // exact BPE encode (rank-ordered merge fold, shared table) — the
      // budget unit context windows are actually measured in; DuckDB
      // replays the identical 56-replace chain per word
      TextMetrics.bpeTokenCounts(t(s, dir, "documents"), "text", "doc_id")
        .orderBy("doc_id")),
    "text_tokens_bpe_bytes" -> ((s, dir) => {
      // BYTE-level BPE (GPT-2/tiktoken lineage: 256-symbol base
      // alphabet via the byte->unicode table, merges over byte
      // symbols) — the parity mode production token budgets need; the
      // appended multi-byte suffix (2- and 3-byte UTF-8) makes the
      // byte table and the multi-byte merges load-bearing in the gate,
      // and DuckDB replays the identical table + replace chain
      val docs = t(s, dir, "documents").select(col("doc_id"),
        concat(col("text"), lit(" café —naïve")).as("text"))
      TextMetrics.bpeByteTokenCounts(docs, "text", "doc_id")
        .orderBy("doc_id")
    }),
    "text_fertility" -> ((s, dir) =>
      // per-language tokenizer fertility under the shared exact BPE
      // merge table — tokens/word, bytes/token, chars/token per lang:
      // the token-budget fairness readout for a multilingual mix
      TextMetrics.tokenFertility(t(s, dir, "documents"), "text",
          "doc_id", "lang")
        .orderBy("lang")),
    "text_encoding" -> ((s, dir) => {
      // corpus encoding audit over DETERMINISTICALLY corrupted docs
      // (the synthetic corpus is clean, so each damage class is planted
      // by doc_id residue — identical injection in both engines):
      // U+FFFD, a BEL control char, a zero-width space, and the classic
      // UTF-8-as-Latin-1 mojibake quote
      val d = t(s, dir, "documents")
      val injected = d.select(col("doc_id"),
        when(col("doc_id") % 97 === 0, concat(col("text"), lit("\uFFFD")))
          .when(col("doc_id") % 89 === 0, concat(lit("\u0007"), col("text")))
          .when(col("doc_id") % 83 === 0, concat(lit("\u200B"), col("text")))
          .when(col("doc_id") % 79 === 0, concat(lit("â€™"),
            col("text")))
          .otherwise(col("text")).as("text"))
      TextMetrics.encodingAudit(injected, "text", "doc_id")
    }),
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
    "text_etld" -> ((s, dir) => {
      // registrable-domain (eTLD+1) site rollup: planted hosts cover the
      // multi-label-suffix family (shopN.retail.co.uk must key as
      // retail.co.uk, not co.uk), deep subdomains under a plain TLD
      // (cdnN.mediaM.example.com -> example.com), and a single-label
      // host (localhost passes through) — the site-level grouping crawl
      // blocklists and per-site dedup run on
      val docs = t(s, dir, "documents").select("doc_id", "text")
      val spiked = docs.select(col("doc_id"),
        concat(col("text"),
          lit(" https://shop"), (col("doc_id") % 7).cast("string"),
          lit(".retail.co.uk/p/"), col("doc_id").cast("string"),
          lit(" http://cdn"), (col("doc_id") % 3).cast("string"),
          lit(".media"), (col("doc_id") % 5).cast("string"),
          lit(".example.com/x and https://localhost/admin")).as("text"))
      graft.ops.TextMetrics.extractUrls(spiked, "text", "doc_id")
        .withColumn("site",
          graft.ops.TextMetrics.registrableDomain(col("domain")))
        .groupBy("site")
        .agg(countDistinct("domain").as("n_hosts"),
          count(lit(1)).as("n_urls"),
          countDistinct("doc_id").as("n_docs"))
        .orderBy("site")
    }),
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
    "text_contamination" -> ((s, dir) => {
      // decontamination gate: every 25th document plays the benchmark, so
      // benchmark members read 1.0 and the rest 0.0 on this dup-free corpus
      val docs = t(s, dir, "documents").select("doc_id", "text")
      val bench = docs.filter(col("doc_id") % 25 === 0)
      TextMetrics.contamination(docs, "text", "doc_id", bench, "text", n = 8)
        .orderBy("doc_id")
    }),
    "text_langid" -> ((s, dir) =>
      TextMetrics.langId(t(s, dir, "documents"), "text", "doc_id")
        .orderBy("doc_id")),
    "text_compress" -> ((s, dir) =>
      // compressibility quality signal over real JDK deflate, gated the
      // fixture-truth way (the mm_* move): documents planted as a pure
      // function of doc_id in three deflate-separated classes, and the
      // hash covers the keep/drop verdict + cross-class band ordering —
      // closed-form facts any engine can state — while the deflate byte
      // VALUES honestly stay JVM-only (DeflateKernel portability note)
      graft.ops.TextFixture.compressVerdicts(
          t(s, dir, "documents").select("doc_id"), "doc_id")
        .orderBy("doc_id")),
    "text_rake" -> ((s, dir) =>
      // RAKE key phrases per doc ('the'/'a' delimit candidates in the
      // synthetic vocabulary): per-row segmentation fold, doc-keyed
      // freq/degree scoring, WindowGroupLimit top-3
      graft.ops.TextMetrics.rakeKeywords(t(s, dir, "documents"), "text",
          "doc_id", stopwords = Seq("the", "a"), k = 3)
        .orderBy("doc_id", "rank")),
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
      // learned-quality-classifier gate, fixture-truth form: REAL MLlib
      // LR training (trainPortable, md5-bucket hashed TF) on the planted
      // even-id half, held-out CLASS verdicts on the odd half. Disjoint
      // per-class vocabularies make the argmax verdict equal the planted
      // class closed-form ((doc_id/2) % 2) — hash-gateable even though
      // the trained float weights are aggregation-order-dependent. The
      // murmur3 HashingTF train/score pair stays spec-anchored (held-out
      // accuracy + separation on the real corpus)
      graft.ops.TextFixture.qualityVerdicts(
          t(s, dir, "documents").select("doc_id"), "doc_id")
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
    "text_lang_mix" -> ((s, dir) =>
      // code-switching profile: 50-token windows classified by the
      // shared marker vote, per-doc majority share — the consistency
      // cut document-level langid cannot make
      graft.ops.TextMetrics.langMix(t(s, dir, "documents"), "text",
          "doc_id", chunkTokens = 50)
        .orderBy("doc_id")),
    "text_prf_expand" -> ((s, dir) =>
      // PRF query expansion for the shared BM25 query: top-10 feedback
      // docs -> top-10 expansion terms by feedback-tf x smoothed idf
      // (the oracle reuses the text_bm25 replay CTE verbatim)
      graft.ops.TextMetrics.prfExpansionTerms(t(s, dir, "documents"),
          "text", "doc_id", query = Seq("query", "dup", "spark"),
          kDocs = 10, kTerms = 10)),
    "text_unigram_drift" -> ((s, dir) => {
      // corpus-level language drift: KL + JS over hashed unigram
      // distributions, English slice as the reference vs the full
      // mixed-language corpus as current — a real shift, so both
      // divergences are genuinely positive; 256 buckets exercises
      // collisions (the DSIR convention)
      val d = t(s, dir, "documents")
      graft.ops.TextMetrics.unigramDrift(
          d.filter(col("lang") === "en"), d, "text", buckets = 256)
        .orderBy("bucket")
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
    "text_distinctive" -> ((s, dir) => {
      // per-source distinctive vocabulary: Monroe et al. log-odds with
      // the corpus as Dirichlet prior, variance-normalized, top-5 per
      // source — one explode+count shuffle, vocab joins AQE-decided
      graft.ops.TextMetrics.distinctiveTerms(t(s, dir, "documents"),
          "text", "source", k = 5, minCount = 5L)
        .orderBy("source", "rank")
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
    "text_heaps" -> ((s, dir) =>
      // Heaps'-law vocabulary growth at 10 doc-id quantile prefixes:
      // ONE scan via first-occurrence ids (k cumulative distincts
      // decompose into k conditional counts), beta via regr_slope
      graft.ops.TextMetrics.heapsLaw(t(s, dir, "documents"), "text",
          "doc_id", checkpoints = 10)
        .orderBy("checkpoint")),
    "text_rouge" -> ((s, dir) => {
      // ROUGE-2 of consecutive document pairs (even doc = candidate,
      // odd = reference — the deterministic pairing q_bradley_terry
      // uses): clipped bigram overlap, every pair id survives to the
      // output even when a side has < 2 tokens
      val d = t(s, dir, "documents")
      val pairs = d.select(col("doc_id").as("id"), col("text").as("cand"))
        .filter(col("id") % 2 === 0)
        .join(d.select((col("doc_id") - 1).as("id"),
          col("text").as("ref")), Seq("id"))
      graft.ops.TextEval.rougeN(pairs, "id", "cand", "ref", n = 2)
        .orderBy("id")
    }),
    "text_rouge_l" -> ((s, dir) => {
      // ROUGE-L over the same consecutive-pair frame: token-level LCS
      // via the compiled graft_lcs kernel — in-order coverage where
      // ROUGE-2's fixed windows punish any reordering equally
      val d = t(s, dir, "documents")
      val pairs = d.select(col("doc_id").as("id"), col("text").as("cand"))
        .filter(col("id") % 2 === 0)
        .join(d.select((col("doc_id") - 1).as("id"),
          col("text").as("ref")), Seq("id"))
      graft.ops.TextEval.rougeL(pairs, "id", "cand", "ref")
        .orderBy("id")
    }),
    "text_bleu" -> ((s, dir) => {
      // corpus BLEU (maxN=2) over the same consecutive-pair frame:
      // clipping per pair, totals corpus-level, brevity penalty on the
      // summed lengths — one row
      val d = t(s, dir, "documents")
      val pairs = d.select(col("doc_id").as("id"), col("text").as("cand"))
        .filter(col("id") % 2 === 0)
        .join(d.select((col("doc_id") - 1).as("id"),
          col("text").as("ref")), Seq("id"))
      graft.ops.TextEval.bleu(pairs, "id", "cand", "ref", maxN = 2)
    }),
    "text_distinct_n" -> ((s, dir) =>
      // distinct-1/distinct-2 generation diversity per language — the
      // mode-collapse readout (Li et al. 2016) over the corpus grouped
      // as if each lang were one sampler's generations
      graft.ops.TextEval.distinctN(t(s, dir, "documents"), "lang",
          "text", maxN = 2)
        .orderBy("grp", "n")),
    "text_chrf" -> ((s, dir) => {
      // chrF2 (maxN=3) over the same consecutive-pair frame as
      // text_rouge/text_bleu: the tokenization-robust char-level
      // generation score — whitespace removed, corpus-level clipped
      // totals per n, macro-average across levels, β = 2
      val d = t(s, dir, "documents")
      val pairs = d.select(col("doc_id").as("id"), col("text").as("cand"))
        .filter(col("id") % 2 === 0)
        .join(d.select((col("doc_id") - 1).as("id"),
          col("text").as("ref")), Seq("id"))
      graft.ops.TextEval.chrF(pairs, "id", "cand", "ref", maxN = 3)
    }),
    "text_vocab_coverage" -> ((s, dir) =>
      // Chao1 richness + Good-Turing coverage of the whole corpus —
      // the eval-set sizing readout; one token scan, three 1-row
      // aggregates
      graft.ops.TextEval.vocabCoverage(t(s, dir, "documents"), "text")),
  )

  val oracles: Map[String, String] = Map(
    // the fixture corpus is a pure function of doc_id (TextFixture), so
    // the expected verdict and band ordering are closed-form: class 0
    // (template) is flagged and every class band sits wholly below the
    // next class's band
    "text_compress" ->
      """SELECT doc_id, (doc_id % 3)::INTEGER AS doc_class,
        |  (doc_id % 3 = 0) AS too_repetitive,
        |  (doc_id % 3 < 2) AS separated_from_next
        |FROM documents ORDER BY doc_id""".stripMargin,
    // fixture-truth verdicts: the planted class is a pure function of
    // doc_id and the disjoint-vocabulary margin forces any sane trained
    // classifier to recover it on the held-out half — the trained
    // weights stay JVM-side, the CLASS verdict is engine-invariant
    "text_quality_model" ->
      """SELECT doc_id, ((doc_id // 2) % 2)::INTEGER AS doc_class,
        |  ((doc_id // 2) % 2 = 1) AS predicted_quality
        |FROM documents WHERE doc_id % 2 = 1 ORDER BY doc_id""".stripMargin,
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
    "text_bpe_train" -> bpeTrainOracle(12),
    "text_c4_rules" -> c4Oracle,
    "text_langid_model" -> langIdModelOracle,
    "text_chunk_bpe" -> chunkBpeOracle,
    "text_gopher" -> gopherOracle,
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
    "text_top_terms" ->
      """WITH tok AS (SELECT unnest(string_split(text, ' ')) AS value
        |  FROM documents),
        |tk AS (SELECT value FROM tok WHERE value <> '')
        |SELECT value, count(*)::BIGINT AS n FROM tk GROUP BY value
        |ORDER BY n DESC, value
        |LIMIT 25""".stripMargin,
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
    // the suffix list interpolates from the operator's OWN constant
    // (TextMetrics.twoLabelSuffixes) so the mapping can never drift
    "text_etld" -> {
      val sufs = TextMetrics.twoLabelSuffixes
        .map(x => s"'$x'").mkString(", ")
      s"""WITH sp AS (SELECT doc_id,
        |  text || ' https://shop' || (doc_id % 7) || '.retail.co.uk/p/' ||
        |  doc_id || ' http://cdn' || (doc_id % 3) || '.media' ||
        |  (doc_id % 5) ||
        |  '.example.com/x and https://localhost/admin' AS text
        |  FROM documents),
        |u AS (SELECT doc_id, unnest(regexp_extract_all(text,
        |  '${TextMetrics.urlPattern}', 0)) AS url FROM sp),
        |d AS (SELECT doc_id,
        |  regexp_extract(url, '^https?://([A-Za-z0-9.-]+)', 1) AS domain
        |  FROM u),
        |e AS (SELECT doc_id, domain,
        |    string_split(lower(domain), '.') AS a FROM d),
        |r AS (SELECT doc_id, domain,
        |    CASE
        |      WHEN len(a) >= 3 AND a[-2] || '.' || a[-1] IN ($sufs)
        |        THEN a[-3] || '.' || a[-2] || '.' || a[-1]
        |      WHEN len(a) >= 2 THEN a[-2] || '.' || a[-1]
        |      ELSE lower(domain) END AS site
        |  FROM e)
        |SELECT site, count(DISTINCT domain)::BIGINT AS n_hosts,
        |  count(*)::BIGINT AS n_urls,
        |  count(DISTINCT doc_id)::BIGINT AS n_docs
        |FROM r GROUP BY site ORDER BY site""".stripMargin
    },
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
    "text_tokens" ->
      """SELECT doc_id,
        |  len(str_split(text, ' '))::BIGINT AS n_ws_tokens,
        |  len(regexp_extract_all(text, '[A-Za-z0-9]+'))::BIGINT AS n_re_tokens
        |FROM documents ORDER BY doc_id""".stripMargin,
    "text_tokens_bpe" -> bpeOracle,
    "text_tokens_bpe_bytes" -> bpeBytesOracle,
    // per-language fertility under the SAME per-word BPE replace chain
    // (bpePerWordSql); strlen = bytes, length = chars in DuckDB
    "text_fertility" ->
      s"""WITH b AS (SELECT lang,
         |    list_filter(regexp_split_to_array(text, '\\s+'),
         |      x -> x != '') AS tok,
         |    length(text)::BIGINT AS c, strlen(text)::BIGINT AS byt
         |  FROM documents WHERE lang IS NOT NULL AND text IS NOT NULL),
         |m AS (SELECT lang, len(tok)::BIGINT AS w0,
         |    coalesce(list_sum(list_transform(tok, w ->
         |      len(string_split($bpePerWordSql, '  ')))), 0)::BIGINT AS t,
         |    c, byt FROM b),
         |g AS (SELECT lang, count(*)::BIGINT AS n_docs,
         |    sum(w0)::BIGINT AS n_words, sum(t)::BIGINT AS n_bpe_tokens,
         |    sum(c)::BIGINT AS n_chars, sum(byt)::BIGINT AS n_bytes
         |  FROM m GROUP BY 1)
         |SELECT lang, n_docs, n_words, n_bpe_tokens, n_chars, n_bytes,
         |  round(n_bpe_tokens / greatest(n_words, 1)::DOUBLE, 4)
         |    AS fertility,
         |  round(n_bytes / greatest(n_bpe_tokens, 1)::DOUBLE, 4)
         |    AS bytes_per_token,
         |  round(n_chars / greatest(n_bpe_tokens, 1)::DOUBLE, 4)
         |    AS chars_per_token
         |FROM g ORDER BY lang""".stripMargin,
    // the same doc_id-residue corruption injection, then the four
    // containment tests (RE2 \x{...} == the Java code-point classes)
    "text_encoding" ->
      """WITH d AS (SELECT doc_id,
        |    CASE WHEN doc_id % 97 = 0 THEN text || chr(65533)
        |      WHEN doc_id % 89 = 0 THEN chr(7) || text
        |      WHEN doc_id % 83 = 0 THEN chr(8203) || text
        |      WHEN doc_id % 79 = 0 THEN 'â€™' || text
        |      ELSE text END AS text
        |  FROM documents WHERE text IS NOT NULL),
        |f AS (SELECT
        |    regexp_matches(text, '\x{FFFD}') AS repl,
        |    regexp_matches(text,
        |      '[\x{00}-\x{08}\x{0B}\x{0C}\x{0E}-\x{1F}]') AS ctrl,
        |    regexp_matches(text,
        |      '[\x{200B}\x{200C}\x{200D}\x{FEFF}]') AS zw,
        |    regexp_matches(text, '(â€|Ã[\x{80}-\x{BF}])') AS moji
        |  FROM d)
        |SELECT count(*)::BIGINT AS n_docs,
        |  sum(CASE WHEN repl THEN 1 ELSE 0 END)::BIGINT AS n_replacement,
        |  sum(CASE WHEN ctrl THEN 1 ELSE 0 END)::BIGINT AS n_control,
        |  sum(CASE WHEN zw THEN 1 ELSE 0 END)::BIGINT AS n_zero_width,
        |  sum(CASE WHEN moji THEN 1 ELSE 0 END)::BIGINT AS n_mojibake,
        |  round(sum(CASE WHEN NOT (repl OR ctrl OR zw OR moji)
        |      THEN 1 ELSE 0 END)
        |    / greatest(count(*), 1)::DOUBLE, 4) AS pct_clean
        |FROM f""".stripMargin,
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
    "text_normalize" ->
      """SELECT doc_id,
        |  trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),
        |    ' +', ' ', 'g')) AS text_norm,
        |  len(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),
        |    ' +', ' ', 'g'))) AS n_chars_norm
        |FROM documents ORDER BY doc_id""".stripMargin,
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
    "text_lang_mix" -> langMixOracle(50),
    "text_prf_expand" -> (bm25Cte.stripSuffix("\n") + ",\n" +
      """fb AS (SELECT doc_id FROM bm WHERE bm25 > 0
        |  ORDER BY bm25 DESC, doc_id LIMIT 10),
        |tok AS (SELECT doc_id,
        |    unnest(list_filter(str_split(text, ' '), x -> x <> ''))
        |      AS term
        |  FROM documents),
        |dfa AS (SELECT term, count(DISTINCT doc_id)::BIGINT AS df
        |  FROM tok GROUP BY 1),
        |nn AS (SELECT count(*)::DOUBLE AS n FROM documents),
        |ft AS (SELECT term, count(*)::DOUBLE AS tf FROM tok
        |  JOIN fb USING (doc_id) GROUP BY 1),
        |sc AS (SELECT ft.term, df,
        |    round(tf * ln((n + 1) / (df + 1)), 4) AS score
        |  FROM ft JOIN dfa ON dfa.term = ft.term, nn
        |  WHERE ft.term NOT IN ('query', 'dup', 'spark'))
        |SELECT term, df, score,
        |  row_number() OVER (ORDER BY score DESC, term)::BIGINT AS rank
        |FROM sc ORDER BY score DESC, term LIMIT 10""".stripMargin),
    "text_unigram_drift" ->
      """WITH tokr AS (SELECT unnest(string_split(text, ' ')) AS t
        |  FROM documents WHERE lang = 'en'),
        |tr AS (SELECT CAST('0x' || substring(md5(t), 1, 6) AS BIGINT)
        |    % 256 AS b FROM tokr WHERE t <> ''),
        |tokc AS (SELECT unnest(string_split(text, ' ')) AS t
        |  FROM documents),
        |tc AS (SELECT CAST('0x' || substring(md5(t), 1, 6) AS BIGINT)
        |    % 256 AS b FROM tokc WHERE t <> ''),
        |cr AS (SELECT b, count(*)::BIGINT AS n_ref FROM tr GROUP BY 1),
        |cc AS (SELECT b, count(*)::BIGINT AS n_cur FROM tc GROUP BY 1),
        |g AS (SELECT unnest(range(256)) AS b),
        |j AS (SELECT g.b AS b, coalesce(n_ref, 0) AS n_ref,
        |    coalesce(n_cur, 0) AS n_cur
        |  FROM g LEFT JOIN cr ON cr.b = g.b LEFT JOIN cc ON cc.b = g.b),
        |tt AS (SELECT sum(n_ref)::DOUBLE AS tr_, sum(n_cur)::DOUBLE AS tc_
        |  FROM j),
        |pq AS (SELECT b, n_ref, n_cur,
        |    (n_ref + 1.0) / (tr_ + 256) AS p,
        |    (n_cur + 1.0) / (tc_ + 256) AS q
        |  FROM j, tt),
        |pm AS (SELECT b, n_ref, n_cur, p, q, (p + q) / 2.0 AS m FROM pq)
        |SELECT b AS bucket, n_ref, n_cur,
        |  round(p, 8) AS p_ref, round(q, 8) AS p_cur,
        |  round(q * ln(q / p), 8) + 0.0 AS kl_contrib,
        |  round(q * ln(q / m) / 2.0 + p * ln(p / m) / 2.0, 8) + 0.0
        |    AS js_contrib
        |FROM pm ORDER BY bucket""".stripMargin,
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
    // clipped-bigram ROUGE over the consecutive-pair frame; counts are
    // exact integers so only the final 4dp ratios touch floats
    "text_rouge" ->
      """WITH pr AS (
        |  SELECT a.doc_id AS id,
        |    list_filter(regexp_split_to_array(lower(a.text), '\s+'),
        |      x -> x <> '') AS ct,
        |    list_filter(regexp_split_to_array(lower(b.text), '\s+'),
        |      x -> x <> '') AS rt
        |  FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 1
        |  WHERE a.doc_id % 2 = 0),
        |g AS (SELECT id,
        |    CASE WHEN len(ct) >= 2 THEN list_transform(range(1, len(ct)),
        |      i -> ct[i] || ' ' || ct[i + 1]) ELSE []::VARCHAR[] END AS cg,
        |    CASE WHEN len(rt) >= 2 THEN list_transform(range(1, len(rt)),
        |      i -> rt[i] || ' ' || rt[i + 1]) ELSE []::VARCHAR[] END AS rg
        |  FROM pr),
        |cc AS (SELECT id, g2 AS gr, count(*)::BIGINT AS c
        |  FROM (SELECT id, unnest(cg) AS g2 FROM g) GROUP BY 1, 2),
        |rc AS (SELECT id, g2 AS gr, count(*)::BIGINT AS c
        |  FROM (SELECT id, unnest(rg) AS g2 FROM g) GROUP BY 1, 2),
        |m AS (SELECT coalesce(cc.id, rc.id) AS id,
        |    coalesce(cc.c, 0) AS ccnt, coalesce(rc.c, 0) AS rcnt,
        |    least(coalesce(cc.c, 0), coalesce(rc.c, 0)) AS clip
        |  FROM cc FULL OUTER JOIN rc
        |    ON cc.id = rc.id AND cc.gr = rc.gr),
        |per AS (SELECT id, sum(ccnt)::BIGINT AS n_cand,
        |    sum(rcnt)::BIGINT AS n_ref, sum(clip)::BIGINT AS overlap
        |  FROM m GROUP BY 1),
        |pj AS (SELECT p0.id, coalesce(per.n_cand, 0)::BIGINT AS n_cand,
        |    coalesce(per.n_ref, 0)::BIGINT AS n_ref,
        |    coalesce(per.overlap, 0)::BIGINT AS overlap
        |  FROM (SELECT DISTINCT id FROM pr) p0 LEFT JOIN per USING (id)),
        |sc AS (SELECT id, n_cand, n_ref, overlap,
        |    CASE WHEN n_cand > 0 THEN overlap / n_cand::DOUBLE
        |      ELSE 0.0 END AS p,
        |    CASE WHEN n_ref > 0 THEN overlap / n_ref::DOUBLE
        |      ELSE 0.0 END AS r
        |  FROM pj)
        |SELECT id, n_cand, n_ref, overlap, round(p, 4) AS "precision",
        |  round(r, 4) AS recall,
        |  round(CASE WHEN p + r > 0 THEN 2.0 * p * r / (p + r)
        |    ELSE 0.0 END, 4) AS f1
        |FROM sc ORDER BY id""".stripMargin,
    // ROUGE-L: the engine's O(m·n) LCS DP replayed as a recursive CTE
    // over candidate tokens — each step derives DP row i from row i−1
    // via new[j] = max(prev[j], runmax_{j'<=j}(prev[j'−1] + match_j')),
    // the prefix-max identity that removes the within-row left-to-right
    // dependency (DP rows are monotone in j, so max(prev[j], new[j−1])
    // folds into the running max). Integer DP → exact replay.
    "text_rouge_l" ->
      """WITH RECURSIVE pr AS (
        |  SELECT a.doc_id AS id,
        |    list_filter(regexp_split_to_array(lower(a.text), '\s+'),
        |      x -> x <> '') AS ct,
        |    list_filter(regexp_split_to_array(lower(b.text), '\s+'),
        |      x -> x <> '') AS rt
        |  FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 1
        |  WHERE a.doc_id % 2 = 0),
        |l AS (
        |  SELECT id, 0 AS i, ct, rt,
        |    list_transform(range(1, len(rt) + 1), x -> 0) AS dp
        |  FROM pr
        |  UNION ALL
        |  SELECT id, i + 1, ct, rt,
        |    list_transform(range(1, len(rt) + 1), j ->
        |      greatest(dp[j], list_max(list_transform(range(1, j + 1),
        |        j2 -> (CASE WHEN j2 = 1 THEN 0 ELSE dp[j2 - 1] END) +
        |          (CASE WHEN rt[j2] = ct[i + 1] THEN 1 ELSE 0 END)))))
        |      AS dp
        |  FROM l WHERE i < len(ct)),
        |fin AS (
        |  SELECT id, len(ct)::BIGINT AS cand_len,
        |    len(rt)::BIGINT AS ref_len,
        |    coalesce(dp[len(rt)], 0)::BIGINT AS lcs
        |  FROM l WHERE i = len(ct)),
        |sc AS (
        |  SELECT id, cand_len, ref_len, lcs,
        |    CASE WHEN cand_len > 0 THEN lcs / cand_len::DOUBLE
        |      ELSE 0.0 END AS p,
        |    CASE WHEN ref_len > 0 THEN lcs / ref_len::DOUBLE
        |      ELSE 0.0 END AS r
        |  FROM fin)
        |SELECT id, cand_len, ref_len, lcs, round(p, 4) AS "precision",
        |  round(r, 4) AS recall,
        |  round(CASE WHEN p + r > 0 THEN 2.0 * p * r / (p + r)
        |    ELSE 0.0 END, 4) AS f1
        |FROM sc ORDER BY id""".stripMargin,
    // corpus BLEU (maxN=2): clipping per pair, totals corpus-level,
    // brevity penalty on the summed lengths — the published corpus form
    "text_bleu" ->
      """WITH pr AS (
        |  SELECT a.doc_id AS id,
        |    list_filter(regexp_split_to_array(lower(a.text), '\s+'),
        |      x -> x <> '') AS ct,
        |    list_filter(regexp_split_to_array(lower(b.text), '\s+'),
        |      x -> x <> '') AS rt
        |  FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 1
        |  WHERE a.doc_id % 2 = 0),
        |lens AS (SELECT sum(len(ct))::BIGINT AS cand_len,
        |    sum(len(rt))::BIGINT AS ref_len FROM pr),
        |c1 AS (SELECT id, g2 AS gr, count(*)::BIGINT AS c
        |  FROM (SELECT id, unnest(ct) AS g2 FROM pr) GROUP BY 1, 2),
        |r1 AS (SELECT id, g2 AS gr, count(*)::BIGINT AS c
        |  FROM (SELECT id, unnest(rt) AS g2 FROM pr) GROUP BY 1, 2),
        |t1 AS (SELECT
        |    sum(least(coalesce(c1.c, 0), coalesce(r1.c, 0)))::DOUBLE
        |      AS clip,
        |    sum(coalesce(c1.c, 0))::DOUBLE AS tot
        |  FROM c1 FULL OUTER JOIN r1
        |    ON c1.id = r1.id AND c1.gr = r1.gr),
        |g AS (SELECT id,
        |    CASE WHEN len(ct) >= 2 THEN list_transform(range(1, len(ct)),
        |      i -> ct[i] || ' ' || ct[i + 1]) ELSE []::VARCHAR[] END AS cg,
        |    CASE WHEN len(rt) >= 2 THEN list_transform(range(1, len(rt)),
        |      i -> rt[i] || ' ' || rt[i + 1]) ELSE []::VARCHAR[] END AS rg
        |  FROM pr),
        |c2 AS (SELECT id, g2 AS gr, count(*)::BIGINT AS c
        |  FROM (SELECT id, unnest(cg) AS g2 FROM g) GROUP BY 1, 2),
        |r2 AS (SELECT id, g2 AS gr, count(*)::BIGINT AS c
        |  FROM (SELECT id, unnest(rg) AS g2 FROM g) GROUP BY 1, 2),
        |t2 AS (SELECT
        |    sum(least(coalesce(c2.c, 0), coalesce(r2.c, 0)))::DOUBLE
        |      AS clip,
        |    sum(coalesce(c2.c, 0))::DOUBLE AS tot
        |  FROM c2 FULL OUTER JOIN r2
        |    ON c2.id = r2.id AND c2.gr = r2.gr),
        |ps AS (SELECT cand_len, ref_len,
        |    CASE WHEN t1.tot > 0 THEN t1.clip / t1.tot ELSE 0.0 END AS p1,
        |    CASE WHEN t2.tot > 0 THEN t2.clip / t2.tot ELSE 0.0 END AS p2,
        |    CASE WHEN cand_len >= ref_len OR cand_len = 0 THEN 1.0
        |      ELSE exp(1.0 - ref_len::DOUBLE / cand_len) END AS bpv
        |  FROM lens, t1, t2)
        |SELECT cand_len, ref_len, round(p1, 4) AS p1, round(p2, 4) AS p2,
        |  round(bpv, 4) AS bp,
        |  round(CASE WHEN p1 > 0 AND p2 > 0
        |    THEN bpv * exp((ln(p1) + ln(p2)) / 2.0) ELSE 0.0 END, 4)
        |    AS bleu
        |FROM ps""".stripMargin,
    // Chao1 + Good-Turing over the whole-corpus term counts — three
    "text_distinct_n" ->
      """WITH tk AS (SELECT lang AS grp,
        |    list_filter(regexp_split_to_array(lower(text), '\s+'),
        |      x -> x <> '') AS t
        |  FROM documents),
        |g AS (
        |  SELECT grp, 1 AS n, unnest(t) AS g FROM tk
        |  UNION ALL
        |  SELECT grp, 2, unnest(CASE WHEN len(t) >= 2 THEN
        |      list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1])
        |    ELSE []::VARCHAR[] END) FROM tk),
        |c AS (SELECT grp, n, g, count(*)::BIGINT AS c
        |  FROM g GROUP BY 1, 2, 3)
        |SELECT grp, n, sum(c)::BIGINT AS total_grams,
        |  count(*)::BIGINT AS distinct_grams,
        |  round(count(*) / sum(c)::DOUBLE, 4) AS distinct_ratio
        |FROM c GROUP BY 1, 2 ORDER BY grp, n""".stripMargin,
    "text_chrf" ->
      """WITH pr AS (
        |  SELECT a.doc_id AS id,
        |    regexp_replace(lower(a.text), '\s+', '', 'g') AS c,
        |    regexp_replace(lower(b.text), '\s+', '', 'g') AS r
        |  FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 1
        |  WHERE a.doc_id % 2 = 0),
        |gr AS (
        |  SELECT id, 1 AS n, 0 AS s,
        |    unnest(list_transform(range(1, len(c) + 1), i -> c[i:i])) AS g
        |  FROM pr
        |  UNION ALL SELECT id, 1, 1,
        |    unnest(list_transform(range(1, len(r) + 1), i -> r[i:i])) FROM pr
        |  UNION ALL SELECT id, 2, 0,
        |    unnest(list_transform(range(1, len(c)), i -> c[i:i+1])) FROM pr
        |  UNION ALL SELECT id, 2, 1,
        |    unnest(list_transform(range(1, len(r)), i -> r[i:i+1])) FROM pr
        |  UNION ALL SELECT id, 3, 0,
        |    unnest(list_transform(range(1, len(c) - 1), i -> c[i:i+2])) FROM pr
        |  UNION ALL SELECT id, 3, 1,
        |    unnest(list_transform(range(1, len(r) - 1), i -> r[i:i+2])) FROM pr),
        |cnt AS (SELECT n, id, g,
        |    count(*) FILTER (WHERE s = 0) AS cc,
        |    count(*) FILTER (WHERE s = 1) AS rc
        |  FROM gr GROUP BY 1, 2, 3),
        |pn AS (SELECT n, sum(least(cc, rc))::DOUBLE AS clip,
        |    sum(cc)::DOUBLE AS tc, sum(rc)::DOUBLE AS tr
        |  FROM cnt GROUP BY 1 HAVING sum(cc) + sum(rc) > 0),
        |fin AS (SELECT
        |    sum(CASE WHEN n = 1 THEN tc END)::BIGINT AS cand_chars,
        |    sum(CASE WHEN n = 1 THEN tr END)::BIGINT AS ref_chars,
        |    count(*)::BIGINT AS levels,
        |    avg(CASE WHEN tc > 0 THEN clip / tc ELSE 0 END) AS p,
        |    avg(CASE WHEN tr > 0 THEN clip / tr ELSE 0 END) AS r
        |  FROM pn)
        |SELECT cand_chars, ref_chars, levels,
        |  round(p, 4) AS chrp, round(r, 4) AS chrr,
        |  round(CASE WHEN p + r > 0 THEN 5 * p * r / (4 * p + r)
        |    ELSE 0 END, 4) AS chrf2
        |FROM fin""".stripMargin,
    // 1-row aggregates on exact integer frequencies
    "text_vocab_coverage" ->
      """WITH tm AS (SELECT w, count(*)::BIGINT AS c FROM (
        |    SELECT unnest(list_filter(
        |      regexp_split_to_array(lower(text), '\s+'), x -> x <> ''))
        |      AS w FROM documents) GROUP BY 1)
        |SELECT sum(c)::BIGINT AS n_tokens, count(*)::BIGINT AS vocab,
        |  (count(*) FILTER (WHERE c = 1))::BIGINT AS f1,
        |  (count(*) FILTER (WHERE c = 2))::BIGINT AS f2,
        |  round(count(*) + (count(*) FILTER (WHERE c = 1))
        |    * ((count(*) FILTER (WHERE c = 1)) - 1)
        |    / (((count(*) FILTER (WHERE c = 2)) + 1) * 2.0), 1) AS chao1,
        |  round((count(*) FILTER (WHERE c = 1)) / sum(c)::DOUBLE, 6)
        |    AS unseen_mass,
        |  round(1.0 - (count(*) FILTER (WHERE c = 1)) / sum(c)::DOUBLE, 6)
        |    AS coverage
        |FROM tm""".stripMargin,
  )
}
