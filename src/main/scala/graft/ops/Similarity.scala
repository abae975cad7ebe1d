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

  /** Release every PAIR-OPERATOR frame the Similarity/Dedup operators
   * cached in this session, plus any live DistScan pins (the Dedup
   * contract). Does NOT touch live index caches (IVF cell assignments
   * live in a separate scope) — release those via
   * `IvfIndex.unpersist()`. */
  def unpersistAll(spark: org.apache.spark.sql.SparkSession): Unit = {
    CacheScope.unpersistAll(spark)
    CacheScope.unpersistAll(spark, CacheScope.Scan)
  }

  /** Built-in composition (portable, interpreted higher-order funcs). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column =
    sqrt(aggregate(transform(a, x => x * x), lit(0.0), (acc, x) => acc + x))

  /** Zero-norm vectors get cosine 0 (not NaN): NaN would sort ABOVE every
   * real similarity under desc and poison any top-k. */
  def cosine(a: Column, b: Column): Column = {
    val den = norm(a) * norm(b)
    when(den > 0, dot(a, b) / den).otherwise(lit(0.0))
  }

  /** Codegen'd native kernel (graft.functions.ArrayDotProduct); requires
   * GraftFunctions.register on the session. ~whole-stage-codegen speed. */
  def dotNative(a: Column, b: Column): Column = call_function("graft_dot", a, b)

  def cosineNative(a: Column, b: Column): Column = {
    val den = sqrt(dotNative(a, a)) * sqrt(dotNative(b, b))
    when(den > 0, dotNative(a, b) / den).otherwise(lit(0.0))
  }

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

  /** Deterministic pseudo-random hyperplane p for dimension `dim` (seeded
   * hash of (plane, dim) — reproducible without driver RNG state). Public
   * so oracle SQL can embed the exact same plane literals. */
  def hyperplane(p: Int, dim: Int, seed: Long = 42L): Array[Double] =
    Array.tabulate(dim) { d =>
      scala.util.hashing.MurmurHash3.productHash((seed, p, d)).toDouble / Int.MaxValue
    }

  private[ops] def plane(p: Int, dim: Int, seed: Long): Array[Double] =
    hyperplane(p, dim, seed)

  /** Random-hyperplane LSH bucket key: `bits` sign bits using planes
   * `planeOffset until planeOffset + bits` (offsets give independent bands
   * for OR-amplified multi-band bucketing). Each plane is a literal array
   * fed to the native graft_dot kernel — a compact expression tree
   * (bits ~ 8 calls) instead of bits*dim codegen terms. */
  def lshBucket(
      vecCol: Column, dim: Int, bits: Int, seed: Long = 42L,
      planeOffset: Int = 0): Column = {
    val planes = (0 until bits).map { p =>
      val s = dotNative(vecCol, typedlit(plane(planeOffset + p, dim, seed).toSeq))
      when(s >= 0, lit(1)).otherwise(lit(0)) * lit(1 << p)
    }
    planes.reduce(_ + _)
  }

  /** Driver-side bucket AND per-bit |margin| of one vector under the same
   * planes as lshBucket — the single source of the sign convention for
   * every driver-side probe computation. */
  def lshBucketAndMargins(
      vec: Seq[Double], bits: Int, seed: Long = 42L,
      planeOffset: Int = 0): (Int, Array[Double]) = {
    val dim = vec.length
    var b = 0
    val margins = new Array[Double](bits)
    for (p <- 0 until bits) {
      val pl = plane(planeOffset + p, dim, seed)
      var s = 0.0
      for (d <- 0 until dim) s += vec(d) * pl(d)
      if (s >= 0) b |= (1 << p)
      margins(p) = math.abs(s)
    }
    (b, margins)
  }

  /** Driver-side bucket of one vector under the same planes as lshBucket. */
  def lshBucketOf(
      vec: Seq[Double], bits: Int, seed: Long = 42L, planeOffset: Int = 0): Int =
    lshBucketAndMargins(vec, bits, seed, planeOffset)._1

  /** The multi-probe perturbation sequence (Lv et al., VLDB'07): XOR masks
   * over the sign bits in ascending total-|margin| order, generated with
   * the classic shift/expand successor rule on the margin-sorted bit
   * list — supports multi-bit perturbations, so any nProbe up to 2^bits
   * is honored exactly. */
  private[ops] def probeMasks(margins: Array[Double], nProbe: Int): Seq[Int] = {
    val bits = margins.length
    val order = margins.zipWithIndex.sortBy(_._1) // (margin, plane) ascending
    def score(pos: List[Int]): Double = pos.map(order(_)._1).sum
    def mask(pos: List[Int]): Int = pos.map(p => 1 << order(p)._2).sum
    val seen = scala.collection.mutable.Set[List[Int]]()
    val heap = scala.collection.mutable.PriorityQueue[(Double, List[Int])]()(
      Ordering.by[(Double, List[Int]), Double](_._1).reverse)
    if (bits > 0) { heap.enqueue((score(List(0)), List(0))); seen += List(0) }
    val out = scala.collection.mutable.ArrayBuffer[Int](0) // the query bucket itself
    while (out.length < math.min(nProbe, 1 << bits) && heap.nonEmpty) {
      val (_, pos) = heap.dequeue()
      out += mask(pos)
      val maxPos = pos.max
      if (maxPos + 1 < bits) {
        val expand = (maxPos + 1 :: pos).sorted
        val shift = (maxPos + 1 :: pos.filterNot(_ == maxPos)).sorted
        for (cand <- Seq(expand, shift) if !seen(cand)) {
          seen += cand
          heap.enqueue((score(cand), cand))
        }
      }
    }
    out.toSeq
  }

  /** A fitted IVF index: cluster assignments cached, centers on the
   * driver. Build once, query many times (the KMeans fit amortizes). */
  final class IvfIndex private[Similarity] (
      private[Similarity] val assigned: DataFrame, // (id, arr, cell), cached
      val centers: Array[Array[Double]],
      val idCol: String) {
    def query(q: Seq[Double], k: Int, nprobe: Int): DataFrame = {
      val qArr = q.toArray
      val probed = centers.zipWithIndex
        .map { case (c, i) =>
          var d = 0.0
          var j = 0
          while (j < qArr.length) { val t = c(j) - qArr(j); d += t * t; j += 1 }
          (i, d)
        }
        .sortBy(_._2).take(math.max(1, nprobe)).map(_._1).toSeq
      assigned
        .filter(col("cell").isin(probed: _*))
        .select(col(idCol), cosineNative(col("arr"), typedlit(q)).as("cosine"))
        .orderBy(desc("cosine"), col(idCol))
        .limit(k)
    }
    def unpersist(): Unit = CacheScope.untrack(assigned)
  }

  /**
   * Deterministic distributed Lloyd k-means, exactly replayable in SQL:
   * seeds are the k lowest-id vectors (first-k seeding), assignment is
   * squared-Euclidean with ties to the lowest cluster id, and each
   * round's centroids (`iters` assignment passes, a re-average between
   * consecutive passes) are element-wise means ROUNDED to 6 decimals — the
   * rounding pins the centroid values themselves, so the same clustering
   * falls out of any engine or partitioning (raw distances stay
   * unrounded: an ulp-level wobble only matters when two centroids are
   * equidistant to ~1e-13, whereas rounding them would manufacture
   * boundary flips). For quality-seeking clustering use [[fitIvfIndex]]'s
   * MLlib KMeans (k-means|| seeding); THIS variant is the auditable one.
   *
   * Returns the input columns + `cluster`. Scale shape: assignment is a
   * narrow ZERO-shuffle scan — centroids enter as k*dim literals inside
   * one array_min((dist, cid) structs) argmin expression; each round's
   * update is ONE (cluster, pos) aggregation producing k*dim cells.
   * Centroid state between rounds is k*dim doubles on the driver (the
   * EBW treeAggregate precedent — never O(corpus)). Empty clusters drop;
   * null vectors are excluded.
   */
  def kmeansAssign(emb: DataFrame, vecCol: String, idCol: String,
      k: Int, iters: Int): DataFrame = {
    require(!emb.columns.contains("cluster"),
      "input already has a `cluster` column; rename it first")
    val v = col(vecCol).cast("array<double>")
    val base = emb.where(v.isNotNull)
    val cents = lloydCentroids(base, v, idCol, k, iters)
    base.withColumn("cluster",
      minDistPair(emb.sparkSession, v, cents).getItem(1).cast("int"))
  }

  /** argmin over centroids as [dist², cid] (ties to the LOWEST cluster
   * id — ascending scan with strict <); cid as a double is exact for any
   * realistic k. Item 0 is the winning squared distance, item 1 the cid.
   *
   * Always the native [[graft.functions.CentroidArgmin]] kernel: one
   * flat k·d primitive loop per row INSIDE whole-stage codegen. Two
   * prior forms each hit a measured cliff: the zip_with/aggregate
   * literal ran HOF-interpreted (~5 s per assignment pass on a 2000-row
   * corpus at k=8/d=64, round 12), and the compiled Scala UDF that
   * replaced it kept the loop fast but demoted the hosting Project out
   * of whole-stage codegen — the graft_clip_counts lesson (round 13):
   * the kernel's CALL SITE must be codegen-able, not just its body. The
   * arithmetic contract is unchanged — left-to-right Σ(a−b)² per
   * centroid, ties to the lowest cid — spec-pinned against an
   * independent reference implementation and replayed exactly by the
   * DuckDB oracles. */
  private def minDistPair(spark: org.apache.spark.sql.SparkSession,
      v: Column, cents: Seq[(Int, Seq[Double])]): Column = {
    val sorted = cents.sortBy(_._1)
    val ids = sorted.map(_._1).toArray
    val cs = sorted.map(_._2.toArray).toArray
    val dim = cs(0).length
    require(cs.forall(_.length == dim),
      s"centroid table is ragged: dims ${cs.map(_.length).distinct.toSeq}")
    // register on the CALLER's session (threaded from the operand
    // DataFrame), not SparkSession.active: in a multi-session app
    // call_function resolves against the frame's own session, where the
    // thread-active one may never have registered the kernel
    graft.functions.GraftFunctions.register(spark)
    call_function("graft_argmin_centroid", v, typedlit(cs.flatten),
      typedlit(ids), lit(0), lit(dim), lit(dim), lit(true))
  }

  /** Best AND runner-up in one kernel pass, as
   * `[best_dist², best_id, second_dist², second_id]` — the
   * [[minDistPair]] arithmetic contract with the second slot tracked
   * (ties: lowest id wins best, the other tied centroid is the
   * runner-up). Nearest-OTHER-centroid readouts (silhouette b) select
   * from this ONE call instead of folding k CaseWhen branches of
   * (k−1)-centroid tables — O(k·dim) plan literals instead of
   * O(k²·dim). */
  private def minDistTop2(spark: org.apache.spark.sql.SparkSession,
      v: Column, cents: Seq[(Int, Seq[Double])]): Column = {
    val sorted = cents.sortBy(_._1)
    val ids = sorted.map(_._1).toArray
    val cs = sorted.map(_._2.toArray).toArray
    val dim = cs(0).length
    require(cs.forall(_.length == dim),
      s"centroid table is ragged: dims ${cs.map(_.length).distinct.toSeq}")
    graft.functions.GraftFunctions.register(spark)
    call_function("graft_argmin_centroid", v, typedlit(cs.flatten),
      typedlit(ids), lit(0), lit(dim), lit(dim), lit("top2"))
  }

  /** dist² to the row's OWN centroid in one kernel call: the cluster id
   * rides as element 0 of the scored array (`concat(array(cl), vec)`),
   * the kernel's `own` mode looks it up in the table and scores only
   * that centroid — O(dim) per row, no k-branch CaseWhen in the plan.
   * Same per-centroid arithmetic as [[minDistPair]] over a 1-row
   * table. */
  private def ownDist(spark: org.apache.spark.sql.SparkSession,
      cl: Column, v: Column, cents: Seq[(Int, Seq[Double])]): Column = {
    val sorted = cents.sortBy(_._1)
    val ids = sorted.map(_._1).toArray
    val cs = sorted.map(_._2.toArray).toArray
    val dim = cs(0).length
    require(cs.forall(_.length == dim),
      s"centroid table is ragged: dims ${cs.map(_.length).distinct.toSeq}")
    graft.functions.GraftFunctions.register(spark)
    call_function("graft_argmin_centroid",
      concat(array(cl.cast("double")), v), typedlit(cs.flatten),
      typedlit(ids), lit(1), lit(dim), lit(dim + 1), lit("own"))
  }

  /** Per-subspace code-assignment kernel: argmin over the subspace's
   * centroids read through an (offset, ds) window of the FULL vector —
   * the [[minDistPair]] arithmetic contract (left-to-right Σ(a−b)²,
   * strict <, ascending cid) without materializing the slice. The same
   * native [[graft.functions.CentroidArgmin]] expression (int-code
   * mode), so all `subspaces` argmins of a row run in ONE generated
   * stage. Callers filter null vectors before assignment, as
   * [[pqTrain]]/[[pqEncode]] do; a null ELEMENT or a wrong-dimension
   * vector fails fast with a sized message instead of silently scoring
   * a partial window. */
  private def subCodeKernel(spark: org.apache.spark.sql.SparkSession,
      cents: Seq[(Int, Seq[Double])], off: Int,
      ds: Int, dim: Int): Column => Column = {
    val sorted = cents.sortBy(_._1)
    val ids = sorted.map(_._1).toArray
    val cs = sorted.map(_._2.toArray).toArray
    require(cs.forall(_.length == ds),
      s"subspace codebook is ragged: dims ${cs.map(_.length).distinct.toSeq}" +
        s", expected $ds")
    // same session-threading rule as [[minDistPair]]
    graft.functions.GraftFunctions.register(spark)
    (v: Column) => call_function("graft_argmin_centroid", v,
      typedlit(cs.flatten), typedlit(ids), lit(off), lit(ds), lit(dim),
      lit(false))
  }

  private def lloydCentroids(base: DataFrame, v: Column, idCol: String,
      k: Int, iters: Int): Seq[(Int, Seq[Double])] = {
    require(k >= 1, "k must be >= 1")
    require(iters >= 1, "iters must be >= 1 (assignment passes)")
    var cents: Seq[(Int, Seq[Double])] = base
      .select(col(idCol), v.as("_v")).orderBy(col(idCol)).limit(k)
      .collect().zipWithIndex
      .map { case (r, i) => (i, r.getSeq[Double](1)) }
    // `iters` counts ASSIGNMENT passes; centroids re-average between
    // consecutive passes (iters - 1 updates), so iters=1 is pure
    // nearest-seed partitioning
    for (_ <- 0 until iters - 1) {
      val assign =
        minDistPair(base.sparkSession, v, cents).getItem(1).cast("int")
      val upd = base.select(assign.as("cluster"), posexplode(v))
        .groupBy("cluster", "pos").agg(round(avg(col("col")), 6).as("x"))
        .collect()
        .groupBy(_.getInt(0))
        .map { case (cid, rows) =>
          (cid, rows.sortBy(_.getInt(1)).map(_.getDouble(2)).toSeq)
        }.toSeq.sortBy(_._1)
      cents = upd
    }
    cents
  }

  /** The deterministic Lloyd cell table itself — (cid, centroid) after
   * `iters` assignment passes, exactly the centroids [[kmeansAssign]]
   * would assign against (same first-k seeding, 6dp per-round rounding).
   * This is the PERSISTABLE half of an append-only cell index: write it
   * once, then [[assignToCentroids]] indexes every new crawl batch
   * without refitting. */
  def kmeansCentroids(emb: DataFrame, vecCol: String, idCol: String,
      k: Int, iters: Int): Seq[(Int, Seq[Double])] = {
    val v = col(vecCol).cast("array<double>")
    lloydCentroids(emb.where(v.isNotNull), v, idCol, k, iters)
  }

  /**
   * Incremental cell assignment — the crawl-append path of a cell/IVF
   * index: new vectors take their nearest PERSISTED centroid (cells
   * stay fixed; periodic refits are a separate batch decision, exactly
   * as production IVF deployments operate). Zero-shuffle literal-argmin
   * narrow scan, the kmeansAssign assignment kernel verbatim.
   * Output: id, cell, dist (root of the winning squared distance, 6dp).
   */
  def assignToCentroids(emb: DataFrame, vecCol: String, idCol: String,
      centers: Seq[(Int, Seq[Double])]): DataFrame = {
    require(centers.nonEmpty, "centers must be non-empty")
    val v = col(vecCol).cast("array<double>")
    val pair = minDistPair(emb.sparkSession, v, centers)
    emb.where(v.isNotNull)
      .select(col(idCol), pair.getItem(1).cast("int").as("cell"),
        round(sqrt(pair.getItem(0)), 6).as("dist"))
  }

  /**
   * Product-quantization codebook (Jégou et al. 2011, "Product
   * Quantization for Nearest Neighbor Search"): the vector space splits
   * into `subspaces` contiguous slices and each slice gets its own
   * deterministic k-means codebook (the [[kmeansAssign]] rules: first-k
   * seeding, ties to the lowest centroid id, 6-decimal centroid
   * rounding, `iters` assignment passes). A vector then compresses to
   * `subspaces` small ints — 8 codes instead of 64 floats is a 32x
   * memory cut, THE lever that fits a 100 TB corpus's ANN index in
   * executor memory where raw vectors cannot.
   *
   * All subspaces train in the SAME jobs: assignment is one zero-shuffle
   * scan (per-subspace argmin literals), each update round is ONE
   * (subspace, centroid, pos) aggregation. Codebook state is
   * subspaces*k*(dim/subspaces) = dim*k doubles on the driver.
   * Returns (subspace, cid, centroid-slice) tuples.
   */
  def pqTrain(emb: DataFrame, vecCol: String, idCol: String, dim: Int,
      subspaces: Int = 8, k: Int = 16, iters: Int = 2)
      : Seq[(Int, Int, Seq[Double])] = {
    require(subspaces >= 1 && dim % subspaces == 0,
      s"dim $dim must divide evenly into $subspaces subspaces")
    require(k >= 1 && iters >= 1, "k and iters must be >= 1")
    val ds = dim / subspaces
    val v = col(vecCol).cast("array<double>")
    val base = emb.where(v.isNotNull)
    def sub(s: Int): Column = slice(v, lit(s * ds + 1), lit(ds))
    var cents: Map[Int, Seq[(Int, Seq[Double])]] = {
      val seeds = base.select(col(idCol), v.as("_v"))
        .orderBy(col(idCol)).limit(k).collect()
        .zipWithIndex.map { case (r, i) => (i, r.getSeq[Double](1)) }
      (0 until subspaces).map { s =>
        s -> seeds.map { case (cid, vec) =>
          (cid, vec.slice(s * ds, (s + 1) * ds))
        }.toSeq
      }.toMap
    }
    def codeExpr(s: Int): Column =
      subCodeKernel(emb.sparkSession, cents(s), s * ds, ds, dim)(v)
    for (_ <- 0 until iters - 1) {
      // the cast names the struct fields: aliases inside struct() are not
      // preserved when the members are complex expressions
      val upd = base
        .select(array((0 until subspaces).map(s =>
          struct(lit(s).as("s"), codeExpr(s).as("cid"), sub(s).as("sv"))): _*)
          .cast("array<struct<s:int,cid:int,sv:array<double>>>")
          .as("subs"))
        .select(explode(col("subs")).as("z"))
        .select(col("z.s").as("s"), col("z.cid").as("cid"),
          posexplode(col("z.sv")))
        .groupBy("s", "cid", "pos").agg(round(avg(col("col")), 6).as("x"))
        .collect()
      cents = upd.groupBy(_.getInt(0)).map { case (s, rows) =>
        s -> rows.groupBy(_.getInt(1)).map { case (cid, cells) =>
          (cid, cells.sortBy(_.getInt(2)).map(_.getDouble(3)).toSeq)
        }.toSeq.sortBy(_._1)
      }
    }
    (0 until subspaces).flatMap(s =>
      cents.getOrElse(s, Nil).map { case (cid, c) => (s, cid, c) })
  }

  /** Compress every vector to its PQ codes under `codebook` (from
   * [[pqTrain]]): (input columns minus the vector) + `codes`
   * (array of subspace centroid ids). One zero-shuffle scan. */
  def pqEncode(emb: DataFrame, vecCol: String, idCol: String, dim: Int,
      codebook: Seq[(Int, Int, Seq[Double])]): DataFrame = {
    val bySub = codebook.groupBy(_._1)
    val subspaces = bySub.size
    require(subspaces >= 1 && dim % subspaces == 0,
      s"dim $dim must divide evenly into $subspaces subspaces")
    val ds = dim / subspaces
    val v = col(vecCol).cast("array<double>")
    def codeExpr(s: Int): Column =
      subCodeKernel(emb.sparkSession,
        bySub(s).map { case (_, cid, c) => (cid, c) },
        s * ds, ds, dim)(v)
    emb.where(v.isNotNull)
      .select(col(idCol),
        array((0 until subspaces).map(codeExpr): _*).as("codes"))
  }

  /**
   * Asymmetric-distance (ADC) top-k over a PQ-ENCODED frame: the query
   * stays a raw vector, each corpus vector is its codes, and the
   * approximate squared distance is a sum of `subspaces` precomputed
   * query-to-centroid table lookups — no vector arithmetic per row at
   * all, just element_at into literal tables. Returns the k closest
   * (idCol, adist) by rounded distance, ties to the lowest id; one
   * narrow scan + TakeOrdered, no shuffle.
   */
  def pqTopK(encoded: DataFrame, idCol: String,
      codebook: Seq[(Int, Int, Seq[Double])], query: Seq[Double],
      topK: Int): DataFrame = {
    require(topK >= 1, "topK must be >= 1")
    val bySub = codebook.groupBy(_._1)
    val subspaces = bySub.size
    val ds = query.length / subspaces
    require(query.length == subspaces * ds,
      s"query dim ${query.length} must divide into $subspaces subspaces")
    // per-subspace ADC table: distance from the query's slice to every
    // centroid, indexed by cid (codebooks are dense 0..k-1 after train;
    // a dropped centroid never appears in codes, its slot is a dummy)
    val tables: Seq[Seq[Double]] = (0 until subspaces).map { s =>
      val qs = query.slice(s * ds, (s + 1) * ds)
      val byCid = bySub(s).map { case (_, cid, c) =>
        cid -> qs.zip(c).map { case (a, b) => (a - b) * (a - b) }.sum
      }.toMap
      (0 to byCid.keys.max).map(cid => byCid.getOrElse(cid, Double.MaxValue))
    }
    val adist = (0 until subspaces).map(s =>
      element_at(typedlit(tables(s)), element_at(col("codes"), s + 1) + 1))
      .reduce(_ + _)
    encoded
      .select(col(idCol), round(adist, 6).as("adist"))
      .orderBy(col("adist"), col(idCol))
      .limit(topK)
  }

  /**
   * Two-stage PQ search — the production shape (Jégou et al.'s IVFADC +
   * rerank): the ADC scan over codes picks a `shortlist` of candidates
   * (memory-bound stage: 8-32 bytes per vector), then ONLY the shortlist
   * joins back to its raw vectors for exact re-ranking. Quantization
   * coarseness costs shortlist membership, not final precision — with a
   * 10x shortlist the exact top-k is recovered almost always, while the
   * full corpus is never touched in raw-vector form. The shortlist→raw
   * join is k·shortlist rows against the corpus — broadcastable by
   * construction.
   */
  def pqTopKRerank(encoded: DataFrame, raw: DataFrame, vecCol: String,
      idCol: String, codebook: Seq[(Int, Int, Seq[Double])],
      query: Seq[Double], topK: Int, shortlist: Int = 0): DataFrame = {
    val sl = if (shortlist > 0) shortlist else topK * 10
    require(sl >= topK, "shortlist must be >= topK")
    val cand = pqTopK(encoded, idCol, codebook, query, sl).select(col(idCol))
    val v = col(vecCol).cast("array<double>")
    raw.join(org.apache.spark.sql.functions.broadcast(cand), idCol)
      .select(col(idCol),
        round(aggregate(zip_with(v, typedlit(query),
          (a, b) => (a - b) * (a - b)), lit(0.0), (acc, x) => acc + x), 6)
          .as("dist"))
      .orderBy(col("dist"), col(idCol))
      .limit(topK)
  }

  /** Build an IVF index: MLlib KMeans into nlist cells, assignments
   * cached. The 100 TB shape writes `assigned` partitioned by cell. */
  def fitIvfIndex(
      emb: DataFrame, vecCol: String, idCol: String,
      nlist: Int = 16, seed: Long = 42L): IvfIndex = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.linalg.Vectors
    graft.functions.GraftFunctions.register(emb.sparkSession)
    val toVec = udf { (xs: Seq[Double]) => Vectors.dense(xs.toArray) }
    val v = col(vecCol).cast("array<double>")
    val prepared = emb.select(col(idCol), v.as("arr"))
      .withColumn("mlvec", toVec(col("arr")))
    val model = new KMeans().setK(nlist).setSeed(seed)
      .setFeaturesCol("mlvec").setPredictionCol("cell")
      .fit(prepared)
    // Index scope, NOT the pair-operator scope: a live index must survive
    // Dedup/Similarity.unpersistAll; it releases via IvfIndex.unpersist().
    val assigned = CacheScope.track(model.transform(prepared)
      .select(col(idCol), col("arr"), col("cell")), CacheScope.Index)
    new IvfIndex(assigned, model.clusterCenters.map(_.toArray), idCol)
  }

  /**
   * Persist a fitted IVF index: the assignments are written PARTITIONED BY
   * cell — at corpus scale, a query touching nprobe cells then prunes at
   * the file level (the cell filter becomes a partition filter on the
   * scan, so only nprobe/nlist of the corpus is ever read). Centers and
   * the id column name go into tiny side tables.
   */
  def saveIvfIndex(index: IvfIndex, path: String): Unit = {
    val spark = index.assigned.sparkSession
    index.assigned.write.mode("overwrite").partitionBy("cell")
      .parquet(s"$path/assigned")
    import spark.implicits._
    index.centers.zipWithIndex.map { case (c, i) => (i, c.toSeq) }.toSeq
      .toDF("cell", "center")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/centers")
    Seq(Tuple1(index.idCol)).toDF("id_col")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/meta")
  }

  /** Reload a persisted IVF index. The assignment frame stays lazy/on-disk:
   * `query` filters on `cell`, which Spark turns into partition pruning
   * over the cell-partitioned layout (no full-corpus scan, no cache
   * warmup needed). */
  def loadIvfIndex(spark: org.apache.spark.sql.SparkSession, path: String): IvfIndex = {
    graft.functions.GraftFunctions.register(spark)
    val idCol = spark.read.parquet(s"$path/meta").collect()(0).getString(0)
    val centers = spark.read.parquet(s"$path/centers")
      .collect().map(r => r.getInt(0) -> r.getSeq[Double](1).toArray)
      .sortBy(_._1).map(_._2)
    val assigned = spark.read.parquet(s"$path/assigned")
      .select(col(idCol), col("arr"), col("cell"))
    new IvfIndex(assigned, centers, idCol)
  }

  /** IVF-style ANN: cluster the corpus with MLlib KMeans (nlist cells),
   * then search only the nprobe cells nearest the query. One-shot
   * convenience over fitIvfIndex + query. */
  def ivfTopK(
      emb: DataFrame, vecCol: String, idCol: String,
      query: Seq[Double], k: Int, nlist: Int = 16, nprobe: Int = 4,
      seed: Long = 42L): DataFrame = {
    val index = fitIvfIndex(emb, vecCol, idCol, nlist, seed)
    index.query(query, k, nprobe)
  }

  /** Batched exact top-k: MANY query vectors against the corpus in ONE
   * scan — at scale you never rescan per query. The query set is
   * broadcast; per (row, query) cosine goes through the native kernel.
   * Ranking is two-stage so parallelism survives: a per-(qid, input
   * partition) window prunes to k rows per partition (numPartitions * Q
   * keys, fully parallel), then the tiny survivor set gets the global
   * per-qid rank. A single global window would funnel the whole scored
   * corpus through Q reducer tasks. `roundDigits` ranks on the rounded
   * cosine (ties by id) for cross-engine-deterministic cuts.
   * Returns (qid, id, cosine, rank). */
  def batchTopK(
      corpus: DataFrame, vecCol: String, idCol: String,
      queries: DataFrame, qidCol: String, qvecCol: String,
      k: Int, roundDigits: Option[Int] = None): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    graft.functions.GraftFunctions.register(corpus.sparkSession)
    val v = col(vecCol).cast("array<double>")
    val qv = col(qvecCol).cast("array<double>")
    val q = broadcast(queries.select(col(qidCol).as("qid"), qv.as("qvec")))
    val rawCos = cosineNative(col("cvec"), col("qvec"))
    val cosExpr = roundDigits.map(d => round(rawCos, d)).getOrElse(rawCos)
    val scored = corpus.select(col(idCol).as("id"), v.as("cvec"))
      .withColumn("part", spark_partition_id())
      .crossJoin(q)
      .select(col("qid"), col("id"), col("part"), cosExpr.as("cosine"))
    // stage 1: partial top-k per (qid, source partition) — any grouping of
    // the corpus is valid here, the union of partial top-ks contains the
    // global top-k
    val wPart = Window.partitionBy("qid", "part").orderBy(desc("cosine"), col("id"))
    val pruned = scored
      .withColumn("prank", row_number().over(wPart))
      .filter(col("prank") <= k)
      .drop("prank", "part")
    // stage 2: global rank over <= numPartitions * k rows per query
    val w = Window.partitionBy("qid").orderBy(desc("cosine"), col("id"))
    pruned
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
  }

  /**
   * Multi-probe LSH top-k: probe the query's bucket PLUS the `nProbe - 1`
   * buckets with the smallest total flipped-|margin| (single- AND
   * multi-bit perturbations, generated in exact ascending order) — the
   * standard multi-probe refinement (Lv et al., VLDB'07): near-boundary
   * bits are the likeliest to differ for true neighbors, so probing those
   * flips recovers most of the recall a single-bucket probe loses while
   * scanning only nProbe/2^bits of the corpus. Any nProbe up to 2^bits is
   * honored exactly.
   */
  def lshTopKMultiProbe(
      emb: DataFrame, vecCol: String, idCol: String,
      query: Seq[Double], k: Int, bits: Int = 8, nProbe: Int = 4,
      seed: Long = 42L, roundDigits: Option[Int] = None): DataFrame = {
    graft.functions.GraftFunctions.register(emb.sparkSession)
    val dim = query.length
    val v = col(vecCol).cast("array<double>")
    val (qb, margins) = lshBucketAndMargins(query, bits, seed)
    val probes = probeMasks(margins, nProbe).map(_ ^ qb)
    val rawCos = cosineNative(v, typedlit(query))
    val cosExpr = roundDigits.map(d => round(rawCos, d)).getOrElse(rawCos)
    emb.withColumn("bucket", lshBucket(v, dim, bits, seed))
      .filter(col("bucket").isin(probes: _*))
      .select(col(idCol), cosExpr.as("cosine"))
      .orderBy(desc("cosine"), col(idCol))
      .limit(k)
  }

  /** Approximate top-k: restrict the scan to the query's LSH bucket.
   * `roundDigits` ranks on the ROUNDED cosine (ties by id) so the top-k cut
   * is deterministic and oracle-reproducible. */
  def lshTopK(
      emb: DataFrame, vecCol: String, idCol: String,
      query: Seq[Double], k: Int, bits: Int = 8,
      roundDigits: Option[Int] = None): DataFrame = {
    graft.functions.GraftFunctions.register(emb.sparkSession)
    val dim = query.length
    val v = col(vecCol).cast("array<double>")
    val withBucket = emb.withColumn("bucket", lshBucket(v, dim, bits))
    // compute the query's bucket on the driver with the same planes
    val qb = lshBucketOf(query, bits)
    val rawCos = cosineNative(v, typedlit(query))
    val cosExpr = roundDigits.map(d => round(rawCos, d)).getOrElse(rawCos)
    withBucket
      .filter(col("bucket") === qb)
      .select(col(idCol), cosExpr.as("cosine"))
      .orderBy(desc("cosine"), col(idCol))
      .limit(k)
  }

  /**
   * Reciprocal-rank fusion (Cormack et al. 2009) — THE standard hybrid-
   * retrieval combiner (lexical BM25 list ⊕ ANN list): each input frame
   * carries (id, rank) with rank 1-based; the fused score is
   * Σ 1/(k + rank) over the lists the id appears in, rounded 6dp
   * (1/(k+r) steps are ~1e-4 at shortlist depths, so 6dp preserves
   * order while pinning cross-engine determinism). Items missing from a
   * list contribute 0 from it — the published convention.
   *
   * Shape: one full-outer keyed join + narrow arithmetic; inputs are
   * SHORTLISTS (top-k from their scorers), so this is a tiny-frame
   * combine — ranking the fused result is the caller's TakeOrdered on
   * (rrf desc, id).
   */
  def rrfFuse(a: DataFrame, b: DataFrame, idCol: String,
      k: Int = 60): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val fa = a.select(col(idCol), col("rank").as("rank_a"))
    val fb = b.select(col(idCol), col("rank").as("rank_b"))
    fa.join(fb, Seq(idCol), "full_outer")
      .select(col(idCol),
        round(
          coalesce(lit(1.0) / (lit(k) + col("rank_a")), lit(0.0))
            + coalesce(lit(1.0) / (lit(k) + col("rank_b")), lit(0.0)),
          6).as("rrf"))
  }

  /**
   * Retrieval evaluation metrics — the harness that says whether the
   * ANN/BM25/hybrid tier is any good: per query, recall@k,
   * precision@k, MRR@k, and nDCG@k of a ranked `results` frame
   * (qid, doc, rank) against a `qrels` frame (qid, doc, grade; grade
   * > 0 = relevant, graded levels feed nDCG). Missing judgments score
   * grade 0 (the TREC convention). nDCG uses the standard exponential
   * gain (2^grade − 1) with the ln(r+1)/ln 2 discount — written as the
   * ln quotient on BOTH engines so the oracle is bit-identical; IDCG
   * ranks each query's judgments by (grade desc, doc) so ties are
   * deterministic. Queries with no relevant documents score 0 across
   * the board (not NULL — an unanswerable query is a 0, not a gap).
   * Output: qid, n_rel, recall_k, precision_k, mrr_k, ndcg_k (4dp).
   *
   * Shape at scale: every join and window partitions by qid — per-query
   * result lists are k-bounded by construction and judgment lists are
   * evaluation-sized, so state per key is tiny and query count drives
   * parallelism. No global sort, no collect.
   */
  def retrievalMetrics(results: DataFrame, qrels: DataFrame, k: Int,
      qidCol: String = "qid", docCol: String = "doc",
      rankCol: String = "rank", gradeCol: String = "grade"): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    import org.apache.spark.sql.expressions.Window
    val res = results.select(col(qidCol).as("qid"), col(docCol).as("doc"),
      col(rankCol).cast("long").as("rank")).filter(col("rank") <= k)
    val rel = qrels.select(col(qidCol).as("qid"), col(docCol).as("doc"),
      col(gradeCol).cast("double").as("grade"))
    val perQ = rel.groupBy("qid").agg(
      sum(when(col("grade") > 0, 1L).otherwise(0L)).as("n_rel"))
    val joined = res.join(rel, Seq("qid", "doc"), "left")
      .withColumn("grade", coalesce(col("grade"), lit(0.0)))
    val hits = joined.groupBy("qid").agg(
      sum(when(col("grade") > 0, 1L).otherwise(0L)).as("n_hit"),
      min(when(col("grade") > 0, col("rank"))).as("first_rel"),
      sum((pow(lit(2.0), col("grade")) - 1.0) /
        (log(col("rank") + 1.0) / log(lit(2.0)))).as("dcg"))
    val iw = Window.partitionBy("qid").orderBy(desc("grade"), col("doc"))
    val idcg = rel.filter(col("grade") > 0)
      .withColumn("irank", row_number().over(iw))
      .filter(col("irank") <= k)
      .groupBy("qid").agg(
        sum((pow(lit(2.0), col("grade")) - 1.0) /
          (log(col("irank") + 1.0) / log(lit(2.0)))).as("idcg"))
    perQ.join(hits, Seq("qid"), "left").join(idcg, Seq("qid"), "left")
      .select(col("qid"), col("n_rel"),
        round(when(col("n_rel") > 0,
          coalesce(col("n_hit"), lit(0L)) / col("n_rel").cast("double"))
          .otherwise(lit(0.0)), 4).as("recall_k"),
        round(coalesce(col("n_hit"), lit(0L)) / lit(k.toDouble), 4)
          .as("precision_k"),
        round(coalesce(lit(1.0) / col("first_rel"), lit(0.0)), 4)
          .as("mrr_k"),
        round(when(col("idcg").isNotNull && col("idcg") > 0,
          coalesce(col("dcg"), lit(0.0)) / col("idcg"))
          .otherwise(lit(0.0)), 4).as("ndcg_k"))
  }

  /**
   * Per-label embedding centroids — the mean vector of each labeled
   * slice (domain, cluster, language), rounded to 6dp per coordinate so
   * any engine/partitioning reproduces the same centroid (the
   * kmeansAssign determinism contract). Output: label, centroid
   * (array<double>), n (member count).
   *
   * Shape at scale: one posexplode → (label, pos) average (map-side
   * combined — the shuffle carries labels × dim rows, never the
   * corpus), centroids reassembled by a position-sorted collect within
   * each label. No window over the data, no collect to the driver.
   */
  def groupCentroids(emb: DataFrame, vecCol: String,
      labelCol: String): DataFrame = {
    val exploded = emb
      .select(col(labelCol).as("label"),
        posexplode(col(vecCol).cast("array<double>")).as(Seq("pos", "x")))
    val perPos = exploded.groupBy("label", "pos")
      .agg(round(avg(col("x")), 6).as("m"), count(lit(1)).as("n"))
    perPos.groupBy("label")
      .agg(transform(sort_array(collect_list(struct(col("pos"), col("m")))),
          s => s("m")).as("centroid"),
        max(col("n")).as("n"))
  }

  /**
   * Simplified silhouette (Hruschka et al. 2004; Vendramin et al. 2010
   * — the form MLlib's ClusteringEvaluator also reduces to): per point
   * a = euclidean distance to its OWN cluster centroid, b = the nearest
   * OTHER centroid's distance, s = (b−a)/max(a,b) ∈ [−1, 1]; reported
   * per cluster as the member count, mean s and min s. THE
   * choose-k / is-this-clustering-coherent readout before committing a
   * SemDeDup prune or an IVF cell layout to a 100 TB corpus: mean s
   * near 0 says the cells barely separate (pruning by them is noise),
   * a negative min s names the cluster whose members sit closer to a
   * neighbor's centroid than their own. Classic silhouette is O(n²)
   * pairwise — infeasible at corpus scale by construction; the
   * centroid form is the standard distributed reduction and states so
   * rather than approximating silently.
   *
   * Shape: centroids come from one (cluster, pos) aggregation (6dp —
   * the [[groupCentroids]]/kmeans determinism contract) collected as
   * clusters-sized driver state (the [[kmeansAssign]] envelope — label
   * tables, never the corpus, and ENFORCED by `maxClusters`: a
   * data-scale label column fails fast with the sizing instead of
   * silently building a k·dim-literal plan); a and b are then ONE
   * zero-shuffle narrow scan of exactly TWO argmin-kernel calls per
   * row — an own-centroid lookup (the kernel's `own` mode, id read
   * from a prefixed element) and one top-2 pass over the full table
   * (b = the runner-up when the winner IS the own cluster, else the
   * winner — the identity that makes nearest-OTHER one call). Plan
   * size is O(k·dim) literals; a k-branch CaseWhen form before round
   * 16 embedded k·(k−1)·dim literals and hit the plan-compile cliff at
   * IVF-scale k. The output aggregation is clusters-sized. Distances
   * round 6dp before s (so any engine replays the division
   * bit-for-bit), s rounds 6dp, means 4dp (reassociation-safe at
   * |s| ≤ 1). Output: cluster, n, mean_s (4dp), min_s (6dp).
   *
   * @param maxClusters fail-fast bound on the centroid table (default
   *   4096 ≈ 4 MB of plan literals at dim 128 — the bradleyTerry
   *   maxItems pattern); raise deliberately for bigger IVF layouts.
   */
  def silhouetteSimplified(emb: DataFrame, vecCol: String,
      clusterCol: String, maxClusters: Int = 4096): DataFrame = {
    require(maxClusters >= 2, s"maxClusters must be >= 2: $maxClusters")
    val spark = emb.sparkSession
    val v = col(vecCol).cast("array<double>")
    val base = emb.where(v.isNotNull && col(clusterCol).isNotNull)
      .select(col(clusterCol).cast("int").as("_cl"), v.as("_v"))
    // clusters-sized driver state, the groupCentroids aggregation shape,
    // with the driver materialization BOUNDED at maxClusters x dim rows:
    // the collect carries a limit of that many rows + 1, so a data-scale
    // cluster column overshoots the cap and fails with the sizing
    // message instead of OOMing the driver (the bradleyTerry maxItems
    // pattern). dim comes from one head(1) narrow probe (the
    // embeddingCosinePairs precedent — milliseconds, short-circuits on
    // the first partition), so the guard adds no second corpus pass.
    val dimRow = base.select(size(col("_v")).as("_d"))
      .filter(col("_d") > 0).head(1)
    require(dimRow.nonEmpty, "silhouette needs at least one non-empty vector")
    val dim = dimRow(0).getInt(0)
    val cap = maxClusters.toLong * dim
    require(cap + 1 <= Int.MaxValue,
      s"maxClusters x dim overflows a collect limit: $maxClusters x $dim")
    val collected = base
      .select(col("_cl"), posexplode(col("_v")).as(Seq("pos", "x")))
      .groupBy("_cl", "pos").agg(round(avg(col("x")), 6).as("m"))
      .limit(cap.toInt + 1)
      .collect()
    require(collected.length <= cap,
      s"silhouette collects a clusters x dim centroid table on the " +
        s"driver and embeds it in the plan, but the input exceeds " +
        s"maxClusters=$maxClusters clusters at dim $dim (> $cap centroid " +
        "cells): cluster columns must be label-scale (IVF cells, kmeans " +
        "labels), not data-scale — and a mixed-dimension corpus inflates " +
        "the cell count the same way; raise maxClusters deliberately if " +
        "the layout really is this wide")
    val cents: Seq[(Int, Seq[Double])] = collected
      .groupBy(_.getInt(0))
      .map { case (cid, rows) =>
        (cid, rows.sortBy(_.getInt(1)).map(_.getDouble(2)).toSeq)
      }.toSeq.sortBy(_._1)
    require(cents.size >= 2,
      s"silhouette needs >= 2 clusters, got ${cents.size}")
    // one narrow scan, two kernel calls per row: own-centroid distance
    // (id prefixed as element 0 of the scored array) + top-2 over the
    // full table; b = second-best iff the global winner is the own
    // cluster. Identical arithmetic to a min over the k-1 others: the
    // same left-to-right Σ(a−b)² per centroid, selection only.
    val a2 = ownDist(spark, col("_cl"), col("_v"), cents)
    val withT2 = base.withColumn("_t2", minDistTop2(spark, col("_v"), cents))
    val b2 = when(col("_t2").getItem(1).cast("int") === col("_cl"),
      col("_t2").getItem(2)).otherwise(col("_t2").getItem(0))
    withT2
      .withColumn("_a", round(sqrt(a2), 6))
      .withColumn("_b", round(sqrt(b2), 6))
      .withColumn("_s", when(greatest(col("_a"), col("_b")) > 0,
        round((col("_b") - col("_a")) / greatest(col("_a"), col("_b")), 6))
        .otherwise(lit(0.0)))
      .groupBy(col("_cl").as("cluster"))
      .agg(count(lit(1)).as("n"),
        round(avg(col("_s")), 4).as("mean_s"),
        (min(col("_s")) + lit(0.0)).as("min_s"))
  }

  /**
   * Embedding-norm diagnostics — the sanity scan BEFORE any cosine
   * math ([[centroidDrift]] catches distribution shift; this catches
   * the plumbing failures that precede it: an un-normalized batch, a
   * zeroed column, NaN/Inf from an overflowed encoder — each of which
   * silently corrupts every cosine downstream because a zero or
   * non-finite norm poisons the denominator): one row per corpus with
   * counts of NULL vectors, zero-norm vectors, non-finite-component
   * vectors, the dimension spread (a ragged corpus is a bug), and
   * exact norm quantiles (p01/p50/p99 — a normalized corpus reads
   * ~1/1/1; a mixed batch shows the spread instantly).
   * One narrow per-row norm projection + one aggregation; percentile
   * exact (swap approx at the winsorize contract).
   * Output: n, n_null, n_zero, n_nonfinite, dim_min, dim_max,
   * norm_p01, norm_p50, norm_p99 (6dp).
   */
  def normProfile(emb: DataFrame, vecCol: String): DataFrame = {
    val norm2 = aggregate(col("_v"), lit(0.0), (acc, x) => acc + x * x)
    val finite = forall(col("_v"),
      x => !isnan(x) && x > Double.NegativeInfinity
        && x < Double.PositiveInfinity)
    val base = emb.select(col(vecCol).cast("array<double>").as("_v"))
      .withColumn("_null", col("_v").isNull)
      .withColumn("_dim", when(!col("_null"), size(col("_v"))))
      .withColumn("_fin", when(!col("_null"), finite))
      .withColumn("_norm",
        when(!col("_null") && col("_fin"), sqrt(norm2)))
    base.agg(
      count(lit(1)).as("n"),
      sum(when(col("_null"), 1L).otherwise(0L)).as("n_null"),
      sum(when(col("_norm") === 0.0, 1L).otherwise(0L)).as("n_zero"),
      sum(when(col("_fin") === false, 1L).otherwise(0L))
        .as("n_nonfinite"),
      min(col("_dim")).cast("long").as("dim_min"),
      max(col("_dim")).cast("long").as("dim_max"),
      round(percentile(col("_norm"), lit(0.01)), 6).as("norm_p01"),
      round(percentile(col("_norm"), lit(0.5)), 6).as("norm_p50"),
      round(percentile(col("_norm"), lit(0.99)), 6).as("norm_p99"))
  }

  /**
   * Embedding-centroid drift — the EMBEDDING member of the drift
   * family ([[graft.ops.Profile.psiDrift]] covers numeric columns,
   * [[graft.ops.TextMetrics.unigramDrift]] covers token text; this
   * answers "did the embedding DISTRIBUTION move since the reference
   * snapshot" — a re-encoded model, a new upstream corpus mix, a
   * broken normalization — before retrieval quality quietly decays):
   * per dimension, both snapshots' mean components (6dp — the
   * groupCentroids convention) and the delta; sum |delta| or read the
   * summary cosine between the two mean vectors from the same rows.
   * Mean-vector drift is the cheap first-moment probe — it catches
   * translations and re-scalings, not variance-only changes (pair it
   * with per-dimension [[graft.ops.Profile.psiDrift]] when those
   * matter; the doc states the blind spot rather than overclaiming).
   *
   * One posexplode + (side, pos) aggregation per snapshot (map-side
   * combined to dim-sized frames), a dim-keyed join — no data-sized
   * join, no window, no action. Output: pos, n_ref, n_cur, mean_ref,
   * mean_cur (6dp), delta (6dp, −0.0 canonicalized).
   */
  def centroidDrift(ref: DataFrame, cur: DataFrame,
      vecCol: String): DataFrame = {
    def side(df: DataFrame, mc: String, nc: String) = df
      .filter(col(vecCol).isNotNull)
      .select(posexplode(col(vecCol).cast("array<double>"))
        .as(Seq("pos", "x")))
      .groupBy("pos")
      .agg(round(avg(col("x")), 6).as(mc), count(lit(1)).as(nc))
    side(ref, "mean_ref", "n_ref")
      .join(side(cur, "mean_cur", "n_cur"), Seq("pos"), "full_outer")
      .select(col("pos").cast("long").as("pos"),
        coalesce(col("n_ref"), lit(0L)).as("n_ref"),
        coalesce(col("n_cur"), lit(0L)).as("n_cur"),
        col("mean_ref"), col("mean_cur"),
        (round(col("mean_cur") - col("mean_ref"), 6) + lit(0.0))
          .as("delta"))
  }

  /**
   * Centroid-distance outliers — the embedding-space label-noise /
   * off-topic detector: each member's cosine to its OWN label centroid,
   * keeping the `bottomK` least-similar members per label (cosine asc —
   * the rows that least belong where they are filed; SemDeDup's dual:
   * semanticPairs finds rows too close together, this finds rows too far
   * from home). Output: label, id, cosine (5dp), rank.
   *
   * Shape: [[groupCentroids]] (labels × dim rows) joined back on the
   * label — AQE broadcasts it at any sane label count — then one narrow
   * cosine scan and the topKPerGroup WindowGroupLimit shape for the
   * per-label bottom-k (map-side pruned to k before the exchange).
   */
  /**
   * Hard-negative mining — the contrastive-training staple (a model
   * learns nothing from easy negatives; the pairs that teach are the
   * most similar vectors with a DIFFERENT label): for each anchor, the
   * top-k highest-cosine corpus vectors whose label differs — exactly
   * [[batchTopK]]'s two-stage exact top-k with the label-mismatch (and
   * self-exclusion) predicate applied BEFORE the per-partition prune,
   * so the partial top-ks remain provably complete for the filtered
   * relation. Anchors broadcast (the batchTopK contract: mine a
   * BATCH-sized anchor set per pass at corpus scale — anchors default
   * to the corpus itself only at sample/gate scale); swap the corpus
   * side for the LSH/IVF/PQ quartet when exact scan cost dominates.
   * Output: anchor, negative, anchor_label, negative_label, cosine,
   * rank.
   */
  def hardNegatives(corpus: DataFrame, vecCol: String, idCol: String,
      labelCol: String, k: Int,
      anchors: Option[DataFrame] = None,
      roundDigits: Option[Int] = None): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(k >= 1, s"k must be >= 1: $k")
    graft.functions.GraftFunctions.register(corpus.sparkSession)
    val v = col(vecCol).cast("array<double>")
    val a = broadcast(anchors.getOrElse(corpus)
      .select(col(idCol).as("anchor"), v.as("avec"),
        col(labelCol).as("anchor_label")))
    val rawCos = cosineNative(col("cvec"), col("avec"))
    val cosExpr = roundDigits.map(d => round(rawCos, d)).getOrElse(rawCos)
    val scored = corpus
      .select(col(idCol).as("negative"), v.as("cvec"),
        col(labelCol).as("negative_label"))
      .withColumn("part", spark_partition_id())
      .crossJoin(a)
      .filter(col("negative_label") =!= col("anchor_label") &&
        col("negative") =!= col("anchor"))
      .select(col("anchor"), col("anchor_label"), col("negative"),
        col("negative_label"), col("part"), cosExpr.as("cosine"))
    val wPart = Window.partitionBy("anchor", "part")
      .orderBy(desc("cosine"), col("negative"))
    val pruned = scored
      .withColumn("prank", row_number().over(wPart))
      .filter(col("prank") <= k)
      .drop("prank", "part")
    val w = Window.partitionBy("anchor")
      .orderBy(desc("cosine"), col("negative"))
    pruned
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
  }

  /**
   * Centroid similarity matrix — the domain-similarity map over a
   * labeled embedding corpus (which sources/languages/topics live
   * close in embedding space — the input to mixture design and to
   * "these two domains are near-duplicates at the distribution level"
   * calls; [[centroidOutliers]] scores members against their OWN
   * centroid, this scores centroids against EACH OTHER): pairwise
   * cosine between [[groupCentroids]] vectors, each unordered pair
   * once (label_a < label_b), 4dp.
   *
   * Shape at scale: the labels×dim centroid aggregation is the only
   * data-sized pass (inherited from groupCentroids, 6dp-rounded
   * coordinates — the determinism contract); the pair join runs on
   * the LABELS-sized frame (a self-join of k rows, k = distinct
   * labels, never the corpus). Zero-norm centroids report NULL cosine.
   * Output: label_a, label_b, n_a, n_b, cos (4dp).
   */
  def centroidSimMatrix(emb: DataFrame, vecCol: String,
      labelCol: String): DataFrame = {
    val cents = groupCentroids(emb, vecCol, labelCol)
    val a = cents.select(col("label").as("label_a"),
      col("centroid").as("_ca"), col("n").as("n_a"))
    val b = cents.select(col("label").as("label_b"),
      col("centroid").as("_cb"), col("n").as("n_b"))
    a.join(b, col("label_a") < col("label_b"))
      .withColumn("_dot", expr(
        "aggregate(zip_with(_ca, _cb, (x, y) -> x * y), 0D, (s, v) -> s + v)"))
      .withColumn("_na", expr(
        "sqrt(aggregate(_ca, 0D, (s, v) -> s + v * v))"))
      .withColumn("_nb", expr(
        "sqrt(aggregate(_cb, 0D, (s, v) -> s + v * v))"))
      .select(col("label_a"), col("label_b"), col("n_a"), col("n_b"),
        when(col("_na") > 0 && col("_nb") > 0,
          round(col("_dot") / (col("_na") * col("_nb")), 4)).as("cos"))
  }

  def centroidOutliers(emb: DataFrame, idCol: String, vecCol: String,
      labelCol: String, bottomK: Int): DataFrame = {
    require(bottomK >= 1, s"bottomK must be >= 1, got $bottomK")
    val cents = groupCentroids(emb, vecCol, labelCol)
      .select(col("label").as(labelCol), col("centroid"))
    val scored = emb.join(cents, labelCol)
      .select(col(labelCol), col(idCol),
        round(cosine(col(vecCol).cast("array<double>"), col("centroid")), 5)
          .as("cosine"))
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(labelCol))
      .orderBy(col("cosine"), col(idCol))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= bottomK)
  }

  /**
   * Maximal Marginal Relevance re-ranking (Carbonell & Goldstein 1998)
   * — the diversity pass between retrieval and a context window: pick
   * k results greedily by score = λ·relevance − (1−λ)·max-cosine-to-
   * already-picked, so near-duplicate hits don't crowd out coverage
   * (the RAG failure mode where all 5 chunks say the same thing).
   *
   * Greedy selection is inherently sequential in k: each round scores
   * the REMAINING candidates against the current pick set (pick
   * vectors enter as literals — k-sized driver state, the codebook/
   * centroid convention) and takes ONE argmax row (the loop-control
   * action exception). Run it on a SHORTLIST from any ANN tier —
   * k tiny jobs over tens of rows — never on the corpus; the corpus
   * stage is the ANN scan that produced the shortlist. Pairwise sims
   * round at 5dp and scores at 6dp before every argmax (ties then by
   * id), so selection is engine-exactly replayable.
   * Output: rank (1-based pick order), id, rel, score (at pick time).
   */
  def mmrRerank(shortlist: DataFrame, idCol: String, vecCol: String,
      relCol: String, k: Int, lambda: Double): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(lambda >= 0.0 && lambda <= 1.0, s"lambda must be in [0,1]: $lambda")
    graft.functions.GraftFunctions.register(shortlist.sparkSession)
    val v = col(vecCol).cast("array<double>")
    val base = shortlist.select(col(idCol), v.as("_v"),
      col(relCol).cast("double").as("_rel"))
    // the shortlist is tens of rows by contract; cache so the k argmax
    // jobs don't rescan the ANN stage that produced it
    val cached = CacheScope.track(base)
    val picked = scala.collection.mutable.ArrayBuffer
      .empty[(Any, Double, Double, Seq[Double])]
    var done = false
    while (picked.size < k && !done) {
      val remaining = picked.foldLeft(cached) { case (df, (id, _, _, _)) =>
        df.filter(col(idCol) =!= lit(id))
      }
      val sims = picked.toSeq.map { case (_, _, _, vec) =>
        round(cosineNative(col("_v"), typedlit(vec)), 5)
      }
      val maxSim = sims match {
        case Seq() => lit(0.0)
        case Seq(one) => one // greatest() requires >= 2 args
        case many => greatest(many: _*)
      }
      val scored = remaining.withColumn("_score",
        round(lit(lambda) * col("_rel") - lit(1.0 - lambda) * maxSim, 6))
      val top = scored.orderBy(desc("_score"), col(idCol)).limit(1)
        .select(col(idCol), col("_rel"), col("_score"), col("_v"))
        .collect()
      if (top.isEmpty) done = true
      else {
        val r = top.head
        picked += ((r.get(0), r.getDouble(1), r.getDouble(2),
          r.getSeq[Double](3)))
      }
    }
    import shortlist.sparkSession.implicits._
    val rows = picked.toSeq.zipWithIndex.map { case ((id, rel, score, _), i) =>
      (i + 1L, id.toString, rel, score)
    }
    val idType = shortlist.schema(idCol).dataType
    rows.toDF("rank", "_id", "rel", "score")
      .select(col("rank"), col("_id").cast(idType).as(idCol), col("rel"),
        col("score"))
  }

  /**
   * Symmetric int8 embedding quantization — the 4× memory lever BELOW
   * PQ's 32× (PQ approximates, int8 keeps per-coordinate fidelity; at
   * 100 TB the int8 copy is what brute-force rerank scans after a
   * PQ/IVF shortlist): per vector, scale = max|x| / 127, code_i =
   * clamp(round(x_i / scale), −127, 127). The all-zero vector encodes
   * to zeros at scale 0 (nothing to preserve). Pure per-row array
   * arithmetic — one narrow projection, no shuffle, no state.
   * Output: id, dim, scale (8dp), codes (comma-joined — the gate
   * harness hashes scalars only), mse (reconstruction, 10dp).
   */
  def quantizeInt8(emb: DataFrame, vecCol: String, idCol: String): DataFrame = {
    val v = col(vecCol).cast("array<double>")
    val maxabs = array_max(transform(v, x => abs(x)))
    val scale = maxabs / lit(127.0)
    val codes = transform(v, x =>
      when(scale =!= 0.0,
        greatest(lit(-127L), least(lit(127L), round(x / scale, 0).cast("long"))))
        .otherwise(lit(0L)))
    emb.select(col(idCol), size(v).as("dim"), scale.as("_sc"), v.as("_v"),
        codes.as("_c"))
      .select(col(idCol), col("dim"),
        round(col("_sc"), 8).as("scale"),
        array_join(transform(col("_c"), c => c.cast("string")), ",")
          .as("codes"),
        round(
          aggregate(
            zip_with(col("_v"), col("_c"),
              (x, c) => pow(x - c * col("_sc"), 2)),
            lit(0.0), (acc, e) => acc + e) / col("dim"), 10).as("mse"))
  }
}
