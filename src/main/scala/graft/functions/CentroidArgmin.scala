package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Emit modes for [[CentroidArgmin]] — one kernel, four readout shapes,
 * so every centroid-table consumer (Lloyd assignment, IVF routing, PQ
 * codes, silhouette) runs the SAME scored loop and differs only in what
 * it keeps. */
object CentroidArgmin {
  /** Winning centroid id alone (int) — the PQ code shape. */
  val ModeCode = 0
  /** `[best_dist², winning_id]` (array<double>) — the Lloyd/IVF pair. */
  val ModePair = 1
  /** `[best_dist², best_id, second_dist², second_id]` (array<double>) —
   * best AND runner-up in ONE pass, so nearest-OTHER-centroid readouts
   * (silhouette b) cost one kernel call instead of a k-branch fold of
   * k−1-sized tables (the O(k²·dim) plan blowup this mode removes). */
  val ModeTop2 = 2
  /** dist² to the row's OWN centroid (double): element 0 of the input
   * array carries the own centroid id (the caller prefixes it with
   * `concat(array(cl), vec)` and sets off=1, expectDim=dim+1); the
   * kernel looks the id up in the centroid table and scores only that
   * one row — own-cluster distance in one O(dim) call with no k-branch
   * CaseWhen in the plan. */
  val ModeOwn = 3
}

/**
 * Native Catalyst expression for the centroid-argmin kernels — the hot
 * loop of every Lloyd assignment pass, IVF cell routing, PQ code
 * assignment and silhouette scan ([[graft.ops.Similarity]]). Scores a
 * vector (or the `[off, off+ds)` window of it — the PQ subspace case)
 * against a k×ds codebook embedded as a flat row-major reference array
 * and emits one of the [[CentroidArgmin$]] mode shapes.
 *
 * Arithmetic contract (spec-pinned, replayed by the DuckDB oracles):
 * left-to-right Σ(a−b)² per centroid, centroids scanned in ascending id
 * order with strict `<`, so ties go to the lowest id (and the runner-up
 * of a tied pair is the higher id).
 *
 * This is the seventh native kernel, promoted for the same reason
 * graft_clip_counts was: the previous compiled-UDF form ran its loop in
 * compiled JVM code but a ScalaUDF demotes the HOSTING Project out of
 * whole-stage codegen — it is not enough for the kernel to be compiled,
 * its call site must be codegen-able too. Here the whole argmin runs
 * inside the generated stage: the codebook is a `double[]` reference
 * object, the vector window is copied once per row into a per-stage
 * scratch buffer, and the k·ds loop is branch-free primitive Java.
 *
 * Malformed input fails fast with the sized messages the UDF kernels
 * raised: a wrong-length vector, a null ELEMENT, or (own mode) an id
 * with no centroid is corrupt data (the callers' documented contract
 * filters null VECTORS, which return null).
 */
case class CentroidArgmin(child: Expression, ids: Array[Int],
    flat: Array[Double], ds: Int, off: Int, expectDim: Int,
    mode: Int) extends UnaryExpression {
  import CentroidArgmin._

  private def k: Int = ids.length
  require(k >= 1, "centroid table must be non-empty")
  require(mode >= ModeCode && mode <= ModeOwn,
    s"unknown emit mode $mode")
  require(mode != ModeTop2 || k >= 2,
    s"top-2 mode needs >= 2 centroids, got $k")
  require(flat.length == k * ds,
    s"flat codebook has ${flat.length} cells, expected ${k * ds}")
  require(off >= 0 && off + ds <= expectDim,
    s"window [$off, ${off + ds}) escapes a $expectDim-dim vector")
  require(mode != ModeOwn || off >= 1,
    "own mode reads the own-centroid id from element 0; the vector " +
      "window must start at off >= 1")
  require(ids.sliding(2).forall(p => p.length < 2 || p(0) < p(1)),
    "centroid ids must be strictly ascending (ties resolve to the " +
      "lowest id by scan order)")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_argmin_centroid requires array<double> input, got $other")
  }

  override def dataType: DataType = mode match {
    case ModeCode => IntegerType
    case ModeOwn => DoubleType
    case _ => ArrayType(DoubleType, containsNull = false)
  }

  override def prettyName: String = "graft_argmin_centroid"

  private def what: String = mode match {
    case ModeCode => "PQ code assignment"
    case ModeOwn => "own-centroid distance"
    case _ => "centroid argmin"
  }

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    if (x.numElements() != expectDim)
      throw new IllegalArgumentException(
        s"$what: vector has ${x.numElements()} elements, expected " +
          s"$expectDim (mixed-dimension corpus? filter or re-embed first)")
    val buf = new Array[Double](ds)
    var j = 0
    while (j < ds) {
      if (x.isNullAt(off + j))
        throw new IllegalArgumentException(
          s"$what: null element at position ${off + j} of a $expectDim-dim " +
            "vector (null ELEMENTS are malformed input; the null-vector " +
            "filter only drops whole-null vectors)")
      buf(j) = x.getDouble(off + j)
      j += 1
    }
    if (mode == ModeOwn) {
      if (x.isNullAt(0))
        throw new IllegalArgumentException(
          s"$what: null own-centroid id at element 0")
      val ownId = x.getDouble(0).toInt
      var oc = -1
      var c = 0
      while (oc < 0 && c < k) { if (ids(c) == ownId) oc = c; c += 1 }
      if (oc < 0)
        throw new IllegalArgumentException(
          s"$what: cluster id $ownId has no centroid in the $k-entry " +
            "table (stale centroid table? rebuild it from the same frame)")
      var d = 0.0
      val base = oc * ds
      j = 0
      while (j < ds) { val t = buf(j) - flat(base + j); d += t * t; j += 1 }
      return java.lang.Double.valueOf(d)
    }
    var best = Double.PositiveInfinity
    var second = Double.PositiveInfinity
    var bid = 0
    var sid = 0
    var c = 0
    while (c < k) {
      var d = 0.0
      val base = c * ds
      j = 0
      while (j < ds) { val t = buf(j) - flat(base + j); d += t * t; j += 1 }
      if (d < best) { second = best; sid = bid; best = d; bid = c }
      else if (d < second) { second = d; sid = c }
      c += 1
    }
    mode match {
      case ModeCode => ids(bid)
      case ModePair => new GenericArrayData(Array(best, ids(bid).toDouble))
      case _ => new GenericArrayData(
        Array(best, ids(bid).toDouble, second, ids(sid).toDouble))
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val cents = ctx.addReferenceObj("centsFlat", flat, "double[]")
      val cids = ctx.addReferenceObj("centIds", ids, "int[]")
      // one scratch window per generated stage, not per row
      val buf = ctx.addMutableState("double[]", "argminBuf",
        v => s"$v = new double[$ds];")
      val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val base = ctx.freshName("base")
      val d = ctx.freshName("d")
      val t = ctx.freshName("t")
      val best = ctx.freshName("best")
      val bid = ctx.freshName("bid")
      val second = ctx.freshName("second")
      val sid = ctx.freshName("sid")
      val own = ctx.freshName("own")
      val oc = ctx.freshName("oc")
      val loadWindow =
        s"""
           |if ($a.numElements() != $expectDim) {
           |  throw new IllegalArgumentException("$what: vector has " +
           |    $a.numElements() + " elements, expected $expectDim " +
           |    "(mixed-dimension corpus? filter or re-embed first)");
           |}
           |for (int $j = 0; $j < $ds; $j++) {
           |  if ($a.isNullAt($off + $j)) {
           |    throw new IllegalArgumentException(
           |      "$what: null element at position " + ($off + $j) +
           |      " of a $expectDim-dim vector (null ELEMENTS are malformed" +
           |      " input; the null-vector filter only drops whole-null" +
           |      " vectors)");
           |  }
           |  $buf[$j] = $a.getDouble($off + $j);
           |}
         """.stripMargin
      if (mode == ModeOwn)
        s"""
           |$loadWindow
           |if ($a.isNullAt(0)) {
           |  throw new IllegalArgumentException(
           |    "$what: null own-centroid id at element 0");
           |}
           |int $own = (int) $a.getDouble(0);
           |int $oc = -1;
           |for (int $c = 0; $oc < 0 && $c < ${k}; $c++) {
           |  if ($cids[$c] == $own) $oc = $c;
           |}
           |if ($oc < 0) {
           |  throw new IllegalArgumentException("$what: cluster id " +
           |    $own + " has no centroid in the $k-entry table (stale " +
           |    "centroid table? rebuild it from the same frame)");
           |}
           |double $d = 0.0;
           |int $base = $oc * $ds;
           |for (int $j = 0; $j < $ds; $j++) {
           |  double $t = $buf[$j] - $cents[$base + $j];
           |  $d += $t * $t;
           |}
           |${ev.value} = $d;
         """.stripMargin
      else {
        val emit = mode match {
          case ModeCode => s"${ev.value} = $cids[$bid];"
          case ModePair =>
            s"${ev.value} = new org.apache.spark.sql.catalyst.util." +
              s"GenericArrayData(new double[]{$best, (double) $cids[$bid]});"
          case _ =>
            s"${ev.value} = new org.apache.spark.sql.catalyst.util." +
              s"GenericArrayData(new double[]{$best, (double) $cids[$bid]," +
              s" $second, (double) $cids[$sid]});"
        }
        // second/sid tracked only when top2 asks for them — code/pair
        // stay the exact branch structure the r15 kernel generated
        val trackSecond = mode == ModeTop2
        val decl =
          if (trackSecond)
            s"double $second = Double.POSITIVE_INFINITY;\nint $sid = 0;"
          else ""
        val onBest =
          if (trackSecond) s"{ $second = $best; $sid = $bid; $best = $d; $bid = $c; }"
          else s"{ $best = $d; $bid = $c; }"
        val onSecond =
          if (trackSecond) s"else if ($d < $second) { $second = $d; $sid = $c; }"
          else ""
        s"""
           |$loadWindow
           |double $best = Double.POSITIVE_INFINITY;
           |int $bid = 0;
           |$decl
           |for (int $c = 0; $c < ${k}; $c++) {
           |  double $d = 0.0;
           |  int $base = $c * $ds;
           |  for (int $j = 0; $j < $ds; $j++) {
           |    double $t = $buf[$j] - $cents[$base + $j];
           |    $d += $t * $t;
           |  }
           |  if ($d < $best) $onBest
           |  $onSecond
           |}
           |$emit
         """.stripMargin
      }
    })

  override protected def withNewChildInternal(
      newChild: Expression): CentroidArgmin = copy(child = newChild)
}
