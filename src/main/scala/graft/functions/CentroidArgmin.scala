package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/**
 * Native Catalyst expression for the centroid-argmin kernels — the hot
 * loop of every Lloyd assignment pass, IVF cell routing, and PQ code
 * assignment ([[graft.ops.Similarity]]). Scores a vector (or the
 * `[off, off+ds)` window of it — the PQ subspace case) against a
 * k×ds codebook embedded as a flat row-major reference array and emits
 * either `[best_dist², winning_id]` (array<double>, the Lloyd/IVF pair
 * shape) or the winning id alone (int, the PQ code shape).
 *
 * Arithmetic contract (spec-pinned, replayed by the DuckDB oracles):
 * left-to-right Σ(a−b)² per centroid, centroids scanned in ascending id
 * order with strict `<`, so ties go to the lowest id.
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
 * raised: a wrong-length vector or a null ELEMENT is corrupt data (the
 * callers' documented contract filters null VECTORS, which return null).
 */
case class CentroidArgmin(child: Expression, ids: Array[Int],
    flat: Array[Double], ds: Int, off: Int, expectDim: Int,
    emitPair: Boolean) extends UnaryExpression {

  private def k: Int = ids.length
  require(k >= 1, "centroid table must be non-empty")
  require(flat.length == k * ds,
    s"flat codebook has ${flat.length} cells, expected ${k * ds}")
  require(off >= 0 && off + ds <= expectDim,
    s"window [$off, ${off + ds}) escapes a $expectDim-dim vector")
  require(ids.sliding(2).forall(p => p.length < 2 || p(0) < p(1)),
    "centroid ids must be strictly ascending (ties resolve to the " +
      "lowest id by scan order)")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_argmin_centroid requires array<double> input, got $other")
  }

  override def dataType: DataType =
    if (emitPair) ArrayType(DoubleType, containsNull = false) else IntegerType

  override def prettyName: String = "graft_argmin_centroid"

  private def what: String =
    if (emitPair) "centroid argmin" else "PQ code assignment"

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
    var best = Double.PositiveInfinity
    var bid = 0
    var c = 0
    while (c < k) {
      var d = 0.0
      val base = c * ds
      j = 0
      while (j < ds) { val t = buf(j) - flat(base + j); d += t * t; j += 1 }
      if (d < best) { best = d; bid = c }
      c += 1
    }
    if (emitPair) new GenericArrayData(Array(best, ids(bid).toDouble))
    else ids(bid)
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
      val emit =
        if (emitPair)
          s"${ev.value} = new org.apache.spark.sql.catalyst.util." +
            s"GenericArrayData(new double[]{$best, (double) $cids[$bid]});"
        else s"${ev.value} = $cids[$bid];"
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
         |double $best = Double.POSITIVE_INFINITY;
         |int $bid = 0;
         |for (int $c = 0; $c < ${k}; $c++) {
         |  double $d = 0.0;
         |  int $base = $c * $ds;
         |  for (int $j = 0; $j < $ds; $j++) {
         |    double $t = $buf[$j] - $cents[$base + $j];
         |    $d += $t * $t;
         |  }
         |  if ($d < $best) { $best = $d; $bid = $c; }
         |}
         |$emit
       """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): CentroidArgmin = copy(child = newChild)
}
