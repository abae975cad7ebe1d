package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}
import org.apache.spark.sql.SparkSessionExtensions

/**
 * Native Catalyst expression for array<double> dot products — the hot
 * kernel of ANN/cosine scans. Generates a tight primitive loop inside
 * whole-stage codegen (no boxing, no lambda-function overhead), vs. the
 * built-in `aggregate(zip_with(...))` composition which allocates an
 * intermediate array per row and runs interpreted higher-order lambdas.
 */
case class ArrayDotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType): Boolean = dt match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_dot requires array<double> inputs, got ${left.dataType} / ${right.dataType}")
  }

  override def dataType: DataType = DoubleType

  override def prettyName: String = "graft_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArrayDotProduct =
    copy(left = newLeft, right = newRight)
}

/** Session registration for the native functions. */
object GraftFunctions {

  private def d(e: Expression, name: String): Double = e.eval() match {
    case x: java.lang.Double => x.doubleValue
    case n: java.lang.Number => n.doubleValue
    case other => throw new IllegalArgumentException(
      s"graft_ratio $name must be a numeric literal, got $other")
  }

  private[functions] def ratioBuilder(exprs: Seq[Expression]): Expression =
    ClippedExpRatio(exprs(0), exprs(1),
      d(exprs(2), "eta"), d(exprs(3), "lb"), d(exprs(4), "ub"))

  private def i(e: Expression, name: String): Int = {
    require(e.foldable, s"$name must be a literal int")
    e.eval() match {
      case n: java.lang.Number => n.intValue
      case other => throw new IllegalArgumentException(
        s"$name must be an int literal, got $other")
    }
  }

  private[functions] def clipBuilder(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 4 || exprs.length == 5,
      s"graft_clip_counts(cand, ref, nFrom, nTo[, mode]): got " +
        s"${exprs.length} args")
    val tokenize = exprs.length == 5 && {
      require(exprs(4).foldable,
        "graft_clip_counts mode must be a literal string")
      exprs(4).eval() match {
        case s: org.apache.spark.unsafe.types.UTF8String =>
          s.toString match {
            case "tokens" => true
            case "chars" => false
            case other => throw new IllegalArgumentException(
              s"graft_clip_counts mode must be 'tokens' or 'chars': $other")
          }
        case other => throw new IllegalArgumentException(
          s"graft_clip_counts mode must be a literal string, got $other")
      }
    }
    ClipCounts(exprs(0), exprs(1), i(exprs(2), "nFrom"), i(exprs(3), "nTo"),
      tokenize)
  }

  private[functions] def argminBuilder(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 7,
      "graft_argmin_centroid(vec, flat, ids, off, ds, expectDim, " +
        s"mode): got ${exprs.length} args")
    def arr[T](e: Expression, name: String)(
        get: org.apache.spark.sql.catalyst.util.ArrayData => T): T = {
      require(e.foldable, s"graft_argmin_centroid $name must be a literal")
      e.eval() match {
        case a: org.apache.spark.sql.catalyst.util.ArrayData => get(a)
        case other => throw new IllegalArgumentException(
          s"graft_argmin_centroid $name must be an array literal, got $other")
      }
    }
    // arg 7: the emit mode — a boolean (legacy: true=pair, false=code)
    // or a string name ("code"|"pair"|"top2"|"own")
    def m(e: Expression): Int = {
      require(e.foldable, "graft_argmin_centroid mode must be a literal")
      e.eval() match {
        case v: java.lang.Boolean =>
          if (v.booleanValue) CentroidArgmin.ModePair
          else CentroidArgmin.ModeCode
        case s if s != null => s.toString match {
          case "code" => CentroidArgmin.ModeCode
          case "pair" => CentroidArgmin.ModePair
          case "top2" => CentroidArgmin.ModeTop2
          case "own" => CentroidArgmin.ModeOwn
          case other => throw new IllegalArgumentException(
            s"graft_argmin_centroid mode must be code|pair|top2|own " +
              s"or a boolean (legacy pair flag): $other")
        }
        case other => throw new IllegalArgumentException(
          s"graft_argmin_centroid mode must be a literal: $other")
      }
    }
    CentroidArgmin(exprs(0),
      arr(exprs(2), "ids")(_.toIntArray()),
      arr(exprs(1), "flat")(_.toDoubleArray()),
      i(exprs(4), "ds"), i(exprs(3), "off"), i(exprs(5), "expectDim"),
      m(exprs(6)))
  }

  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_dot", exprs => ArrayDotProduct(exprs(0), exprs(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_ratio", ratioBuilder, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_jaro", exprs => JaroWinkler(exprs(0), exprs(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_deflate_len", exprs => DeflateLength(exprs(0)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_del_hashes", exprs => DeletionHashes(exprs(0), exprs(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_clip_counts", clipBuilder, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_lcs", exprs => LcsLength(exprs(0), exprs(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_argmin_centroid", argminBuilder, "built-in")
    // Spark's own runtime-filter expressions, surfaced as callable
    // functions: the filter is BUILT distributed (mergeable per-partition
    // sketches inside a regular aggregate) and the probe stays in
    // whole-stage codegen — the shapes Dedup.exactIncrementalBloom needs.
    // Both classes ship in Spark 4.1 but are registry-internal (only the
    // InjectRuntimeFilter rule constructs them), hence the graft_ aliases.
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_bloom_agg", bloomAggBuilder, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_might_contain", bloomProbeBuilder, "built-in")
  }

  private[functions] def bloomAggBuilder(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 3,
      s"graft_bloom_agg(value, estimatedItems, numBits): got ${exprs.length} args")
    new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(
      exprs(0), exprs(1), exprs(2))
  }

  private[functions] def bloomProbeBuilder(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 2,
      s"graft_might_contain(bloom, xxhash64Value): got ${exprs.length} args")
    org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
      exprs(0), exprs(1))
  }
}

/** SparkSessionExtensions hook: enable with
 * .config("spark.sql.extensions", "graft.functions.GraftExtensions"). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[ArrayDotProduct].getName, "graft_dot"),
      (exprs: Seq[Expression]) => ArrayDotProduct(exprs(0), exprs(1))))
    e.injectFunction((
      FunctionIdentifier("graft_ratio"),
      new ExpressionInfo(classOf[ClippedExpRatio].getName, "graft_ratio"),
      (exprs: Seq[Expression]) => GraftFunctions.ratioBuilder(exprs)))
    e.injectFunction((
      FunctionIdentifier("graft_jaro"),
      new ExpressionInfo(classOf[JaroWinkler].getName, "graft_jaro"),
      (exprs: Seq[Expression]) => JaroWinkler(exprs(0), exprs(1))))
    e.injectFunction((
      FunctionIdentifier("graft_deflate_len"),
      new ExpressionInfo(classOf[DeflateLength].getName, "graft_deflate_len"),
      (exprs: Seq[Expression]) => DeflateLength(exprs(0))))
    e.injectFunction((
      FunctionIdentifier("graft_del_hashes"),
      new ExpressionInfo(classOf[DeletionHashes].getName, "graft_del_hashes"),
      (exprs: Seq[Expression]) => DeletionHashes(exprs(0), exprs(1))))
    e.injectFunction((
      FunctionIdentifier("graft_clip_counts"),
      new ExpressionInfo(classOf[ClipCounts].getName, "graft_clip_counts"),
      (exprs: Seq[Expression]) => GraftFunctions.clipBuilder(exprs)))
    e.injectFunction((
      FunctionIdentifier("graft_lcs"),
      new ExpressionInfo(classOf[LcsLength].getName, "graft_lcs"),
      (exprs: Seq[Expression]) => LcsLength(exprs(0), exprs(1))))
    e.injectFunction((
      FunctionIdentifier("graft_argmin_centroid"),
      new ExpressionInfo(classOf[CentroidArgmin].getName,
        "graft_argmin_centroid"),
      (exprs: Seq[Expression]) => GraftFunctions.argminBuilder(exprs)))
    e.injectFunction((
      FunctionIdentifier("graft_bloom_agg"),
      new ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate].getName,
        "graft_bloom_agg"),
      (exprs: Seq[Expression]) => GraftFunctions.bloomAggBuilder(exprs)))
    e.injectFunction((
      FunctionIdentifier("graft_might_contain"),
      new ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain].getName,
        "graft_might_contain"),
      (exprs: Seq[Expression]) => GraftFunctions.bloomProbeBuilder(exprs)))
  }
}
