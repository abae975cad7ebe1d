package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Jaro–Winkler similarity kernel — the fuzzy-matching scorer record
 * linkage actually ranks with (Levenshtein answers "how many edits",
 * Jaro–Winkler answers "how alike do these NAMES look", weighting
 * shared prefixes and tolerating transpositions). Classic definition
 * (Winkler 1990): Jaro similarity over a floor(max/2)−1 match window
 * with half-transposition counting, plus the prefix boost
 * l·0.1·(1−jaro) for up to 4 shared leading characters, applied only
 * above the 0.7 boost threshold. Edge convention matches DuckDB's
 * `jaro_winkler_similarity` (either side empty → 0.0, including both
 * empty) — pinned by a 3000-pair randomized cross-check — so oracle
 * SQL replays the exact same scores.
 *
 * Code points, not UTF-16 units: supplementary characters count as one
 * character on both engines.
 */
object JaroWinklerKernel {

  def sim(a: UTF8String, b: UTF8String): Double =
    simStr(a.toString, b.toString)

  def simStr(s1: String, s2: String): Double = {
    val a = s1.codePoints.toArray
    val b = s2.codePoints.toArray
    val la = a.length
    val lb = b.length
    if (la == 0 || lb == 0) return 0.0
    val window = math.max(0, math.max(la, lb) / 2 - 1)
    val am = new Array[Boolean](la)
    val bm = new Array[Boolean](lb)
    var m = 0
    var i = 0
    while (i < la) {
      val hi = math.min(lb - 1, i + window)
      var j = math.max(0, i - window)
      var found = false
      while (j <= hi && !found) {
        if (!bm(j) && b(j) == a(i)) {
          am(i) = true; bm(j) = true; m += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    var t = 0
    var k = 0
    i = 0
    while (i < la) {
      if (am(i)) {
        while (!bm(k)) k += 1
        if (a(i) != b(k)) t += 1
        k += 1
      }
      i += 1
    }
    val md = m.toDouble
    val jaro = (md / la + md / lb + (m - t / 2) / md) / 3.0
    var l = 0
    val maxPref = math.min(4, math.min(la, lb))
    while (l < maxPref && a(l) == b(l)) l += 1
    if (jaro > 0.7) jaro + l * 0.1 * (1.0 - jaro) else jaro
  }
}

/**
 * Native Catalyst expression `graft_jaro(s1, s2)` → double. The loop
 * runs as a static JVM kernel invoked from generated code (the same
 * shape Spark's own levenshtein uses), so rows stay inside whole-stage
 * codegen — no UDF boxing, no interpreter round trip.
 */
case class JaroWinkler(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_jaro requires string inputs, got ${left.dataType} / ${right.dataType}")

  override def dataType: DataType = DoubleType

  override def prettyName: String = "graft_jaro"

  override def nullSafeEval(a: Any, b: Any): Any =
    JaroWinklerKernel.sim(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.JaroWinklerKernel.sim($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaroWinkler =
    copy(left = newLeft, right = newRight)
}
