package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Static JVM kernel behind `graft_lcs`: per-pair token-level longest
 * common subsequence length — the core of ROUGE-L (Lin 2004 §3.1).
 * Tokenization is the repo-wide lowercase-\s+ family, applied INSIDE
 * the kernel (the [[ClipCountsKernel.tokenCounts]] precedent: an HOF
 * tokenizer in the plan would demote the hosting Project out of
 * whole-stage codegen). Tokens intern to ints through one shared
 * dictionary, then the classic two-row DP runs over int arrays:
 * O(m·n) time, O(min-side) extra space, no gram strings materialized.
 * The row iteration keeps the SHORTER side as the inner dimension, so
 * the two scratch rows are min(m, n)-sized (LCS is symmetric).
 */
object LcsKernel {

  // the Java-regex \s class (split(lower(c), "\\s+") semantics) —
  // kept in lockstep with ClipCountsKernel.isWs
  private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' ||
      c == '\r'

  private def ids(u: UTF8String,
      dict: java.util.HashMap[String, Integer]): Array[Int] = {
    val s = u.toLowerCase.toString
    val buf = new java.util.ArrayList[Integer](16)
    var i = 0
    val n = s.length
    while (i < n) {
      while (i < n && isWs(s.charAt(i))) i += 1
      val start = i
      while (i < n && !isWs(s.charAt(i))) i += 1
      if (i > start) {
        val t = s.substring(start, i)
        var id = dict.get(t)
        if (id == null) { id = dict.size(); dict.put(t, id) }
        buf.add(id)
      }
    }
    val out = new Array[Int](buf.size())
    var j = 0
    while (j < out.length) { out(j) = buf.get(j); j += 1 }
    out
  }

  /** LCS length of two int sequences, two-row DP. */
  private def lcsLen(a: Array[Int], b: Array[Int]): Long = {
    if (a.length == 0 || b.length == 0) return 0L
    // inner dimension = the shorter side: scratch is 2·(min+1) ints
    val (outer, inner) = if (a.length >= b.length) (a, b) else (b, a)
    val n = inner.length
    var prev = new Array[Int](n + 1)
    var cur = new Array[Int](n + 1)
    var i = 1
    while (i <= outer.length) {
      val oi = outer(i - 1)
      var j = 1
      while (j <= n) {
        cur(j) =
          if (oi == inner(j - 1)) prev(j - 1) + 1
          else math.max(prev(j), cur(j - 1))
        j += 1
      }
      val t = prev; prev = cur; cur = t
      i += 1
    }
    prev(n).toLong
  }

  /** Tokenizing form: (cand_len, ref_len, lcs) as one struct row. */
  def tokenLcs(cand: UTF8String, ref: UTF8String): InternalRow = {
    val dict = new java.util.HashMap[String, Integer](64)
    val a = ids(cand, dict)
    val b = ids(ref, dict)
    new GenericInternalRow(
      Array[Any](a.length.toLong, b.length.toLong, lcsLen(a, b)))
  }
}

/**
 * Native Catalyst expression `graft_lcs(cand, ref)` →
 * struct<cand_len:bigint, ref_len:bigint, lcs:bigint>: per-pair
 * token-level LCS with lowercase-\s+ tokenization inside the kernel.
 * The eighth compiled kernel (after dot/ratio/jaro/deflate/del-hashes/
 * clip-counts/argmin-centroid); pairs are eval-design-scale and the
 * sequence pair never leaves its row, so the only cross-row traffic
 * downstream is one narrow 3-long struct per pair.
 */
case class LcsLength(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_lcs requires two strings, got ${left.dataType} / " +
        s"${right.dataType}")

  override def dataType: DataType = StructType(Seq(
    StructField("cand_len", LongType, nullable = false),
    StructField("ref_len", LongType, nullable = false),
    StructField("lcs", LongType, nullable = false)))

  override def prettyName: String = "graft_lcs"

  override def nullSafeEval(a: Any, b: Any): Any =
    LcsKernel.tokenLcs(a.asInstanceOf[UTF8String],
      b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.LcsKernel.tokenLcs($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): LcsLength =
    copy(left = newLeft, right = newRight)
}
