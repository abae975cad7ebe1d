package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Static JVM kernel behind `graft_clip_counts`: per-pair clipped n-gram
 * overlap counts for every n in [nFrom, nTo] — the shared core of
 * ROUGE-n / corpus BLEU / chrF (clip = Σ_g min(c_cand(g), c_ref(g)), the
 * published clipped-precision numerator). Grams are counted through an
 * interning dictionary + integer-window multiset, so NO gram string is
 * ever materialized: tokens (or UTF-16 units for the character form)
 * intern to ints once, and each n-level counts windows over the two int
 * arrays. Work is O((nTo−nFrom+1)·(|cand|+|ref|)) with allocation
 * bounded by the dictionaries and the fixed-size output.
 */
object ClipCountsKernel {

  /** A length-`n` window view into an int array, usable as an exact
   * HashMap key (elementwise equals, polynomial hash). Probe instances
   * mutate in place for lookups; stored keys are frozen views into the
   * stable candidate array. */
  private final class Win(var a: Array[Int], var off: Int, var n: Int) {
    override def hashCode(): Int = {
      var h = 1
      var i = off
      val end = off + n
      while (i < end) { h = h * 31 + a(i); i += 1 }
      h
    }
    override def equals(o: Any): Boolean = o match {
      case w: Win =>
        if (w.n != n) false
        else {
          var i = 0
          while (i < n && a(off + i) == w.a(w.off + i)) i += 1
          i == n
        }
      case _ => false
    }
  }

  /** One n-level: count candidate windows into a multiset, then stream
   * the reference windows consuming matches. Returns (cc, rc, clip). */
  private def level(c: Array[Int], r: Array[Int], n: Int): (Long, Long, Long) = {
    val cc = math.max(0, c.length - n + 1).toLong
    val rc = math.max(0, r.length - n + 1).toLong
    if (cc == 0L || rc == 0L) return (cc, rc, 0L)
    val m = new java.util.HashMap[Win, Long](
      math.min(1L << 20, cc * 2).toInt)
    var i = 0
    while (i <= c.length - n) {
      m.merge(new Win(c, i, n), 1L, (x, y) => x + y)
      i += 1
    }
    var clip = 0L
    val probe = new Win(r, 0, n)
    i = 0
    while (i <= r.length - n) {
      probe.off = i
      val rem = m.getOrDefault(probe, 0L)
      // present key keeps its ORIGINAL (frozen) key object on put, so
      // passing the mutable probe never stores it
      if (rem > 0L) { m.put(probe, rem - 1L); clip += 1L }
      i += 1
    }
    (cc, rc, clip)
  }

  private def emit(c: Array[Int], r: Array[Int], nFrom: Int,
      nTo: Int): ArrayData = {
    val out = new Array[Any](nTo - nFrom + 1)
    var n = nFrom
    while (n <= nTo) {
      val (cc, rc, clip) = level(c, r, n)
      out(n - nFrom) =
        new GenericInternalRow(Array[Any](n, cc, rc, clip)): InternalRow
      n += 1
    }
    new GenericArrayData(out)
  }

  /** Word form: token arrays → token-id arrays through one shared
   * interning dictionary (token equality IS gram-element equality). */
  def counts(cand: ArrayData, ref: ArrayData, nFrom: Int,
      nTo: Int): ArrayData = {
    val dict = new java.util.HashMap[UTF8String, Integer](
      (cand.numElements() + ref.numElements()) * 2 + 4)
    def ids(a: ArrayData): Array[Int] = {
      val n = a.numElements()
      val out = new Array[Int](n)
      var i = 0
      while (i < n) {
        val t = a.getUTF8String(i)
        var id = dict.get(t)
        if (id == null) { id = dict.size(); dict.put(t, id) }
        out(i) = id
        i += 1
      }
      out
    }
    emit(ids(cand), ids(ref), nFrom, nTo)
  }

  /** Character form (the chrF kernel): UTF-16 units are the gram
   * elements, matching String.substring semantics. */
  def charCounts(cand: UTF8String, ref: UTF8String, nFrom: Int,
      nTo: Int): ArrayData = {
    def units(s: UTF8String): Array[Int] = {
      val str = s.toString
      val out = new Array[Int](str.length)
      var i = 0
      while (i < str.length) { out(i) = str.charAt(i); i += 1 }
      out
    }
    emit(units(cand), units(ref), nFrom, nTo)
  }

  // the Java-regex \s class (split(lower(c), "\\s+") semantics)
  private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' ||
      c == '\r'

  /** Tokenizing word form: lowercase + split on \s+ runs + drop empties
   * INSIDE the kernel — arithmetic-identical to feeding
   * `filter(split(lower(c), "\\s+"), w -> w != '')` to [[counts]], but
   * higher-order functions never support whole-stage codegen, so an
   * HOF tokenizer in the plan demotes the kernel's whole Project to
   * interpreted eval. This form keeps the entire score row-kernel
   * codegen'd. */
  def tokenCounts(cand: UTF8String, ref: UTF8String, nFrom: Int,
      nTo: Int): ArrayData = {
    val dict = new java.util.HashMap[String, Integer](64)
    def ids(u: UTF8String): Array[Int] = {
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
    emit(ids(cand), ids(ref), nFrom, nTo)
  }
}

/**
 * Native Catalyst expression
 * `graft_clip_counts(cand, ref, nFrom, nTo)` →
 * array<struct<n:int, cc:bigint, rc:bigint, clip:bigint>>: per-pair
 * clipped n-gram counts for every n-level at once. Accepts either two
 * array<string> token arrays (word grams — ROUGE/BLEU), two strings
 * (character grams — chrF), or two strings with a 5th literal 'tokens'
 * argument (lowercase-whitespace tokenization INSIDE the kernel — the
 * hot form: an HOF tokenizer in the plan would demote the hosting
 * Project out of whole-stage codegen); nFrom/nTo are literal ints.
 * The sixth
 * compiled kernel (after dot/ratio/jaro/deflate/del-hashes), replacing
 * the last hot Scala-UDF pair in the text-eval path: the UDF form paid
 * Row↔JVM conversion of the token Seqs and the result per pair, outside
 * whole-stage codegen. Clipping is a WITHIN-pair quantity, so this keeps
 * the invariant that gram multisets never shuffle — the only cross-row
 * traffic downstream is the (nTo−nFrom+1)-row narrow count frame.
 */
case class ClipCounts(left: Expression, right: Expression, nFrom: Int,
    nTo: Int, tokenize: Boolean = false) extends BinaryExpression {

  private def isWordForm(dt: DataType): Boolean = dt match {
    case ArrayType(StringType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (nFrom < 1 || nTo < nFrom || nTo > 16)
      TypeCheckResult.TypeCheckFailure(
        s"graft_clip_counts requires 1 <= nFrom <= nTo <= 16: [$nFrom, $nTo]")
    else if (tokenize && left.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        "graft_clip_counts 'tokens' mode requires string inputs, got " +
          s"${left.dataType}")
    else if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else if (isWordForm(left.dataType) && isWordForm(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "graft_clip_counts requires two strings (char grams) or two " +
        s"array<string> (word grams), got ${left.dataType} / ${right.dataType}")

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("n", IntegerType, nullable = false),
    StructField("cc", LongType, nullable = false),
    StructField("rc", LongType, nullable = false),
    StructField("clip", LongType, nullable = false))), containsNull = false)

  override def prettyName: String = "graft_clip_counts"

  private def kernelMethod: String =
    if (left.dataType != StringType) "counts"
    else if (tokenize) "tokenCounts"
    else "charCounts"

  override def nullSafeEval(a: Any, b: Any): Any =
    if (left.dataType != StringType)
      ClipCountsKernel.counts(a.asInstanceOf[ArrayData],
        b.asInstanceOf[ArrayData], nFrom, nTo)
    else if (tokenize)
      ClipCountsKernel.tokenCounts(a.asInstanceOf[UTF8String],
        b.asInstanceOf[UTF8String], nFrom, nTo)
    else
      ClipCountsKernel.charCounts(a.asInstanceOf[UTF8String],
        b.asInstanceOf[UTF8String], nFrom, nTo)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.ClipCountsKernel.$kernelMethod($a, $b, $nFrom, $nTo)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ClipCounts =
    copy(left = newLeft, right = newRight)
}
