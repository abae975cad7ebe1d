package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Deflate-length kernel for the compressibility quality signal
 * (Gopher/RefinedWeb lineage): machine-generated boilerplate and
 * template spam compress FAR better than natural prose, so
 * deflated/raw ratio is a cheap, language-agnostic repetition filter
 * that catches what n-gram rules miss (long-range template structure).
 * Raw DEFLATE (nowrap, level 6) over the UTF-8 bytes; a fresh Deflater
 * per call — the kernel must be thread-safe under codegen, and
 * per-row allocation is dwarfed by the compression itself.
 *
 * Honesty note: the byte count is deterministic for a given JVM's
 * Deflater, but zlib implementations differ slightly across runtimes —
 * the SIGNAL (ratio ordering, thresholding) is stable, the exact
 * length is not an engine-portable contract. That is why the gate is
 * rows-only: no SQL engine replays JDK deflate, and faking a portable
 * oracle would gate nothing.
 */
object DeflateKernel {
  def len(s: UTF8String): Int = {
    val bytes = s.getBytes
    val d = new java.util.zip.Deflater(6, true)
    try {
      d.setInput(bytes)
      d.finish()
      val buf = new Array[Byte](8192)
      var total = 0
      while (!d.finished()) total += d.deflate(buf)
      total
    } finally d.end()
  }
}

/**
 * Native Catalyst expression `graft_deflate_len(s)` → int: the
 * deflated byte length of a string's UTF-8 encoding. Static JVM kernel
 * called from generated code (the graft_jaro shape) — rows stay inside
 * whole-stage codegen, no UDF boxing.
 */
case class DeflateLength(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_deflate_len requires a string input, got ${child.dataType}")

  override def dataType: DataType = IntegerType

  override def prettyName: String = "graft_deflate_len"

  override def nullSafeEval(s: Any): Any =
    DeflateKernel.len(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s => s"graft.functions.DeflateKernel.len($s)")

  override protected def withNewChildInternal(
      newChild: Expression): DeflateLength = copy(child = newChild)
}
