package graft.functions.expressions

import java.nio.ByteBuffer
import java.nio.charset.{CharacterCodingException, CodingErrorAction, StandardCharsets}

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Undo the classic mojibake a web crawl is full of: UTF-8 bytes that were
  * mis-read as Latin-1 somewhere upstream and re-encoded, turning "é" into
  * "Ã©" ("ftfy"-style repair, single most common case). The fix is the
  * inverse transform — re-encode the chars as Latin-1 and STRICT-decode the
  * bytes as UTF-8 — applied only when it provably applies:
  *
  *   - any char above U+00FF → not Latin-1-encodable → text untouched;
  *   - strict UTF-8 decode fails → the bytes were genuine Latin-1 text
  *     ("café" stays "café"), not mojibake → untouched;
  *   - pure ASCII round-trips to itself → untouched by construction.
  *
  * Double-encoded text repairs iteratively (bounded at 3 rounds). The
  * transform can't be replayed by SQL string functions (byte-level charset
  * round-trip), so the contract is spec-pinned — same carve-out as the
  * compression ratio.
  */
case class FixMojibakeExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    InputCheck.string("fix_mojibake", child)

  override protected def nullSafeEval(input: Any): Any =
    FixMojibakeExpr.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.expressions.FixMojibakeExpr.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "fix_mojibake"
}

object FixMojibakeExpr {

  /** One repair round; null when the transform doesn't apply. */
  private def fixOnce(s: String): String = {
    var hasHigh = false
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c > 0xFF) return null // not Latin-1-encodable
      if (c > 0x7F) hasHigh = true
      i += 1
    }
    if (!hasHigh) return null // pure ASCII: nothing to repair
    val bytes = new Array[Byte](s.length)
    i = 0
    while (i < s.length) { bytes(i) = s.charAt(i).toByte; i += 1 }
    val decoder = StandardCharsets.UTF_8.newDecoder()
      .onMalformedInput(CodingErrorAction.REPORT)
      .onUnmappableCharacter(CodingErrorAction.REPORT)
    try {
      val out = decoder.decode(ByteBuffer.wrap(bytes)).toString
      if (out == s) null else out
    } catch {
      case _: CharacterCodingException => null // genuine Latin-1, keep as-is
    }
  }

  /** Static so generated code calls it directly. */
  def compute(input: UTF8String): UTF8String = {
    var s = input.toString
    var rounds = 0
    var changed = false
    while (rounds < 3) {
      val next = fixOnce(s)
      if (next == null) {
        return if (changed) UTF8String.fromString(s) else input
      }
      s = next
      changed = true
      rounds += 1
    }
    UTF8String.fromString(s)
  }
}
