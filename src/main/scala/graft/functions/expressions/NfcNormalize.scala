package graft.functions.expressions

import java.text.Normalizer

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization — the canonicalization step a multilingual
  * corpus needs BEFORE hashing/dedup/tokenization: "é" as one precomposed
  * code point and "e"+U+0301 are byte-different (different fingerprints,
  * different tokens) but the same text; NFC composes them to one canonical
  * form. Map-side, one pass per row; the JDK's `java.text.Normalizer` and
  * DuckDB's `nfc_normalize` (utf8proc) both implement UAX #15, so the
  * oracle replays this bit-for-bit across engines. Fast path: NFC quick
  * check (`Normalizer.isNormalized`) skips the rebuild for the ASCII/
  * already-composed majority of a real corpus.
  */
case class NfcNormalizeExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    InputCheck.string("nfc_normalize", child)

  override protected def nullSafeEval(input: Any): Any =
    NfcNormalizeExpr.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.expressions.NfcNormalizeExpr.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "nfc_normalize"
}

object NfcNormalizeExpr {

  /** Static so generated code calls it directly. */
  def compute(input: UTF8String): UTF8String = {
    val s = input.toString
    if (Normalizer.isNormalized(s, Normalizer.Form.NFC)) input
    else UTF8String.fromString(Normalizer.normalize(s, Normalizer.Form.NFC))
  }
}
