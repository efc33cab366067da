package graft.functions.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Canonical text normalization in one pass: lowercase, collapse every run
  * of non-[a-z0-9] characters to a single space, trim — byte-identical to
  * the composed form
  * `trim(regexp_replace(regexp_replace(lower(text), "[^a-z0-9]+", " "), " +", " "))`
  * without the two regexp scans and their intermediate string allocations.
  * This is the hot prefix of every fingerprint/shingle path
  * (`TextFunctions.fingerprint` feeds md5; `charShingles` slides over it),
  * and the same loop [[ShingleHashesExpr]] already inlines.
  */
case class NormalizedTextExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    InputCheck.string("normalized_text", child)

  override protected def nullSafeEval(input: Any): Any =
    NormalizedTextExpr.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.expressions.NormalizedTextExpr.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "normalized_text"
}

object NormalizedTextExpr {

  /** Static single pass; called directly from generated code. Lowercases
    * the whole string first with full-string String.toLowerCase
    * (per-code-point Character.toLowerCase diverges on one-to-many
    * mappings like U+0130), pinned to Locale.ROOT: the default-locale
    * overload maps ASCII 'I' → dotless 'ı' on a tr-TR executor, making
    * fingerprints/dedup depend on JVM locale — nondeterministic across a
    * mixed-locale fleet. ROOT matches Spark lower()'s ASCII fast path
    * everywhere; the [a-z0-9] filter below absorbs residual non-ASCII
    * mapping differences.
    */
  def compute(input: UTF8String): UTF8String = {
    val s = input.toString.toLowerCase(java.util.Locale.ROOT)
    val sb = new java.lang.StringBuilder(s.length)
    var pendingSpace = false
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if ((c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')) {
        if (pendingSpace && sb.length > 0) sb.append(' ')
        pendingSpace = false
        sb.append(c)
      } else {
        pendingSpace = true
      }
      i += 1
    }
    UTF8String.fromString(sb.toString)
  }
}
