package graft.functions.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** All scalar text statistics in ONE pass over the document: a struct of
  * counts from which every ratio/score derives arithmetically.
  *
  * The composed form ([[graft.functions.TextFunctions]]) runs 5+ separate
  * regexp scans per document (token split, BPE count, punct count, digit
  * count, whitespace strip) — at a 100 TB corpus that is 5× the text
  * bandwidth for values one walk can produce. Semantics replicate the
  * regex definitions exactly, quirks included:
  *
  *   - `n_tokens` = `size(split(trim(text), "[ \\t\\n\\f\\r]+"))` with
  *     Spark's default split limit -1 and space-only trim: (whitespace
  *     runs in the space-trimmed text) + 1, 0 for empty —
  *     leading/trailing tab/newline runs therefore contribute empty
  *     tokens, exactly like the built-in pipeline.
  *   - `n_bpe` = non-overlapping matches of
  *     `[A-Za-z]+|[0-9]|[^A-Za-z0-9 \t\n\f\r]`: alphabetic runs count
  *     once, digits and other symbols per char.
  *   - `n_punct` / `n_digit` = chars matching `[^A-Za-z0-9 \t\n\f\r]` /
  *     `[0-9]`.
  *   - `n_nonws` = chars left after stripping `[ \t\n\f\r]+`.
  *   - `n_chars` = `length(text)` (code points).
  *
  * Whitespace is the PINNED class `[ \t\n\f\r]` — RE2's `\s`, which a
  * DuckDB oracle replays exactly; Java `\s` additionally swallows VT
  * 0x0B, so the two engines disagree on VT-bearing text (the same pin as
  * the md5-family kernels and [[graft.functions.TextFunctions]]). Classes
  * are ASCII, so any non-ASCII code point counts as "other symbol" — same
  * as the regex.
  */
case class TextStatsExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = TextStatsExpr.schema

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    InputCheck.string("text_stats", child)

  override protected def nullSafeEval(input: Any): Any =
    TextStatsExpr.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.expressions.TextStatsExpr.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "text_stats"
}

/** Fused C4-style quality-gate predicate: ONE [[TextStatsExpr.compute]]
  * pass and the numeric band checks in a single boolean — the same
  * pushdown rationale as [[RepetitionGateExpr]]: a filter over the stats
  * struct multi-evaluates the kernel per conjunct.
  */
case class QualityGateExpr(child: Expression, minChars: Int, maxChars: Int,
    maxPunctRatio: Double, maxDigitRatio: Double,
    minMeanTokenLen: Double, maxMeanTokenLen: Double) extends UnaryExpression {

  override def dataType: DataType = BooleanType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    InputCheck.string("quality_gate", child)

  override protected def nullSafeEval(input: Any): Any =
    TextStatsExpr.qualityGate(input.asInstanceOf[UTF8String], minChars, maxChars,
      maxPunctRatio, maxDigitRatio, minMeanTokenLen, maxMeanTokenLen)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = graft.functions.expressions.TextStatsExpr.qualityGate(
         |  $c, $minChars, $maxChars, $maxPunctRatio, $maxDigitRatio,
         |  $minMeanTokenLen, $maxMeanTokenLen);""".stripMargin)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "quality_gate"
}

object TextStatsExpr {

  val schema: StructType = StructType(Seq(
    StructField("n_tokens", IntegerType, nullable = false),
    StructField("n_bpe", IntegerType, nullable = false),
    StructField("n_punct", IntegerType, nullable = false),
    StructField("n_digit", IntegerType, nullable = false),
    StructField("n_nonws", IntegerType, nullable = false),
    StructField("n_chars", IntegerType, nullable = false)))

  // the pinned RE2-safe whitespace class — NO 0x0B (see class scaladoc)
  private def isWs(cp: Int): Boolean =
    cp == ' ' || cp == '\t' || cp == '\n' || cp == '\f' || cp == '\r'
  private def isAlpha(cp: Int): Boolean =
    (cp >= 'a' && cp <= 'z') || (cp >= 'A' && cp <= 'Z')
  private def isDigit(cp: Int): Boolean = cp >= '0' && cp <= '9'

  /** Static single pass; called directly from generated code. */
  def compute(input: UTF8String): InternalRow = {
    val s = input.toString
    val len = s.length
    // space-only trim bounds (Spark's trim strips 0x20 only)
    var lo = 0
    while (lo < len && s.charAt(lo) == ' ') lo += 1
    var hi = len
    while (hi > lo && s.charAt(hi - 1) == ' ') hi -= 1

    var nChars = 0; var nNonWs = 0; var nPunct = 0; var nDigit = 0; var nBpe = 0
    var inAlphaRun = false
    var i = 0
    while (i < len) {
      val cp = s.codePointAt(i)
      nChars += 1
      val ws = isWs(cp)
      if (!ws) nNonWs += 1
      if (isAlpha(cp)) {
        if (!inAlphaRun) { nBpe += 1; inAlphaRun = true }
      } else {
        inAlphaRun = false
        if (isDigit(cp)) { nDigit += 1; nBpe += 1 }
        else if (!ws) { nPunct += 1; nBpe += 1 }
      }
      i += Character.charCount(cp)
    }

    // whitespace runs within the trimmed window; tokens = runs + 1 (Java
    // split with limit -1 keeps leading/trailing empty segments)
    var nRuns = 0
    var inWsRun = false
    var j = lo
    while (j < hi) {
      val c = s.charAt(j)
      val ws = isWs(c)
      if (ws && !inWsRun) { nRuns += 1; inWsRun = true }
      else if (!ws) inWsRun = false
      j += 1
    }
    val nTokens = if (hi == lo) 0 else nRuns + 1

    new GenericInternalRow(Array[Any](nTokens, nBpe, nPunct, nDigit, nNonWs, nChars))
  }

  /** One stats pass + band checks — called from [[QualityGateExpr]]
    * generated code. Ratio definitions mirror the composed Column form
    * exactly (0.0 on empty text / zero tokens).
    */
  def qualityGate(input: UTF8String, minChars: Int, maxChars: Int,
                  maxPunctRatio: Double, maxDigitRatio: Double,
                  minMeanTokenLen: Double, maxMeanTokenLen: Double): Boolean = {
    val r = compute(input)
    val nTokens = r.getInt(0)
    val nPunct = r.getInt(2)
    val nDigit = r.getInt(3)
    val nNonWs = r.getInt(4)
    val nChars = r.getInt(5)
    val punct = if (nChars == 0) 0.0 else nPunct.toDouble / nChars
    val digit = if (nChars == 0) 0.0 else nDigit.toDouble / nChars
    val meanTok = if (nTokens == 0) 0.0 else nNonWs.toDouble / nTokens
    nChars >= minChars && nChars <= maxChars &&
      punct < maxPunctRatio && digit < maxDigitRatio &&
      meanTok >= minMeanTokenLen && meanTok <= maxMeanTokenLen
  }
}
