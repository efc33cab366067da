package graft.functions.expressions

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Gopher-style repetition quality signals in one pass per document
  * (Rae et al. 2021, "Scaling Language Models: ... Gopher", appendix A1.1 —
  * public paper; these are the standard repetitive-document filters of
  * large-scale corpus curation, also used by RefinedWeb / Dolma).
  *
  * Everything is per-row and map-side: no shuffle, no explode — at 100 TB
  * the signals cost one text scan per document, the same posture as
  * [[TextStatsExpr]].
  *
  * Definitions (chosen to be exactly replicable as a DuckDB oracle over
  * list functions — fractions, not filters, so callers pick thresholds):
  *
  *   - `words` = `\s+`-split tokens with empty tokens dropped;
  *     `norm_len` = length of the single-space re-join (the denominator
  *     for all n-gram fractions).
  *   - `dup_word_frac` = (word_cnt − distinct words) / word_cnt.
  *   - `top{2,3,4}_frac` = max over word n-grams g **with count(g) ≥ 2**
  *     of count(g)·len(g), divided by norm_len: the character share of
  *     the single most repeated n-gram (every occurrence counted; ties
  *     resolve identically on both sides because the max is over the
  *     product, not over grams). Singleton grams are excluded — a gram
  *     that occurs once is not repetition, and counting it would gate
  *     every document shorter than ~1/cap grams (a single-occurrence
  *     4-gram in a 25-word doc already exceeds a 0.16 cap). 0.0 when no
  *     n-gram repeats.
  *   - `dup5_frac` = Σ over 5-grams with count>1 of count·len(g) /
  *     norm_len. Overlapping occurrences are all counted (documented
  *     simplification vs Gopher's non-double-counting variant, which is
  *     order-dependent and not expressible as a plain aggregate); the
  *     value can exceed 1 for highly repetitive text — thresholds are
  *     calibrated against this definition.
  *   - `lines` = `\n`-split segments, empties kept (DuckDB
  *     `string_split(text, chr(10))` semantics); `dup_line_frac` =
  *     (line_cnt − distinct lines) / line_cnt; `dup_line_char_frac` =
  *     chars in lines occurring more than once / total line chars.
  *
  * Character counts are UTF-16 units (= code points = bytes on the ASCII
  * corpora these thresholds are tuned for; same caveat as TextStatsExpr).
  */
case class RepetitionStatsExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = RepetitionStatsExpr.schema

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    InputCheck.string("repetition_stats", child)

  override protected def nullSafeEval(input: Any): Any =
    RepetitionStatsExpr.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.expressions.RepetitionStatsExpr.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "repetition_stats"
}

/** Fused Gopher-gate predicate: ONE [[RepetitionStatsExpr.compute]] pass
  * and the six threshold compares in a single boolean expression.
  *
  * Exists because a filter on the stats STRUCT multi-evaluates the kernel:
  * predicate pushdown substitutes the struct alias into every conjunct, so
  * `filter(st.top2 <= a && st.top3 <= b && ...)` plans SIX independent
  * `repetition_stats(text)` calls (filter codegen has no cross-conjunct
  * subexpression elimination) — measured 2.3 s vs 0.6 s at sf0.1 on the
  * same scan. Callers gate with this, then project the struct for the
  * (few) survivors.
  */
case class RepetitionGateExpr(child: Expression,
    maxDupLineFrac: Double, maxDupLineCharFrac: Double,
    maxTop2Frac: Double, maxTop3Frac: Double, maxTop4Frac: Double,
    maxDup5Frac: Double) extends UnaryExpression {

  override def dataType: DataType = BooleanType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    InputCheck.string("repetition_gate", child)

  override protected def nullSafeEval(input: Any): Any =
    RepetitionStatsExpr.gate(input.asInstanceOf[UTF8String], maxDupLineFrac,
      maxDupLineCharFrac, maxTop2Frac, maxTop3Frac, maxTop4Frac, maxDup5Frac)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = graft.functions.expressions.RepetitionStatsExpr.gate(
         |  $c, $maxDupLineFrac, $maxDupLineCharFrac, $maxTop2Frac,
         |  $maxTop3Frac, $maxTop4Frac, $maxDup5Frac);""".stripMargin)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "repetition_gate"
}

object RepetitionStatsExpr {

  val schema: StructType = StructType(Seq(
    StructField("word_cnt", IntegerType, nullable = false),
    StructField("dup_word_frac", DoubleType, nullable = false),
    StructField("top2_frac", DoubleType, nullable = false),
    StructField("top3_frac", DoubleType, nullable = false),
    StructField("top4_frac", DoubleType, nullable = false),
    StructField("dup5_frac", DoubleType, nullable = false),
    StructField("line_cnt", IntegerType, nullable = false),
    StructField("dup_line_frac", DoubleType, nullable = false),
    StructField("dup_line_char_frac", DoubleType, nullable = false)))

  /** max over REPEATED n-grams (count ≥ 2) of count·charLen, and Σ over
    * repeated n-grams of count·charLen, for word n-grams joined by single
    * spaces. Gram identity via a rolling join is exact (words are
    * compared by content); charLen = Σ word lens + (n−1). */
  private def ngramStats(words: Array[String], n: Int): (Long, Long) = {
    val m = words.length - n + 1
    if (m <= 0) return (0L, 0L)
    val counts = new mutable.HashMap[String, (Int, Int)]() // gram -> (count, charLen)
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i < m) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(words(i + j))
        j += 1
      }
      val g = sb.toString
      counts.get(g) match {
        case Some((c, l)) => counts.update(g, (c + 1, l))
        case None         => counts.update(g, (1, g.length))
      }
      i += 1
    }
    var top = 0L
    var dup = 0L
    counts.valuesIterator.foreach { case (c, l) =>
      if (c > 1) {
        val covered = c.toLong * l
        if (covered > top) top = covered
        dup += covered
      }
    }
    (top, dup)
  }

  /** Static single pass; called directly from generated code. */
  def compute(input: UTF8String): InternalRow = {
    val s = input.toString

    // words: split on the pinned class [ \t\n\f\r]+ (RE2 \s — what DuckDB
    // string_split_regex uses; Java \s would also swallow VT 0x0B),
    // empties dropped — avoids trim-semantics differences entirely
    val words = s.split("[ \\t\\n\\f\\r]+").filter(_.nonEmpty)
    val wordCnt = words.length
    var wordChars = 0L
    val distinctWords = new mutable.HashSet[String]()
    words.foreach { w => wordChars += w.length; distinctWords += w }
    val normLen = wordChars + math.max(0, wordCnt - 1)

    val dupWordFrac =
      if (wordCnt == 0) 0.0 else (wordCnt - distinctWords.size).toDouble / wordCnt

    def frac(v: Long): Double = if (normLen == 0) 0.0 else v.toDouble / normLen
    val (top2, _) = ngramStats(words, 2)
    val (top3, _) = ngramStats(words, 3)
    val (top4, _) = ngramStats(words, 4)
    val (_, dup5) = ngramStats(words, 5)

    // lines: every \n is a separator, empty segments kept (limit -1)
    val lines = s.split("\n", -1)
    val lineCnt = lines.length
    val lineCounts = new mutable.HashMap[String, Int]()
    var lineChars = 0L
    lines.foreach { l =>
      lineChars += l.length
      lineCounts.update(l, lineCounts.getOrElse(l, 0) + 1)
    }
    val dupLineFrac =
      if (lineCnt == 0) 0.0 else (lineCnt - lineCounts.size).toDouble / lineCnt
    var dupLineChars = 0L
    lineCounts.foreach { case (l, c) => if (c > 1) dupLineChars += c.toLong * l.length }
    val dupLineCharFrac = if (lineChars == 0) 0.0 else dupLineChars.toDouble / lineChars

    new GenericInternalRow(Array[Any](
      wordCnt, dupWordFrac, frac(top2), frac(top3), frac(top4), frac(dup5),
      lineCnt, dupLineFrac, dupLineCharFrac))
  }

  /** One stats pass + threshold compares — called from
    * [[RepetitionGateExpr]] generated code. Field indices follow
    * [[schema]].
    */
  def gate(input: UTF8String,
           maxDupLineFrac: Double, maxDupLineCharFrac: Double,
           maxTop2Frac: Double, maxTop3Frac: Double, maxTop4Frac: Double,
           maxDup5Frac: Double): Boolean = {
    val r = compute(input)
    r.getDouble(7) <= maxDupLineFrac &&
      r.getDouble(8) <= maxDupLineCharFrac &&
      r.getDouble(2) <= maxTop2Frac &&
      r.getDouble(3) <= maxTop3Frac &&
      r.getDouble(4) <= maxTop4Frac &&
      r.getDouble(5) <= maxDup5Frac
  }
}
