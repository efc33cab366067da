package graft.functions.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Stopword-lexicon language ID in ONE pass over the document: tokenize
  * into maximal word-character runs and count exact lexicon hits per
  * language simultaneously; answer is the language with most hits (ties
  * alphabetical), "und" when nothing hits.
  *
  * Identical values to the composed form
  * (`regexp_count(lower(text), "\\b(w1|w2|...)\\b")` per language, argmax
  * via array_max of (hits, lang) structs): a `\b`-delimited alternation
  * of pure-alphabetic words matches exactly the maximal word-char runs
  * ([A-Za-z0-9_]) that equal a lexicon word, and each run can match at
  * most once — so run-tokenizing and set-matching is the same count
  * without running |languages| regex scans over the text.
  *
  * The lexicons ship in [[LangIdExpr.lexicons]] (shared with
  * `TextFunctions.stopwordHits` so the two forms can never drift).
  */
case class LangIdExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    InputCheck.string("lang_id", child)

  override protected def nullSafeEval(input: Any): Any =
    LangIdExpr.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.expressions.LangIdExpr.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "lang_id"
}

object LangIdExpr {

  /** Language → stopword lexicon, alphabetical by language code (the tie
    * order). The single authoritative copy — `TextFunctions.stopwords`
    * reads from here.
    */
  val lexicons: Seq[(String, Set[String])] = Seq(
    "de" -> Set("der", "die", "und", "das", "ist", "mit", "von", "nicht"),
    "en" -> Set("the", "and", "of", "to", "is", "in", "that", "with"),
    "es" -> Set("el", "los", "las", "de", "que", "es", "con", "para"),
    "fr" -> Set("le", "la", "et", "les", "des", "est", "dans", "pour"))

  private val und = UTF8String.fromString("und")
  private val langNames = lexicons.map { case (l, _) => UTF8String.fromString(l) }

  // one flat word → language-bitmask map ('de' and 'es' share "de"? no —
  // lexicons may overlap across languages ("de" appears in es? "de" is in
  // the es lexicon; "des" in fr; "das" de) so each word maps to the set of
  // languages containing it, as a bitmask
  private val wordMask: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer]()
    lexicons.zipWithIndex.foreach { case ((_, words), i) =>
      words.foreach { w =>
        val prev = m.get(w)
        m.put(w, Integer.valueOf((if (prev == null) 0 else prev.intValue()) | (1 << i)))
      }
    }
    m
  }

  private def isWordChar(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') || (c >= '0' && c <= '9') || c == '_'

  /** Static single pass; called directly from generated code. */
  def compute(input: UTF8String): UTF8String = {
    val s = input.toString
    val len = s.length
    val hits = new Array[Int](lexicons.length)
    var i = 0
    while (i < len) {
      if (isWordChar(s.charAt(i))) {
        val start = i
        while (i < len && isWordChar(s.charAt(i))) i += 1
        // lexicon words are <= 8 chars; skip longer runs without allocating
        if (i - start <= 8) {
          // Locale.ROOT: default-locale lowercasing turns 'I' into dotless
          // 'ı' on a tr-TR executor and every stopword containing 'i'
          // ("is", "in", "with") stops matching — langId flips to "und"
          // and the requireKnownLang gate silently drops the documents
          val w = s.substring(start, i).toLowerCase(java.util.Locale.ROOT)
          val found = wordMask.get(w)
          val mask = if (found == null) 0 else found.intValue()
          if (mask != 0) {
            var b = 0
            while (b < hits.length) {
              if ((mask & (1 << b)) != 0) hits(b) += 1
              b += 1
            }
          }
        }
      } else i += 1
    }
    // argmax with alphabetical tie-break = first max in lexicon order...
    // the composed array_max over struct(hits, lang) picks the LAST lang
    // alphabetically among equal hit counts? No: array_max picks the
    // maximum struct by (hits, lang) lexicographic order — highest hits,
    // then highest lang string. Replicate exactly: max hits, ties -> the
    // alphabetically GREATEST language code.
    var best = 0
    var b = 1
    while (b < hits.length) {
      if (hits(b) >= hits(best)) best = b // later index = greater lang code
      b += 1
    }
    if (hits(best) == 0) und else langNames(best)
  }
}
