package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact-substring duplication analysis (Lee et al. 2021, "Deduplicating
  * Training Data Makes Language Models Better", arXiv:2107.06499 — public
  * paper): find every k-token span whose text occurs elsewhere in the
  * corpus (including self-repeats), and measure, per document, how much
  * of it is covered by such spans. The paper's ExactSubstr tool splices
  * the duplicated bytes out via a corpus-wide suffix array; the
  * splice-free variant here — score the duplicated-span COVERAGE and drop
  * documents above a threshold — is the form practitioners use when
  * mid-document splicing is too destructive, and it distributes: span
  * hashes are the corpus-wide state, not a suffix array.
  *
  * Scale shape: one map-side pass emits (id, pos, 8-byte span hash) via
  * the fused [[expressions.Md5WordNgramHashesExpr]] kernel; one exchange
  * on the hash serves both the occurrence statistics (partial-aggregated
  * counts + first-occurrence key) and the instance join-back (stats are
  * one row per hash, so the join returns instance rows — no pair
  * blowup, unlike similarity joins this needs no document-frequency
  * cap); the interval-union window runs per document over DUPLICATED
  * instances only. All-integer coverage math, so a SQL engine replays
  * the funnel exactly.
  */
object SpanDedup {

  import org.apache.spark.sql.graft.{ColumnBridge => ExpressionUtils}

  /** (idCol, `pos`, `span_hash`) for every k-token span: md5Hash60 of the
    * space-joined words (RE2 `\s` split, empties dropped), `pos` = 1-based
    * index of the span's first word. Documents with fewer than k words
    * emit nothing.
    */
  def spanInstances(df: DataFrame, idCol: String, text: Column, k: Int): DataFrame = {
    require(k >= 2, "a span needs at least two tokens")
    df.select(col(idCol),
        posexplode(ExpressionUtils.column(expressions.Md5WordNgramHashesExpr(
          ExpressionUtils.expression(text), k))).as(Seq("__p0", "span_hash")))
      .select(col(idCol), (col("__p0") + 1).cast("long").as("pos"), col("span_hash"))
  }

  /** Span instances whose text occurs more than once corpus-wide, minus
    * each span text's FIRST occurrence (ordered by id then position —
    * the occurrence the paper's tool would keep).
    */
  def duplicatedInstances(df: DataFrame, idCol: String, text: Column,
                          k: Int): DataFrame = {
    val inst = spanInstances(df, idCol, text, k)
    val stats = inst.groupBy(col("span_hash")).agg(
      count(lit(1)).as("__c"),
      min(struct(col(idCol), col("pos"))).as("__first"))
    inst.join(stats.filter(col("__c") > 1), "span_hash")
      .filter(!(col(s"__first.$idCol") === col(idCol) &&
        col("__first.pos") === col("pos")))
      .select(col(idCol), col("pos"))
  }

  /** Per-document duplicated-span coverage: `n_tokens` (word count),
    * `dup_tokens` (union length of the duplicated [pos, pos+k) intervals
    * — overlaps counted once, all-integer window math), and `dup_frac`
    * (rounded to 4 dp; 0 for empty documents). Every input document gets
    * a row.
    */
  def coverageStats(df: DataFrame, idCol: String, text: Column,
                    k: Int): DataFrame = {
    val dups = duplicatedInstances(df, idCol, text, k)
    val w = Window.partitionBy(col(idCol)).orderBy(col("pos"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val prevEnd = max(col("pos") + k).over(w)
    val add = greatest(lit(0L),
      col("pos") + k - greatest(coalesce(prevEnd, col("pos")), col("pos")))
    val perDoc = dups.withColumn("__add", add)
      .groupBy(col(idCol)).agg(sum(col("__add")).as("__dup"))
    df.select(col(idCol),
        coalesce(size(ExpressionUtils.column(expressions.Md5WordNgramHashesExpr(
          ExpressionUtils.expression(text), 1))), lit(0))
          .cast("long").as("n_tokens"))
      .join(perDoc, Seq(idCol), "left")
      .select(col(idCol), col("n_tokens"),
        coalesce(col("__dup"), lit(0L)).as("dup_tokens"),
        round(when(col("n_tokens") === 0, lit(0.0))
          .otherwise(coalesce(col("__dup"), lit(0L)).cast("double") / col("n_tokens")),
          4).as("dup_frac"))
  }

  /** The paper's actual edit: remove every duplicated span occurrence
    * except the corpus-wide first, word-aligned — returns (idCol,
    * `text_clean`) for every document, whitespace canonicalized to
    * single spaces. Covered word indices come from the duplicated
    * instances ([pos, pos+k) exploded and distinct-ed — ×k keys-only
    * rows, still bounded by corpus token count); each document's covered
    * set joins back as ONE array row, so the reconstruction is a
    * map-side indexed filter over the word array — the corpus text is
    * never shuffled. `array_contains` is linear in the covered set
    * (bounded by the document's own length); for pathological
    * million-word documents pre-chunk upstream.
    */
  def spliceDuplicates(df: DataFrame, idCol: String, text: Column,
                       k: Int): DataFrame = {
    val covered = duplicatedInstances(df, idCol, text, k)
      .select(col(idCol), explode(sequence(col("pos"), col("pos") + (k - 1))).as("__i"))
      .distinct()
      .groupBy(col(idCol)).agg(collect_set(col("__i")).as("__cov"))
    // the pinned whitespace class (RE2 \s — no \x0B), matching
    // Md5WordNgramHashesExpr's tokenizer so word indices line up: Java \s+
    // would split on vertical tab and misalign every covered position after
    val words = filter(split(text, "[ \\t\\n\\f\\r]+"), w => w =!= "")
    df.select(col(idCol), words.as("__w"))
      .join(covered, Seq(idCol), "left")
      .select(col(idCol),
        array_join(
          zip_with(col("__w"), sequence(lit(1), greatest(size(col("__w")), lit(1))),
            (w, i) => when(col("__cov").isNull || !array_contains(col("__cov"), i.cast("long")), w)),
          " ").as("text_clean"))
  }

  /** Drop documents whose duplicated-span coverage is at or above
    * `maxFrac` — the document-level gate built on [[coverageStats]].
    */
  def dropHighOverlap(df: DataFrame, idCol: String, text: Column, k: Int,
                      maxFrac: Double): DataFrame = {
    val bad = coverageStats(df, idCol, text, k)
      .filter(col("dup_frac") >= maxFrac).select(col(idCol))
    df.join(bad, Seq(idCol), "left_anti")
  }
}
