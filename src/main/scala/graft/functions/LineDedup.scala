package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Line-level corpus preprocessing, two complementary rules:
  *
  *   - [[dedupLines]] — C4's exact rule: a line occurring ANYWHERE in the
  *     corpus survives only at its first (doc, position) occurrence;
  *     fully-deduplicated documents disappear.
  *   - [[stripBoilerplate]] — the CCNet / RefinedWeb rule: lines repeated
  *     across more than `maxDocFreq` documents (headers, footers, license
  *     blocks, navigation chrome) are dropped EVERYWHERE, unique prose
  *     stays, every document survives. Complements document-level dedup:
  *     a page can be unique overall yet 30% boilerplate, and that 30% is
  *     what this removes.
  *
  * Scale shape: the document-frequency aggregation and the anti-join run
  * on 8-byte md5Hash60 line keys (strings never shuffle there, and the
  * hot set above the cap is small by construction — AQE broadcasts it);
  * the only full-width shuffle is the per-document rebuild groupBy, which
  * carries exactly the output text once. Hash collisions are harmless for
  * oracle parity BECAUSE both engines count by the same md5-prefix key —
  * a collision merges the same two lines' counts on both sides.
  */
object LineDedup {

  /** Corpus-wide first-occurrence line dedup (the C4 preprocessing step).
    * The global rule is one groupBy on the 16-byte line fingerprint
    * carrying only (id, pos) — line text never shuffles for the dedup
    * decision; reassembly is one groupBy on the doc id collecting the
    * surviving (pos, line) pairs. A boilerplate line repeated across
    * millions of documents costs one aggregate row, not a join blow-up.
    */
  def dedupLines(df: DataFrame, idCol: String, textCol: String,
                 sep: String = "\n"): DataFrame = {
    val lines = FanOut(df).select(col(idCol).as("__id"),
      posexplode(split(col(textCol), java.util.regex.Pattern.quote(sep)))
        .as(Seq("__pos", "__line")))
    val keyed = lines.withColumn("__fp", md5(col("__line")))
    // first occurrence per fingerprint: min (id, pos) — keys-only shuffle
    val first = keyed.groupBy(col("__fp"))
      .agg(min(struct(col("__id"), col("__pos"))).as("__first"))
    val kept = keyed.join(first, Seq("__fp"))
      .filter(col("__id") === col("__first").getField("__id") &&
        col("__pos") === col("__first").getField("__pos"))
    kept.groupBy(col("__id"))
      .agg(concat_ws(sep,
        transform(array_sort(collect_list(struct(col("__pos"), col("__line")))),
          s => s.getField("__line"))).as(textCol))
      .withColumnRenamed("__id", idCol)
  }

  /** Every input row, with `text_clean` (the lines appearing in at most
    * `maxDocFreq` distinct documents, original order, '\n'-joined) and
    * `n_lines_removed`. A document whose every line is boilerplate keeps
    * an empty `text_clean`. Duplicate lines WITHIN one document count once
    * toward document frequency (it is a cross-document signal) but are
    * all kept or all removed together.
    */
  def stripBoilerplate(df: DataFrame, idCol: String, text: Column,
                       maxDocFreq: Long): DataFrame = {
    require(maxDocFreq >= 1, "a line must be allowed in at least one document")
    val lines = FanOut(df).select(col(idCol).as("__id"),
      posexplode(split(text, "\n", -1)).as(Seq("__pos", "__line")))
      .withColumn("__h", TextFunctions.md5Hash60(col("__line")))
    val hot = lines.select(col("__id"), col("__h")).distinct()
      .groupBy(col("__h")).agg(count(lit(1)).as("__df"))
      .filter(col("__df") > maxDocFreq)
      .select(col("__h"))
    val kept = lines.join(hot, Seq("__h"), "left_anti")
    val rebuilt = kept.groupBy(col("__id"))
      .agg(count(lit(1)).as("__kept"),
        array_join(transform(
          array_sort(collect_list(struct(col("__pos"), col("__line")))),
          s => s.getField("__line")), "\n").as("text_clean"))
    df.select(col(idCol), size(split(text, "\n", -1)).cast("long").as("__total"))
      .join(rebuilt.withColumnRenamed("__id", idCol), Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("text_clean"), lit("")).as("text_clean"),
        (col("__total") - coalesce(col("__kept"), lit(0L))).cast("long")
          .as("n_lines_removed"))
  }
}
