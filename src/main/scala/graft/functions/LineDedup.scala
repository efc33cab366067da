package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Line-level boilerplate removal — the CCNet / RefinedWeb corpus-prep step
  * that strips lines repeated across many documents (headers, footers,
  * license blocks, navigation chrome) while keeping each document's unique
  * prose. Complements document-level dedup: a page is unique overall yet
  * 30% boilerplate, and that 30% is what this removes.
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
