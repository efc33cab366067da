package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-wide line-level exact dedup (the C4 preprocessing step): every
  * line that occurs more than once across the corpus is kept ONLY at its
  * first occurrence (smallest (doc, position)); documents are reassembled
  * from their surviving lines, and documents whose every line was dropped
  * disappear.
  *
  * Scale shape: lines explode map-side; the global first-occurrence rule is
  * one groupBy on the 16-byte line fingerprint carrying only (id, pos) —
  * line text never shuffles for the dedup decision; reassembly is one
  * groupBy on the doc id collecting the surviving (pos, line) pairs. A
  * boilerplate line repeated across millions of documents costs one
  * aggregate row, not a join blow-up.
  */
object LineDedup {

  def dedupLines(df: DataFrame, idCol: String, textCol: String,
                 sep: String = "\n"): DataFrame = {
    val lines = df.select(col(idCol).as("__id"),
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
}
