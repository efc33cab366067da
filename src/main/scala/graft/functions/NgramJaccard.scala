package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact n-gram Jaccard similarity via an inverted-index self-join.
  *
  * Never materializes the n² pair space: documents meet only through shared
  * grams (posting-list join), so cost is Σ df(gram)² over distinct grams —
  * with the document-frequency cap applied, near-linear in corpus size. This
  * is the exact-similarity complement to [[MinHashLsh]] (approximate) and the
  * verification kernel both share.
  */
object NgramJaccard {

  /** Pairs (id_a < id_b) with Jaccard(ngrams_a, ngrams_b) >= threshold.
    *
    * @param maxDocFreq drop grams occurring in more than this many documents
    *                   (stop-gram skew guard: a gram in half the corpus would
    *                   otherwise quadratically dominate the join — the
    *                   posting-list join costs Σ df(gram)², so one uncapped
    *                   stop-gram is the whole bill). Capped runs are still
    *                   exact for pairs whose similarity is carried by rarer
    *                   grams — the standard trade-off. Defaults to auto:
    *                   max(1000, 1% of corpus documents), so the guard is on
    *                   at any corpus size without tuning. Pass 0 to disable
    *                   (exact-verification kernel use only — never at scale).
    */
  def pairs(df: DataFrame, idCol: String, ngrams: Column,
            threshold: Double, maxDocFreq: Long = -1L): DataFrame = {
    val g0 = df.select(col(idCol).as("__id"), explode(ngrams).as("__gram"))
    val cap =
      if (maxDocFreq >= 0) maxDocFreq
      else math.max(1000L, df.count() / 100)
    val g =
      if (cap == 0) g0
      else {
        // anti-join against the stop grams (few by construction: only grams
        // above the cap), not an inner join against all rare grams — the
        // rare set is ∝ distinct grams and could never broadcast at corpus
        // scale, while the stop set stays small enough for AQE to broadcast
        val stop = g0.groupBy("__gram").agg(count("*").as("__df"))
          .filter(col("__df") > cap).select("__gram")
        g0.join(stop, Seq("__gram"), "left_anti")
      }
    val cnt = g.groupBy(col("__id")).agg(count("*").as("__n"))
    val inter = g.as("a").join(g.as("b"),
        col("a.__gram") === col("b.__gram") && col("a.__id") < col("b.__id"))
      .groupBy(col("a.__id").as("id_a"), col("b.__id").as("id_b"))
      .agg(count("*").as("__i"))
    inter
      .join(cnt.as("ca"), col("id_a") === col("ca.__id"))
      .join(cnt.as("cb"), col("id_b") === col("cb.__id"))
      .withColumn("jaccard",
        round(col("__i") / (col("ca.__n") + col("cb.__n") - col("__i")), 4))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }
}
