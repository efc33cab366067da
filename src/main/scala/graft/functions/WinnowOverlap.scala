package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Partial-overlap near-dup detection via winnowing fingerprints
  * (MOSS-style): two documents that share any run of >= w + k - 1
  * normalized characters share at least one fingerprint, so an
  * inverted-index join over the (sparse) fingerprint sets finds documents
  * with copied/overlapping passages — the case whole-document fingerprints
  * (md5) and global-similarity measures (MinHash Jaccard at high threshold)
  * both miss.
  *
  * Same scale shape as [[NgramJaccard]]: documents meet only through shared
  * fingerprints (cost Σ df(fp)², df-capped), but the posting lists are
  * ~w/2× shorter than shingle posting lists because winnowing thins the
  * hash stream to density 2/(w+1) — the standard trick that makes
  * substring-level matching affordable at corpus scale.
  */
object WinnowOverlap {

  /** Pairs (id_a < id_b) sharing >= `minShared` distinct winnowed
    * fingerprints, with the shared count and the containment-style overlap
    * ratio shared / min(|fp_a|, |fp_b|) (1.0 = one document's fingerprint
    * set is fully contained in the other's).
    *
    * @param maxDocFreq stop-fingerprint cap, as in [[NgramJaccard.pairs]]:
    *   fingerprints in more than this many documents (boilerplate headers,
    *   license blocks) are excluded from the join; -1 = auto
    *   (max(1000, 1% of corpus)), 0 = uncapped.
    */
  def pairs(df: DataFrame, idCol: String, text: Column,
            k: Int = 5, w: Int = 8, minShared: Int = 3,
            maxDocFreq: Long = -1L): DataFrame =
    pairsFromFingerprints(df, idCol,
      TextFunctions.winnowedFingerprints(text, k, w), minShared, maxDocFreq)

  /** [[pairs]] over a PRE-COMPUTED fingerprint array column — the caller
    * picks the winnowing hash family. Used by the oracle-bearing
    * `dedup_winnow` query, whose md5-prefix rolling fingerprints DuckDB
    * recomputes exactly (window-min over gram hashes).
    */
  def pairsFromFingerprints(df: DataFrame, idCol: String, fps: Column,
                            minShared: Int = 3, maxDocFreq: Long = -1L): DataFrame = {
    val fpsDf = FanOut(df).select(col(idCol).as("__id"), array_distinct(fps).as("__fp"))
    // Pin the posting list to ONE exchange on the join key: every consumer
    // below (stop-list agg, per-doc counts, both self-join sides) otherwise
    // plans its own exchange over the fingerprint computation, re-running
    // the expensive hash pass per branch. Partitioned by __f, the stop agg
    // and the self-join read the shuffled 8-byte rows in place and
    // ReuseExchange collapses the rest — the fingerprint kernel runs once.
    val ex0 = fpsDf.select(col("__id"), explode(col("__fp")).as("__f"))
      .repartition(col("__f"))
    val ex =
      if (maxDocFreq == 0) ex0
      else {
        // auto cap (max(1000, 1% of corpus)) derived INSIDE the plan — a
        // one-row broadcast from an id-only scan, same as
        // [[NgramJaccard.pairs]] — so building the query launches no eager
        // count job (callers compose this lazily)
        val capCol = if (maxDocFreq > 0) lit(maxDocFreq) else col("__cap")
        val stop0 = ex0.groupBy("__f").agg(count("*").as("__df"))
        val stop =
          (if (maxDocFreq > 0) stop0
           else stop0.crossJoin(broadcast(df.select(
             greatest(lit(1000L), approx_count_distinct(col(idCol)) / 100)
               .cast("long").as("__cap")))))
            .filter(col("__df") > capCol).select("__f")
        ex0.join(stop, Seq("__f"), "left_anti")
      }
    // denominators over the same capped fingerprint sets as the numerator:
    // a stop fingerprint (excluded from the join) must not dilute the ratio
    // of the informative ones, or boilerplate-heavy docs can never match
    val cnt = ex.groupBy(col("__id")).agg(count("*").as("__n"))
    val shared = ex.as("a").join(ex.as("b"),
        col("a.__f") === col("b.__f") && col("a.__id") < col("b.__id"))
      .groupBy(col("a.__id").as("id_a"), col("b.__id").as("id_b"))
      .agg(count("*").as("shared"))
      .filter(col("shared") >= minShared)
    shared
      .join(cnt.as("ca"), col("id_a") === col("ca.__id"))
      .join(cnt.as("cb"), col("id_b") === col("cb.__id"))
      .withColumn("overlap", round(col("shared") / least(col("ca.__n"), col("cb.__n")), 4))
      .select(col("id_a"), col("id_b"), col("shared"), col("overlap"))
  }
}
