package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Snapshot diff — "what changed between yesterday's corpus and today's?"
  * The audit a data pipeline runs after every ingest round: per-key status
  * (added / removed / changed / unchanged) from a full outer join of the
  * two snapshots' CONTENT FINGERPRINTS, never their payloads. Related to
  * the CDC merge family (K2): where a merge APPLIES a changefeed, the diff
  * RECONSTRUCTS one from two materialized states — the fallback when no
  * change tracking exists, and the regression check when one does (replay
  * the feed, diff against the target, expect zero drift; cf. the
  * reference's merge-match checks,
  * /root/reference/src/main/scala/services/merging/JdbcMergeServiceClient.scala:62-91).
  *
  * Scale posture: both sides reduce map-side to (key, 16-byte fingerprint)
  * before the one equi-join shuffle — document bodies never move. Output
  * is one row per key in either snapshot; aggregate downstream for the
  * 4-row summary.
  */
object SnapshotDiff {

  /** Per-key diff of two snapshots. `fingerprint` is evaluated against
    * each side (any deterministic content hash — use
    * `TextFunctions.fingerprint` for text corpora).
    */
  def diff(oldSnap: DataFrame, newSnap: DataFrame, idCol: String,
           fingerprint: Column): DataFrame = {
    // Presence is carried explicitly (not inferred from fingerprint nullness):
    // a key present on both sides with a NULL fingerprint (e.g. null text)
    // must compare by presence, and two null fingerprints are "unchanged" —
    // hence the null-safe <=> below.
    val o = oldSnap.select(col(idCol), fingerprint.as("__fp_old"),
      lit(true).as("__in_old"))
    val n = newSnap.select(col(idCol), fingerprint.as("__fp_new"),
      lit(true).as("__in_new"))
    o.join(n, Seq(idCol), "full_outer")
      .select(col(idCol),
        when(col("__in_old").isNull, lit("added"))
          .when(col("__in_new").isNull, lit("removed"))
          .when(col("__fp_old") <=> col("__fp_new"), lit("unchanged"))
          .otherwise(lit("changed")).as("status"))
  }
}
