package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Snapshot-diff contracts: the four statuses on a hand fixture, the
  * merge-regression identity (applying a reconstructed changefeed to the
  * old snapshot reproduces the new one), and body-free shuffle posture.
  */
class SnapshotDiffSpec extends SparkSpec {
  import spark.implicits._

  test("added / removed / changed / unchanged on a hand fixture") {
    val old = Seq((1L, "alpha"), (2L, "beta"), (3L, "gamma")).toDF("id", "text")
    val neu = Seq((2L, "beta"), (3L, "gamma v2"), (4L, "delta")).toDF("id", "text")
    val got = SnapshotDiff.diff(old, neu, "id", md5($"text"))
      .as[(Long, String)].collect().toMap
    assert(got == Map(1L -> "removed", 2L -> "unchanged",
      3L -> "changed", 4L -> "added"))
  }

  test("diff is empty-symmetric: identical snapshots -> all unchanged") {
    val snap = spark.read.parquet(s"$sf/documents.parquet")
    val got = SnapshotDiff.diff(snap, snap, "doc_id", md5($"text"))
      .groupBy($"status").count().as[(String, Long)].collect().toMap
    assert(got.keySet == Set("unchanged") && got("unchanged") == snap.count())
  }

  test("null fingerprints: presence decides added/removed; null<=>null is unchanged") {
    // id 1: both sides, both fingerprints null -> unchanged (not "changed")
    // id 2: both sides, null -> value            -> changed
    // id 3: only new side, null fingerprint      -> added (not misread as absent)
    // id 4: only old side, null fingerprint      -> removed
    val old = Seq((1L, Option.empty[String]), (2L, Option.empty[String]),
      (4L, Option.empty[String])).toDF("id", "text")
    val neu = Seq((1L, Option.empty[String]), (2L, Option("beta")),
      (3L, Option.empty[String])).toDF("id", "text")
    val got = SnapshotDiff.diff(old, neu, "id", md5($"text"))
      .as[(Long, String)].collect().toMap
    assert(got == Map(1L -> "unchanged", 2L -> "changed",
      3L -> "added", 4L -> "removed"))
  }

  test("merge-regression identity: applying the reconstructed feed reproduces today") {
    val docs = spark.read.parquet(s"$sf/documents.parquet").select($"doc_id", $"text")
    val yesterday = docs.filter($"doc_id" % 7 =!= 0)
    val today = docs
      .withColumn("text", when($"doc_id" % 11 === 0, concat($"text", lit(" v2")))
        .otherwise($"text"))
      .filter($"doc_id" % 13 =!= 0)
    val d = SnapshotDiff.diff(yesterday, today, "doc_id", md5($"text"))
    // upserts = added+changed rows taken from today; deletes = removed ids
    val upserts = today.join(
      d.filter($"status".isin("added", "changed")).select($"doc_id"), Seq("doc_id"), "left_semi")
    val deletes = d.filter($"status" === "removed").select($"doc_id")
    val replayed = yesterday
      .join(deletes.union(upserts.select($"doc_id")), Seq("doc_id"), "left_anti")
      .unionByName(upserts)
    val diffAfter = SnapshotDiff.diff(replayed, today, "doc_id", md5($"text"))
      .filter($"status" =!= "unchanged").count()
    assert(diffAfter == 0, "replaying the feed must reproduce today exactly")
  }
}
