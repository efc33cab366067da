package graft.streaming

import graft.SparkSpec
import graft.operators.{CdcMerge, UpsertBlobDialect}
import org.apache.spark.sql.functions._

class BucketedTargetSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed target: merge join plans zero exchanges on the target side") {
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
    try {
      val tgt = new BucketedTarget(spark, "bucketed_t", "ARCANE_MERGE_KEY", 4)
      tgt.overwrite((1 to 1000).map(i => (s"k$i", i.toLong, s"p$i"))
        .toDF("ARCANE_MERGE_KEY", "createdon", "payload"))

      val changes = Seq(("k1", 5000L, "new"), ("kx", 5000L, "ins"))
        .toDF("ARCANE_MERGE_KEY", "createdon", "payload")
      val merged = CdcMerge.applyChanges(tgt.read(), changes,
        "ARCANE_MERGE_KEY", UpsertBlobDialect)

      // the bucketed scan side must join without an exchange
      assert(MergePlanInspector.targetSideExchanges(merged, "bucketed_t") == 0)
      // un-bucketed control: same merge against a plain frame shuffles both sides
      val plain = (1 to 1000).map(i => (s"k$i", i.toLong, s"p$i"))
        .toDF("ARCANE_MERGE_KEY", "createdon", "payload")
      val mergedPlain = CdcMerge.applyChanges(plain, changes,
        "ARCANE_MERGE_KEY", UpsertBlobDialect)
      assert(MergePlanInspector.exchanges(mergedPlain) >= 2)

      // correctness of the full bucketed merge cycle
      tgt.merge(changes, UpsertBlobDialect)
      val rows = tgt.read().filter($"ARCANE_MERGE_KEY".isin("k1", "kx"))
        .select("ARCANE_MERGE_KEY", "payload").as[(String, String)].collect().toMap
      assert(rows == Map("k1" -> "new", "kx" -> "ins"))
      assert(tgt.read().count() == 1001)
      // the staged-swap replacement must leave no staging table behind and
      // must preserve the bucket spec through the rename (the zero-exchange
      // property is the bucketing's whole point)
      assert(!spark.catalog.tableExists("bucketed_t__staged"),
        "staged table must be renamed away, not left behind")
      val merged2 = CdcMerge.applyChanges(tgt.read(), changes,
        "ARCANE_MERGE_KEY", UpsertBlobDialect)
      assert(MergePlanInspector.targetSideExchanges(merged2, "bucketed_t") == 0,
        "bucket spec must survive the staged swap's rename")
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS bucketed_t")
      spark.sql("DROP TABLE IF EXISTS bucketed_t__staged")
    }
  }

  test("crash between DROP and RENAME self-heals on the next entry") {
    try {
      import spark.implicits._
      val tgt = new BucketedTarget(spark, "healed_t", "k", 4)
      tgt.overwrite(Seq(("a", 1L), ("b", 2L)).toDF("k", "v"))
      // simulate the documented crash window: the replacement is fully
      // durable under the staged name, the live table already dropped,
      // the process died before the rename
      Seq(("a", 10L), ("c", 30L)).toDF("k", "v").write
        .bucketBy(4, "k").sortBy("k").mode("overwrite")
        .format("parquet").saveAsTable("healed_t__staged")
      spark.sql("DROP TABLE healed_t")
      // a fresh handle (the restart) must rename the completed swap into
      // place instead of failing on read() or re-seeding a fresh table
      val restarted = new BucketedTarget(spark, "healed_t", "k", 4)
      assert(restarted.exists, "self-heal must restore the live table")
      assert(!spark.catalog.tableExists("healed_t__staged"))
      val rows = restarted.read().as[(String, Long)].collect().toMap
      assert(rows == Map("a" -> 10L, "c" -> 30L),
        "the healed table must be the COMPLETED replacement, not the original")
      // the other window — crash BEFORE the drop (live + staged both
      // present) — must NOT heal: the swap never committed, the next
      // overwrite discards the stale staging
      Seq(("z", 99L)).toDF("k", "v").write
        .bucketBy(4, "k").sortBy("k").mode("overwrite")
        .format("parquet").saveAsTable("healed_t__staged")
      val live = new BucketedTarget(spark, "healed_t", "k", 4)
      assert(live.read().as[(String, Long)].collect().toMap ==
        Map("a" -> 10L, "c" -> 30L),
        "live + staged both present: the live table wins, no heal")
      live.overwrite(Seq(("d", 4L)).toDF("k", "v"))
      assert(live.read().as[(String, Long)].collect().toMap == Map("d" -> 4L))
      assert(!spark.catalog.tableExists("healed_t__staged"))
    } finally {
      spark.sql("DROP TABLE IF EXISTS healed_t")
      spark.sql("DROP TABLE IF EXISTS healed_t__staged")
    }
  }
}
