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
}
