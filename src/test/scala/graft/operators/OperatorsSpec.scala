package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private def rows = Seq(
    ("k1", 1L, "a"), ("k1", 3L, "b"), ("k1", 3L, "c"), ("k2", 5L, "d")
  ).toDF("key", "ver", "payload")

  test("latestByKey keeps exactly one row per key, highest version") {
    val out = Dedup.latestByKey(rows, $"key", Seq($"ver"), Seq($"payload"))
      .orderBy("key").collect()
    assert(out.length == 2)
    assert(out(0).getString(2) == "c") // tiebreak payload desc
    assert(out(1).getString(2) == "d")
  }

  test("latestByKeyWithTies keeps all max-version ties (WITH TIES fidelity)") {
    val out = Dedup.latestByKeyWithTies(rows, $"key", Seq($"ver"))
    assert(out.count() == 3) // both k1@3 rows survive
  }

  test("exactByColumns keeps deterministic survivor") {
    val df = Seq((1L, "x"), (2L, "x"), (3L, "y")).toDF("id", "t")
    val out = Dedup.exactByColumns(df, Seq($"t"), $"id").orderBy("id").collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 3L))
  }
}

class CdcMergeSpec extends SparkSpec {
  import spark.implicits._

  private val target = Seq(
    ("k1", 10L, "old1"), ("k2", 10L, "old2"), ("k3", 10L, "old3")
  ).toDF("ARCANE_MERGE_KEY", "SYS_CHANGE_VERSION", "payload")

  test("mssql-ct dialect: update newer, skip stale, delete, insert") {
    val changes = Seq(
      ("k1", 20L, "new1", "U"),  // newer → update
      ("k2", 5L, "stale", "U"),  // stale → keep target
      ("k3", 20L, "x", "D"),     // delete
      ("k4", 20L, "new4", "I"),  // insert
      ("k5", 20L, "x", "D")      // unmatched delete → no-op
    ).toDF("ARCANE_MERGE_KEY", "SYS_CHANGE_VERSION", "payload", "SYS_CHANGE_OPERATION")
    val out = CdcMerge.applyChanges(target, changes, "ARCANE_MERGE_KEY", MsSqlCtDialect)
      .orderBy("ARCANE_MERGE_KEY")
      .select("ARCANE_MERGE_KEY", "payload").as[(String, String)].collect()
    assert(out.toSeq == Seq("k1" -> "new1", "k2" -> "old2", "k4" -> "new4"))
  }

  test("synapse dialect: soft delete + null IsDelete treated as false") {
    val changes = Seq(
      ("k1", 20L, "new1", Some(false)),
      ("k2", 20L, "x", Some(true)),       // soft delete
      ("k4", 20L, "new4", None)           // null IsDelete → insert
    ).toDF("ARCANE_MERGE_KEY", "versionnumber", "payload", "IsDelete")
    val tgt = target.withColumnRenamed("SYS_CHANGE_VERSION", "versionnumber")
    val out = CdcMerge.applyChanges(tgt, changes, "ARCANE_MERGE_KEY", SynapseLinkDialect)
      .orderBy("ARCANE_MERGE_KEY")
      .select("ARCANE_MERGE_KEY", "payload").as[(String, String)].collect()
    assert(out.toSeq == Seq("k1" -> "new1", "k3" -> "old3", "k4" -> "new4"))
  }

  test("upsert dialect: no deletes, version-guarded update") {
    val changes = Seq(
      ("k1", 20L, "new1"), ("k2", 5L, "stale"), ("k4", 20L, "new4")
    ).toDF("ARCANE_MERGE_KEY", "createdon", "payload")
    val tgt = target.withColumnRenamed("SYS_CHANGE_VERSION", "createdon")
    val out = CdcMerge.applyChanges(tgt, changes, "ARCANE_MERGE_KEY", UpsertBlobDialect)
      .orderBy("ARCANE_MERGE_KEY")
      .select("ARCANE_MERGE_KEY", "payload").as[(String, String)].collect()
    assert(out.toSeq == Seq("k1" -> "new1", "k2" -> "old2", "k3" -> "old3", "k4" -> "new4"))
  }

  test("merge is idempotent: replaying the same batch is a no-op") {
    val changes = Seq(("k1", 20L, "new1", "U")).toDF(
      "ARCANE_MERGE_KEY", "SYS_CHANGE_VERSION", "payload", "SYS_CHANGE_OPERATION")
    val once = CdcMerge.applyChanges(target, changes, "ARCANE_MERGE_KEY", MsSqlCtDialect)
    val twice = CdcMerge.applyChanges(once, changes, "ARCANE_MERGE_KEY", MsSqlCtDialect)
    assert(once.orderBy("ARCANE_MERGE_KEY").collect().toSeq ==
      twice.orderBy("ARCANE_MERGE_KEY").collect().toSeq)
  }

  test("schema evolution inside merge: batch-only columns appear null on old rows") {
    val changes = Seq(("k4", 20L, "new4", "I", "extra-val")).toDF(
      "ARCANE_MERGE_KEY", "SYS_CHANGE_VERSION", "payload", "SYS_CHANGE_OPERATION", "extra")
    val out = CdcMerge.applyChanges(target, changes, "ARCANE_MERGE_KEY", MsSqlCtDialect)
    assert(out.columns.contains("extra"))
    val k1 = out.filter($"ARCANE_MERGE_KEY" === "k1").select("extra").head()
    assert(k1.isNullAt(0))
    val k4 = out.filter($"ARCANE_MERGE_KEY" === "k4").select("extra").head()
    assert(k4.getString(0) == "extra-val")
  }
}

class FieldFilterSpec extends SparkSpec {
  import spark.implicits._

  private def df = Seq((1L, "a", 2.0)).toDF("ID", "name", "val")

  test("include is case-insensitive and keeps essentials") {
    val out = FieldFilter.include(df, Seq("id"), essential = Seq("VAL"))
    assert(out.columns.toSeq == Seq("ID", "val"))
  }

  test("include of unknown column fails eagerly") {
    intercept[FieldFilter.FieldFilterError] {
      FieldFilter.include(df, Seq("nope"))
    }
  }

  test("exclude of essential column is a configuration error") {
    intercept[FieldFilter.FieldFilterError] {
      FieldFilter.exclude(df, Seq("ID"), essential = Seq("id"))
    }
    assert(FieldFilter.exclude(df, Seq("name")).columns.toSeq == Seq("ID", "val"))
  }
}

class MergeSqlBuilderSpec extends SparkSpec {

  test("mssql-ct merge SQL has delete/update-guard/insert clauses") {
    val sql = MergeSqlBuilder.mssqlCt("cat.db.tgt", "staged", Seq("ARCANE_MERGE_KEY", "a", "b"))
    assert(sql.contains("MERGE INTO cat.db.tgt t"))
    assert(sql.contains("WHEN MATCHED AND s.`SYS_CHANGE_OPERATION` = 'D' THEN DELETE"))
    assert(sql.contains("s.`SYS_CHANGE_VERSION` > t.`SYS_CHANGE_VERSION` THEN UPDATE SET"))
    assert(sql.contains("WHEN NOT MATCHED AND s.`SYS_CHANGE_OPERATION` != 'D' THEN INSERT"))
    assert(!sql.contains("t.`SYS_CHANGE_OPERATION` = s.`SYS_CHANGE_OPERATION`")) // op not in SET
  }

  test("synapse merge SQL uses coalesced IsDelete and versionnumber guard") {
    val sql = MergeSqlBuilder.synapseLink("t1", "s1", Seq("ARCANE_MERGE_KEY", "a"))
    assert(sql.contains("coalesce(s.`IsDelete`, false) = true THEN DELETE"))
    assert(sql.contains("s.`versionnumber` > t.`versionnumber`"))
  }

  test("upsert merge SQL has no delete clause and unconditional insert") {
    val sql = MergeSqlBuilder.upsertBlob("t1", "s1", Seq("ARCANE_MERGE_KEY", "a"))
    assert(!sql.contains("DELETE"))
    assert(sql.contains("WHEN NOT MATCHED THEN INSERT"))
    assert(sql.contains("s.`createdon` > t.`createdon`"))
  }

  test("on-clause partition pruning and null-tolerant extra keys") {
    val on = MergeSqlBuilder.onClause("k",
      partitionPruning = Seq("part" -> Seq("p1", "p2")),
      extraMatchKeys = Seq("tenant"))
    assert(on == "t.`k` = s.`k` AND t.`part` IN ('p1', 'p2') AND (t.`tenant` = s.`tenant` OR s.`tenant` IS NULL)")
  }

  test("dedup subquery partitions by key, orders by version desc") {
    val sql = MergeSqlBuilder.dedupSubquery("staged", "k", "v", Seq("tb"))
    assert(sql.contains("PARTITION BY `k` ORDER BY `v` DESC, `tb` DESC"))
    assert(sql.contains("WHERE __rn = 1"))
  }

  test("merge SQL executes against Spark analyzer (syntax check via parse)") {
    val sql = MergeSqlBuilder.mssqlCt("tgt", "src", Seq("ARCANE_MERGE_KEY", "a"))
    // Spark can parse the statement (execution needs a v2 catalog)
    spark.sessionState.sqlParser.parsePlan(sql)
  }
}

class CdcMergeNullKeySpec extends SparkSpec {
  import spark.implicits._

  test("null merge keys survive as their own rows, never all-null output") {
    val target = Seq((Option("k1"), 10L, "old"), (None, 10L, "tnull"))
      .toDF("ARCANE_MERGE_KEY", "createdon", "payload")
    val changes = Seq((Option("k1"), 20L, "new"), (None, 20L, "snull"))
      .toDF("ARCANE_MERGE_KEY", "createdon", "payload")
    val out = CdcMerge.applyChanges(target, changes, "ARCANE_MERGE_KEY", UpsertBlobDialect)
      .select("ARCANE_MERGE_KEY", "payload").collect()
    // k1 updated; the two null-key rows both survive independently (null
    // never equi-joins null), and no fabricated all-null row appears
    val payloads = out.map(r => (Option(r.getString(0)), r.getString(1))).toSet
    assert(payloads == Set(
      (Some("k1"), "new"), (None, "tnull"), (None, "snull")))
    assert(out.forall(_.getString(1) != null))
  }
}

class SkewJoinSpec extends SparkSpec {
  import spark.implicits._

  test("salted join equals plain join result and spreads hot keys") {
    // 1000 rows of one hot key + a cold tail
    val big = ((1 to 1000).map(i => ("hot", i.toLong)) ++
      (1 to 50).map(i => (s"cold$i", i.toLong))).toDF("key", "row_id")
    val small = (Seq(("hot", "H")) ++ (1 to 50).map(i => (s"cold$i", s"C$i")))
      .toDF("key", "dim")
    val plain = big.join(small, "key").orderBy("key", "row_id").collect()
    val salted = SkewJoin.saltedJoin(big, small, "key", "row_id", factor = 8)
      .orderBy("key", "row_id").collect()
    assert(salted.length == plain.length)
    assert(salted.map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSeq ==
      plain.map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSeq)
    // salts actually spread the hot key across sub-keys
    val saltSpread = big.filter($"key" === "hot")
      .withColumn("s", pmod(xxhash64($"key", $"row_id"), lit(8)))
      .select("s").distinct().count()
    assert(saltSpread > 4)
  }
}
