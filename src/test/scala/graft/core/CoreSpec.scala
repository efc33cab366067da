package graft.core

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class SchemaEvolutionSpec extends SparkSpec {

  private val target = StructType(Seq(
    StructField("id", LongType), StructField("Name", StringType)))
  private val source = StructType(Seq(
    StructField("ID", LongType), StructField("name", StringType),
    StructField("extra", DoubleType)))

  test("missingFields is case-insensitive and additive-only") {
    val missing = SchemaEvolution.missingFields(target, source)
    assert(missing.map(_.name) == Seq("extra"))
    assert(SchemaEvolution.missingFields(source, target).isEmpty)
  }

  test("evolve appends missing fields as nullable, keeps order") {
    val evolved = SchemaEvolution.evolve(target, source)
    assert(evolved.fieldNames.toSeq == Seq("id", "Name", "extra"))
    assert(evolved("extra").nullable)
  }

  test("schemaEquals ignores order, case, nullability; Int≡Short") {
    val a = StructType(Seq(StructField("x", IntegerType), StructField("y", StringType)))
    val b = StructType(Seq(StructField("Y", StringType, nullable = false),
      StructField("X", ShortType)))
    assert(SchemaEvolution.schemaEquals(a, b))
    val c = StructType(Seq(StructField("x", LongType), StructField("y", StringType)))
    assert(!SchemaEvolution.schemaEquals(a, c))
  }

  test("conflictingFields reports incompatible retypes") {
    val c = StructType(Seq(StructField("name", LongType)))
    val conflicts = SchemaEvolution.conflictingFields(target, c)
    assert(conflicts.map(_._1.name) == Seq("Name"))
  }

  test("nested array/struct type equivalence") {
    val a = ArrayType(StructType(Seq(StructField("v", IntegerType))))
    val b = ArrayType(StructType(Seq(StructField("V", ShortType))))
    assert(SchemaEvolution.typeEquals(a, b))
  }

  test("widened: within-chain promotion only, never across kinds") {
    assert(SchemaEvolution.widened(IntegerType, LongType).contains(LongType))
    assert(SchemaEvolution.widened(LongType, ShortType).contains(LongType))
    assert(SchemaEvolution.widened(FloatType, DoubleType).contains(DoubleType))
    assert(SchemaEvolution.widened(StringType, StringType).contains(StringType))
    assert(SchemaEvolution.widened(LongType, DoubleType).isEmpty,
      "long→double silently loses precision above 2^53 — must NOT widen")
    assert(SchemaEvolution.widened(StringType, IntegerType).isEmpty)
  }

  test("evolveWidening retypes in-chain conflicts, appends, leaves cross-kind alone") {
    val t = StructType(Seq(StructField("n", IntegerType), StructField("s", StringType)))
    val src = StructType(Seq(StructField("N", LongType),
      StructField("s", IntegerType), StructField("extra", FloatType)))
    val out = SchemaEvolution.evolveWidening(t, src)
    assert(out("n").dataType == LongType, "int column receiving longs widens")
    assert(out("s").dataType == StringType, "cross-kind conflict keeps the target type")
    assert(out("extra").dataType == FloatType)
  }
}

class CdcMergeWideningSpec extends SparkSpec {
  import spark.implicits._
  import graft.operators.{CdcMerge, UpsertBlobDialect}
  import org.apache.spark.sql.functions.col

  test("widenTypes merges an int-versioned target with a long batch, values intact") {
    val target = Seq(("k1", 10, 1.5f), ("k2", 10, 2.5f))
      .toDF("ARCANE_MERGE_KEY", "createdon", "score") // int version, float score
    val changes = Seq(("k1", 20L, 9.5), ("k3", 20L, 3.5))
      .toDF("ARCANE_MERGE_KEY", "createdon", "score") // long version, double score
    val out = CdcMerge.applyChanges(target, changes, "ARCANE_MERGE_KEY",
      UpsertBlobDialect, widenTypes = true)
    assert(out.schema("createdon").dataType == LongType)
    assert(out.schema("score").dataType == DoubleType)
    val rows = out.select(col("ARCANE_MERGE_KEY"), col("createdon"), col("score"))
      .as[(String, Long, Double)].collect().sortBy(_._1).toSeq
    assert(rows == Seq(("k1", 20L, 9.5), ("k2", 10L, 2.5), ("k3", 20L, 3.5)))
  }

  test("declared widening rejects cross-kind conflicts instead of silently casting") {
    // long vs double is the dangerous pair: Spark's implicit coercion would
    // go to double and lose precision above 2^53 — widenTypes must refuse
    val target = Seq(("k1", 10L)).toDF("ARCANE_MERGE_KEY", "v")
      .withColumn("createdon", col("v"))
    val changes = Seq(("k1", 20.5)).toDF("ARCANE_MERGE_KEY", "v")
      .withColumn("createdon", org.apache.spark.sql.functions.lit(20L))
    val e = intercept[IllegalArgumentException] {
      CdcMerge.applyChanges(target, changes, "ARCANE_MERGE_KEY",
        UpsertBlobDialect, widenTypes = true)
    }
    assert(e.getMessage.contains("v: bigint vs double"))
  }
}

class MiniJsonSpec extends org.scalatest.funsuite.AnyFunSuite {
  import MiniJson._

  test("full grammar: nesting, escapes, numbers, literals") {
    val v = parse(
      """{"a": [1, -2.5, 1e3], "b": {"c": "x\ny", "d": null},
        |"e": true, "f": false, "g": "é😀"}""".stripMargin)
    val o = v.asObj
    assert(o("a").asArr.map(_.asInstanceOf[JNum].value) == Seq(1.0, -2.5, 1000.0))
    assert(o("b").asObj("c").asStr == "x\ny")
    assert(o("b").asObj("d") == JNull)
    assert(o("e").asBool && !o("f").asBool)
    // \u escapes incl. a surrogate pair reassemble to the real code points
    assert(o("g").asStr == "é😀")
  }

  test("malformed inputs fail with positioned messages, never raw index errors") {
    val bad = Seq(
      "",                       // empty
      "{",                      // unterminated object
      """{"a": }""",            // missing value
      """["x""",                // unterminated array
      "\"abc",                  // unterminated string
      "\"a\\",                  // string ending in a lone backslash
      "\"a\\u00",               // truncated \u escape
      """{"a": 1} trailing""")  // trailing content
    bad.foreach { s =>
      val e = intercept[Exception](parse(s))
      assert(e.isInstanceOf[IllegalArgumentException] ||
        e.isInstanceOf[NumberFormatException], s"input <$s> threw ${e.getClass}")
    }
  }

  test("typed accessors reject mismatched shapes") {
    intercept[IllegalArgumentException](parse("[1]").asObj)
    intercept[IllegalArgumentException](parse("{}").asArr)
    intercept[IllegalArgumentException](parse("1").asStr)
    intercept[IllegalArgumentException](parse("\"x\"").asLong)
    assert(parse("42").asLong == 42L)
  }
}

class MergeKeySpec extends SparkSpec {
  import spark.implicits._

  test("hex merge key equals sha256 of '#'-joined pk casts") {
    val df = Seq((1L, 2)).toDF("a", "b")
      .select(MergeKey.mergeKeyHex(Seq(col("a"), col("b"))).as("k"))
    val expected = java.security.MessageDigest.getInstance("SHA-256")
      .digest("1#2".getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(df.head().getString(0) == expected)
  }

  test("base64 merge key encodes the raw digest bytes") {
    val df = Seq(Tuple1(42L)).toDF("a")
      .select(MergeKey.mergeKeyBase64(Seq(col("a"))).as("k"))
    val digest = java.security.MessageDigest.getInstance("SHA-256")
      .digest("42".getBytes("UTF-8"))
    assert(df.head().getString(0) == java.util.Base64.getEncoder.encodeToString(digest))
  }

  test("shard predicates cover all shards") {
    val preds = MergeKey.mssqlShardPredicates("[id]", 4)
    assert(preds.length == 4)
    assert(preds(2).contains("% 4 = 2"))
  }
}

class WatermarkSpec extends SparkSpec {

  test("json round-trip") {
    val wm = Watermark(Watermark.MsSql, "00000000000000000042", 1700000000000L)
    assert(Watermark.fromJson(wm.toJson).contains(wm))
  }

  test("json round-trip is exact for escapes: quotes, backslashes, controls") {
    // a literal backslash-n (2 chars), a real newline, a quote, a tab
    val nasty = Seq("a\\nb", "a\nb", "he said \"hi\"", "tab\tsep", "end\\")
    for (v <- nasty) {
      val wm = Watermark("kind\\n", v, 42L)
      assert(Watermark.fromJson(wm.toJson).contains(wm), s"failed on $v")
    }
  }

  test("fromJson rejects malformed payloads without throwing") {
    assert(Watermark.fromJson("").isEmpty)
    assert(Watermark.fromJson("not json").isEmpty)
    assert(Watermark.fromJson("""{"kind":"k","version":7,"timestamp":1}""").isEmpty)
    assert(Watermark.fromJson("""{"kind":"k","version":"v"}""").isEmpty)
    assert(Watermark.fromJson("""{"kind":"k","version":"v","timestamp":"x"}""").isEmpty)
    // non-integral / out-of-range timestamps are corrupt state, not data:
    // a lenient double fallback would silently truncate 1.9 → 1
    assert(Watermark.fromJson("""{"kind":"k","version":"v","timestamp":1.9}""").isEmpty)
    assert(Watermark.fromJson("""{"kind":"k","version":"v","timestamp":1e3}""").isEmpty)
    assert(Watermark.fromJson(
      """{"kind":"k","version":"v","timestamp":9223372036854775808}""").isEmpty)
  }

  test("ordering is lexicographic on version (zero-padded numerics)") {
    assert(Watermark.mssql(9) < Watermark.mssql(10))
    assert(Watermark.mssql(100) > Watermark.mssql(99))
  }

  test("file store persists atomically and survives reload") {
    val dir = java.nio.file.Files.createTempDirectory("wmstore").toString
    val store = new FileWatermarkStore(dir)
    assert(store.get("t1").isEmpty)
    val wm = Watermark.blob(123456789L)
    store.set("t1", wm)
    assert(store.get("t1").contains(wm))
    val store2 = new FileWatermarkStore(dir)
    assert(store2.get("t1").contains(wm))
  }

  test("file store refuses a corrupt watermark file (no silent fresh start)") {
    val dir = java.nio.file.Files.createTempDirectory("wmcorrupt").toString
    val store = new FileWatermarkStore(dir)
    store.set("t1", Watermark.mssql(7L))
    val p = java.nio.file.Paths.get(dir, "t1.watermark.json")
    java.nio.file.Files.write(p, "garbage{".getBytes("UTF-8"))
    val e = intercept[IllegalStateException](store.get("t1"))
    assert(e.getMessage.contains("corrupt watermark"))
  }

  test("blob boundary overflow is an explicit marker, never inferred from size") {
    import Watermark.{BlobBoundaryCap, BlobBoundaryOverflow}
    def hashes(n: Int): Seq[String] = (0 until n).map(i => f"$i%08x")
    // cap−1 legitimate hashes: stored COMPLETE, no marker — the reader
    // keeps inclusive semantics and can still admit a late same-timestamp
    // file (the loss mode the old size==cap inference reintroduced)
    val full = Watermark.blobWithBoundary(1000L, hashes(BlobBoundaryCap - 1))
    val (t1, b1) = Watermark.blobParts(full.version).get
    assert(t1 == 1000L && b1.size == BlobBoundaryCap - 1 &&
      !b1.contains(BlobBoundaryOverflow))
    // cap hashes → genuinely truncating → the marker REPLACES the set
    val over = Watermark.blobWithBoundary(1000L, hashes(BlobBoundaryCap))
    val (_, b2) = Watermark.blobParts(over.version).get
    assert(b2 == Set(BlobBoundaryOverflow),
      "overflow must be the explicit marker, not a full-size hash set")
    // once overflowed, extending the same boundary timestamp stays
    // overflowed (exclusive semantics are sticky for that timestamp)
    val carried = Watermark.blobWithBoundary(1000L,
      b2.toSeq ++ hashes(3))
    assert(Watermark.blobParts(carried.version).get._2 == Set(BlobBoundaryOverflow))
    // duplicates below the cap don't trip the overflow decision
    val dup = Watermark.blobWithBoundary(1000L,
      hashes(BlobBoundaryCap - 1) ++ hashes(BlobBoundaryCap - 1))
    assert(Watermark.blobParts(dup.version).get._2.size == BlobBoundaryCap - 1)
  }

  test("naming discipline: prefixes and membership") {
    val st = Naming.stagingTable("my-stream")
    assert(Naming.isStagingFor("my-stream", st))
    assert(!Naming.isBackfillFor("my-stream", st))
    assert(Naming.shardTable("s", "b1", 3) == "backfill__s__b1__shard__3")
  }
}

class TablePropertyWatermarkSpec extends SparkSpec {

  test("watermark round-trips through ALTER TABLE SET TBLPROPERTIES") {
    val wh = java.nio.file.Files.createTempDirectory("wmwh").toString
    spark.sql(s"CREATE TABLE wm_t (id BIGINT) USING parquet LOCATION '$wh/wm_t'")
    try {
      val store = new TablePropertyWatermarkStore(spark)
      assert(store.get("wm_t").isEmpty)
      val wm = Watermark.mssql(42L)
      store.set("wm_t", wm)
      assert(store.get("wm_t").contains(wm))
      val wm2 = Watermark.mssql(43L)
      store.set("wm_t", wm2) // overwrite
      assert(store.get("wm_t").contains(wm2))
    } finally spark.sql("DROP TABLE wm_t")
  }

  test("camelCase to snake_case") {
    assert(Naming.camelCaseToSnakeCase("SinkCreatedOn") == "sink_created_on")
    assert(Naming.camelCaseToSnakeCase("versionnumber") == "versionnumber")
    assert(Naming.camelCaseToSnakeCase("myField2X") == "my_field2_x")
  }
}
