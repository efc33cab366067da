package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BpeSpec extends SparkSpec {
  import spark.implicits._

  private val samples = Seq(
    "the quick brown fox jumps over the lazy dog",
    "Hello, world! It's 2026.",
    "naïve café — résumé",                 // multi-byte UTF-8
    "日本語のテキストと emoji 🚀🔥",          // CJK + surrogate pairs
    "  leading and   irregular   spaces  ",
    "line\nbreaks\r\nand\ttabs",
    "")

  private lazy val trained = Bpe.train(samples ++ samples, 64)

  test("byte-level round trip: decode(encode(s)) == s for every string") {
    for (vocab <- Seq(BpeVocab.bytes, trained)) {
      val out = samples.toDF("s")
        .select($"s", Bpe.decode(Bpe.encode($"s", vocab), vocab).as("rt"))
        .collect()
      out.foreach(r => assert(r.getString(1) == r.getString(0),
        s"round trip broke for '${r.getString(0)}'"))
    }
  }

  test("decode skips null and out-of-vocab ids instead of decoding garbage") {
    // a null element reads as 0 through ArrayData.getInt — unguarded it
    // would silently decode as byte 0's token ('Ā' in the byte-char
    // alphabet), not as a skipped id
    val ids = Seq((Seq[Integer](104, null, 105, 99, -7, 9999999), 1L)).toDF("ids", "x")
    val out = ids.select(Bpe.decode($"ids", BpeVocab.bytes).as("s")).head().getString(0)
    assert(out == "hic", s"expected 'hic', got '$out' (${out.map(_.toInt).mkString(",")})")
  }

  test("classic BPE example trains the known merge sequence") {
    // aaabdaaabac: aa (freq 4), then ab (tie broken lexicographically),
    // then aa+ab — the textbook Sennrich et al. walk-through
    val v = Bpe.train(Seq("aaabdaaabac"), 3)
    assert(v.merges == Vector(("a", "a"), ("a", "b"), ("aa", "ab")))
    val ids = Seq("aaabdaaabac").toDF("s")
      .select(Bpe.encode($"s", v)).as[Seq[Int]].head()
    // aaab d aaab a c
    assert(ids.length == 5)
    assert(ids.head == 256 + 2 && ids(2) == 256 + 2, "merged token id = 256 + rank")
  }

  test("training is deterministic and merges.txt round-trips") {
    val a = Bpe.train(samples, 32)
    val b = Bpe.train(samples.reverse, 32) // corpus order must not matter
    assert(a.merges == b.merges)
    assert(BpeVocab.fromMergesText(a.toMergesText).merges == a.merges)
    assert(BpeVocab.fromMergesText("#version 1\n\n" + a.toMergesText).merges == a.merges)
  }

  test("token counts: bytes vocab counts UTF-8 bytes; merges only shrink counts") {
    val df = samples.filter(_.nonEmpty).toDF("s").select(
      octet_length($"s").as("bytes"),
      Bpe.tokenCount($"s", BpeVocab.bytes).as("base"),
      Bpe.tokenCount($"s", trained).as("merged"),
      size(Bpe.encode($"s", trained)).as("viaEncode"))
    df.collect().foreach { r =>
      assert(r.getAs[Int]("base") == r.getAs[Int]("bytes"))
      assert(r.getAs[Int]("merged") <= r.getAs[Int]("base"))
      assert(r.getAs[Int]("merged") == r.getAs[Int]("viaEncode"),
        "count expression must agree with size(encode)")
    }
    // the trained vocab actually compresses the corpus it saw
    val totals = samples.filter(_.nonEmpty).toDF("s").select(
      sum(Bpe.tokenCount($"s", BpeVocab.bytes)).cast("long").as("b"),
      sum(Bpe.tokenCount($"s", trained)).cast("long").as("m")).head()
    assert(totals.getLong(1) < totals.getLong(0))
  }

  test("token chunks reconstruct the document exactly at overlap 0") {
    for (vocab <- Seq(BpeVocab.bytes, trained)) {
      val out = samples.filter(_.nonEmpty).toDF("s")
        .select($"s", concat_ws("", Bpe.tokenChunks($"s", vocab, 8, 0)).as("joined"))
        .collect()
      out.foreach(r => assert(r.getString(1) == r.getString(0)))
    }
  }

  test("overlapping chunks respect window size and tail suppression") {
    val text = "abcdefghijklmnopqrstuvwxyz" // 26 byte tokens
    val chunks = Seq(text).toDF("s")
      .select(Bpe.tokenChunks($"s", BpeVocab.bytes, 10, 4)).as[Seq[String]].head()
    // step 6: [1..10], [7..16], [13..22], [19..26] -> 4 chunks
    assert(chunks == Seq("abcdefghij", "ghijklmnop", "mnopqrstuv", "stuvwxyz"))
    val empty = Seq("").toDF("s")
      .select(Bpe.tokenChunks($"s", BpeVocab.bytes, 10, 4)).as[Seq[String]].head()
    assert(empty.isEmpty)
  }

  test("trainFromDataFrame is bounded and deterministic across partitioning") {
    val docs = spark.read.parquet(s"$sf/documents.parquet").select("text")
    val v1 = Bpe.trainFromDataFrame(docs, "text", 16, maxSampleRows = 256)
    val v2 = Bpe.trainFromDataFrame(docs.repartition(7), "text", 16, maxSampleRows = 256)
    assert(v1.merges == v2.merges, "sample must be partition-independent")
    assert(v1.merges.size == 16)
  }

  test("distributed training produces the EXACT local merge sequence (full corpus)") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("text").limit(48).cache()
    val local = Bpe.train(
      docs.as[String](org.apache.spark.sql.Encoders.STRING).collect().toSeq, 24)
    // repartitioned input + checkpointEvery=5 exercises partition
    // independence and the mid-run lineage cut in one run; equality with
    // the local sequence subsumes a separate determinism check
    val dist = Bpe.trainDistributed(docs.repartition(5), "text", 24,
      checkpointEvery = 5)
    assert(dist.merges == local.merges,
      "distributed merge sequence must equal the local trainer's")
    docs.unpersist()
  }

  test("distributed training exhausts early on a tiny corpus, like the local trainer") {
    val tiny = Seq("aa aa", "aa").toDF("text")
    val local = Bpe.train(Seq("aa aa", "aa"), 10)
    val dist = Bpe.trainDistributed(tiny, "text", 10)
    assert(dist.merges == local.merges)
    assert(dist.merges.size < 10, "a tiny corpus must run out of pairs early")
  }
}
