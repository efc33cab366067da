package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private def docs = spark.read.parquet(s"$sf/documents.parquet")

  test("thresholdHex maps fractions to sortable 4-hex bounds, 'g' at 1.0") {
    assert(Sampling.thresholdHex(0.0) == "0000")
    assert(Sampling.thresholdHex(0.5) == "8000")
    assert(Sampling.thresholdHex(1.0) == "g")
    // "g" sorts above every 4-hex-char bucket; "10000" would not
    assert("ffff" < Sampling.thresholdHex(1.0))
    assert("ffff" > "10000")
  }

  test("sampleByHash: deterministic, nested fractions, full/empty extremes") {
    val ids = (0L until 2000L).toDF("id")
    val s05 = Sampling.sampleByHash(ids, col("id"), 0.05).as[Long].collect().toSet
    val s20 = Sampling.sampleByHash(ids, col("id"), 0.20).as[Long].collect().toSet
    // per-key determinism: a smaller sample is a subset of a larger one
    assert(s05.subsetOf(s20))
    // fraction approximately honored (binomial, generous 3-sigma bounds)
    assert(s05.size > 50 && s05.size < 150, s"5% of 2000 was ${s05.size}")
    assert(s20.size > 320 && s20.size < 480, s"20% of 2000 was ${s20.size}")
    assert(Sampling.sampleByHash(ids, col("id"), 1.0).count() == 2000)
    assert(Sampling.sampleByHash(ids, col("id"), 0.0).count() == 0)
    // re-run returns the identical membership
    val again = Sampling.sampleByHash(ids, col("id"), 0.05).as[Long].collect().toSet
    assert(again == s05)
  }

  test("assignSplit covers every row, splits are disjoint hash ranges") {
    val out = docs.select(col("doc_id"),
      Sampling.assignSplit(col("doc_id"), Seq("test" -> 0.05, "val" -> 0.05)).as("split"))
    val counts = out.groupBy("split").count().as[(String, Long)].collect().toMap
    assert(counts.values.sum == docs.count())
    assert(counts.keySet.subsetOf(Set("train", "val", "test")))
    assert(counts("train") > counts.getOrElse("val", 0L))
    // growing the corpus never reassigns: split of a key is a pure function
    val twice = out.union(out).distinct().count()
    assert(twice == docs.count())
  }

  test("mixtureWeights: budget shares, per-source cap at 1.0, empty sources") {
    val tokens = Map("web" -> 1000L, "code" -> 100L, "books" -> 0L)
    val rates = Sampling.mixtureWeights(tokens,
      Map("web" -> 0.5, "code" -> 0.4, "books" -> 0.1), tokenBudget = 400L)
    assert(rates("web") == 0.2, "400·0.5/1000")
    assert(rates("code") == 1.0, "share (160) exceeds the source (100) → capped")
    assert(rates("books") == 1.0, "no measured tokens → keep everything")
    // weights need not sum to 1; shares are independent
    val partial = Sampling.mixtureWeights(Map("a" -> 200L), Map("a" -> 0.25), 400L)
    assert(partial("a") == 0.5)
  }

  test("mixtureSampleByBudget hits the token budget and excludes unlisted sources") {
    val rows = (0L until 1000L)
      .map(i => (i, "tok " * ((i % 7).toInt + 1), s"s${i % 4}"))
      .toDF("doc_id", "text", "source")
    val tok = length(col("text")).cast("long") // any per-row count column
    val out = Sampling.mixtureSampleByBudget(rows, col("doc_id"), col("source"),
      tok, Map("s0" -> 0.6, "s1" -> 0.4), tokenBudget = 1500L)
    assert(out.filter(!col("source").isin("s0", "s1")).count() == 0,
      "a budgeted mixture enumerates its sources")
    val got = out.agg(sum(tok)).as[Long].collect().head
    // per-source binomial noise: generous band around the 1500-token target
    assert(got > 700 && got < 2300, s"sampled token mass $got vs budget 1500")
    // determinism + subset-on-smaller-budget (per-key hash thresholds nest)
    val smaller = Sampling.mixtureSampleByBudget(rows, col("doc_id"), col("source"),
      tok, Map("s0" -> 0.6, "s1" -> 0.4), tokenBudget = 700L)
      .select("doc_id").as[Long].collect().toSet
    val bigger = out.select("doc_id").as[Long].collect().toSet
    assert(smaller.subsetOf(bigger))
  }

  test("shuffleAssign: permutation, dense in-shard positions, partition-independent") {
    val out = Sampling.shuffleAssign(docs, col("doc_id"), shards = 8)
      .select(col("doc_id"), col("shard"), col("pos"))
    val rows = out.as[(Long, Long, Long)].collect()
    // every document appears exactly once with a shard in range
    assert(rows.length == docs.count())
    assert(rows.map(_._1).distinct.length == rows.length)
    assert(rows.forall(r => r._2 >= 0 && r._2 < 8))
    // positions are dense 1..n within each shard (a contiguous shard file)
    rows.groupBy(_._2).foreach { case (shard, g) =>
      assert(g.map(_._3).sorted.toSeq == (1L to g.length).toSeq,
        s"shard $shard positions not dense")
    }
    // layout is a pure function of the key: physical partitioning is irrelevant
    val again = Sampling.shuffleAssign(docs.repartition(13), col("doc_id"), shards = 8)
      .select(col("doc_id"), col("shard"), col("pos"))
      .as[(Long, Long, Long)].collect()
    assert(again.sortBy(_._1).toSeq == rows.sortBy(_._1).toSeq)
    // the permutation actually shuffles: in-shard neighbors are not id-adjacent
    val byShardPos = rows.sortBy(r => (r._2, r._3))
    val adjacentIds = byShardPos.zip(byShardPos.drop(1))
      .count { case (a, b) => a._2 == b._2 && b._1 - a._1 == 1 }
    assert(adjacentIds < rows.length / 10, s"$adjacentIds id-adjacent neighbors")
  }

  test("shard-manifest checksum detects a single changed document") {
    def manifest(d: org.apache.spark.sql.DataFrame) =
      Sampling.shuffleAssign(d, col("doc_id"), shards = 4)
        .groupBy(col("shard"))
        .agg(sum(pmod(TextFunctions.md5Hash60(col("text")), lit(2147483648L)))
          .as("checksum"))
        .as[(Long, Long)].collect().toMap
    val base = manifest(docs)
    val tampered = manifest(docs.withColumn("text",
      when(col("doc_id") === 7L, lit("tampered")).otherwise(col("text"))))
    val changedShard = Sampling.shuffleAssign(docs.filter(col("doc_id") === 7L),
      col("doc_id"), shards = 4).select(col("shard")).as[Long].head()
    assert(base(changedShard) != tampered(changedShard),
      "the tampered shard's checksum must move")
    assert((base - changedShard) == (tampered - changedShard),
      "untouched shards' checksums must not move")
  }

  test("weightedSample: weight-proportional, scale-invariant, deterministic") {
    val ids = (0L until 500L).toDF("doc_id")
    // heavy block: ids < 50 carry 1000x the weight — they should dominate
    val weighted = ids.withColumn("w",
      when(col("doc_id") < 50, 1000.0).otherwise(1.0))
    val picked = Sampling.weightedSample(weighted, col("doc_id"), col("w"), k = 50)
      .select($"doc_id").as[Long].collect().toSet
    assert(picked.count(_ < 50) >= 40,
      s"1000x-weighted block must dominate the sample, got ${picked.count(_ < 50)}/50")
    // Efraimidis-Spirakis keys are invariant under uniform weight scaling
    // (u^(1/(cw)) is a monotone transform of u^(1/w))
    val scaled = Sampling.weightedSample(
      weighted.withColumn("w", col("w") * 2), col("doc_id"), col("w"), k = 50)
      .select($"doc_id").as[Long].collect().toSet
    assert(scaled == picked, "uniform weight scaling must not change the sample")
    // equal weights degrade to the plain hash sample (top-k by u)
    val eq = Sampling.weightedSample(ids.withColumn("w", lit(1.0)),
      col("doc_id"), col("w"), k = 20).select($"doc_id").as[Long].collect().toSet
    val eq2 = Sampling.weightedSample(ids.withColumn("w", lit(7.0)),
      col("doc_id"), col("w"), k = 20).select($"doc_id").as[Long].collect().toSet
    assert(eq == eq2)
    // w <= 0 rows are excluded, never silently ranked
    val mixed = ids.withColumn("w",
      when(col("doc_id") < 490, 0.0).otherwise(1.0))
    val onlyPositive = Sampling.weightedSample(mixed, col("doc_id"), col("w"), k = 20)
      .select($"doc_id").as[Long].collect().toSet
    assert(onlyPositive.forall(_ >= 490) && onlyPositive.size == 10,
      s"zero-weight rows must carry no draw, got $onlyPositive")
  }

  test("denseIds: exact 0..n-1 bijection, stable under repartitioning") {
    val ids = (0L until 257L).toDF("doc_id")
    val out = Sampling.denseIds(ids, col("doc_id"), shards = 8)
      .select($"doc_id", $"dense_id").as[(Long, Long)].collect().toMap
    assert(out.values.toSeq.sorted == (0L until 257L).toSeq,
      "dense ids must be a bijection onto 0..n-1")
    val re = Sampling.denseIds(ids.repartition(13), col("doc_id"), shards = 8)
      .select($"doc_id", $"dense_id").as[(Long, Long)].collect().toMap
    assert(re == out, "ids depend on the key hash, not physical layout")
  }

  test("negativePairs: k per anchor, never self, in range, deterministic") {
    val ids = (0L until 100L).toDF("doc_id")
    val out = Sampling.negativePairs(ids, "doc_id", k = 3)
      .as[(Long, Long, Long)].collect().toSeq
    assert(out.length == 300)
    assert(out.forall { case (a, _, n) => n != a && n >= 0 && n < 100 },
      "negatives must be other in-range rows")
    assert(out.groupBy(_._1).forall(_._2.map(_._2).sorted == Seq(0L, 1L, 2L)))
    val again = Sampling.negativePairs(ids, "doc_id", k = 3)
      .as[(Long, Long, Long)].collect().toSeq
    assert(again.toSet == out.toSet, "same (anchor, pair_idx) → same negative")
    // rough uniformity: every row should be drawn as a negative somewhere
    val drawn = out.map(_._3).distinct.size
    assert(drawn > 80, s"expected wide coverage of the corpus, got $drawn/100")
  }

  test("negativePairs on a 1-row corpus fails loudly in BOTH SQL modes") {
    // the draw is __h % (n−1): with n=1 the raw modulo would null out
    // silently (non-ANSI) or raise an opaque DivideByZeroException BEFORE
    // the assert_true rider evaluates (ANSI) — the guarded divisor keeps
    // the clear message as the failure in either mode
    val one = Seq(0L).toDF("doc_id")
    for (ansi <- Seq("false", "true")) {
      val prev = spark.conf.get("spark.sql.ansi.enabled", "false")
      spark.conf.set("spark.sql.ansi.enabled", ansi)
      try {
        val e = intercept[Exception] {
          Sampling.negativePairs(one, "doc_id", k = 2).collect()
        }
        def messages(t: Throwable): Seq[String] =
          Option(t).toSeq.flatMap(x =>
            Option(x.getMessage).toSeq ++ messages(x.getCause))
        assert(messages(e).exists(_.contains("at least 2 rows")),
          s"ansi=$ansi: expected the corpus-size message, got $e")
      } finally spark.conf.set("spark.sql.ansi.enabled", prev)
    }
  }

  test("mixtureSample applies per-group rates with default for unlisted") {
    val out = Sampling.mixtureSample(docs, col("doc_id"), col("source"),
      Map("src0" -> 1.0, "src1" -> 0.0), defaultRate = 0.5)
    val bySrc = out.groupBy("source").count().as[(String, Long)].collect().toMap
    val totals = docs.groupBy("source").count().as[(String, Long)].collect().toMap
    assert(bySrc.getOrElse("src0", 0L) == totals("src0"), "rate 1.0 keeps all")
    assert(!bySrc.contains("src1"), "rate 0.0 keeps none")
    val others = totals.keys.toSeq.filter(s => s != "src0" && s != "src1")
    val kept = others.map(s => bySrc.getOrElse(s, 0L)).sum.toDouble
    val all = others.map(totals).sum.toDouble
    assert(kept / all > 0.3 && kept / all < 0.7, s"default 0.5 kept ${kept / all}")
  }
}
