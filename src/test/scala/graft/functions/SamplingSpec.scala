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
