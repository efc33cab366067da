package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DriftSpec extends SparkSpec {
  import spark.implicits._

  test("identical distributions score PSI 0") {
    val df = (1 to 100).map(i => i % 10 * 100).toDF("v")
    val out = Drift.psiNumeric(df, df, col("v"), Seq(150.0, 450.0, 750.0))
    val totals = out.select($"psi_total").as[Double].collect().distinct.toSeq
    assert(totals == Seq(0.0))
  }

  test("a shifted distribution scores positive PSI, concentrated in the moved buckets") {
    val ref = (1 to 100).map(_ => 100).toDF("v")
    val cur = (1 to 100).map(_ => 800).toDF("v")
    val out = Drift.psiNumeric(ref, cur, col("v"), Seq(150.0, 450.0, 750.0))
      .orderBy($"bucket").collect()
    val total = out.head.getAs[Double]("psi_total")
    assert(total > 1.0, s"disjoint distributions must score large PSI, got $total")
    // bucket 0 (all ref) and bucket 3 (all cur) carry the contribution
    val byBucket = out.map(r => r.getAs[Long]("bucket") -> r.getAs[Double]("psi_term")).toMap
    assert(byBucket(0L) > 0.5 && byBucket(3L) > 0.5)
  }

  test("nulls get their own tracked bucket (-1)") {
    val ref = Seq(Some(100), Some(200), None).toDF("v")
    val cur = Seq(Some(100), Some(200), Some(300)).toDF("v")
    val out = Drift.psiNumeric(ref, cur, col("v"), Seq(150.0))
    val buckets = out.select($"bucket").as[Long].collect().sorted.toSeq
    assert(buckets.contains(-1L))
  }

  test("categorical PSI covers categories absent on one side without infinities") {
    val ref = Seq("en", "en", "de").toDF("lang")
    val cur = Seq("en", "fr", "fr").toDF("lang")
    val out = Drift.psiCategorical(ref, cur, col("lang")).collect()
    assert(out.length == 3) // en, de, fr
    assert(out.forall(r => !r.getAs[Double]("psi_term").isInfinite))
    assert(out.forall(r => !r.getAs[Double]("psi_total").isNaN))
  }

  test("psiAgainstFrozen is bit-identical to psiNumeric over the same reference") {
    val ref = (1 to 200).map(i => i * 7 % 900).toDF("v")
    val cur = (1 to 150).map(i => i * 13 % 1100).toDF("v")
    val edges = Seq(150.0, 450.0, 750.0)
    val direct = Drift.psiNumeric(ref, cur, col("v"), edges)
      .orderBy($"bucket").collect().toSeq
    val frozen = Drift.freezeNumeric(ref, col("v"), edges)
    val monitored = Drift.psiAgainstFrozen(cur, col("v"), frozen)
      .orderBy($"bucket").collect().toSeq
    assert(monitored == direct)
  }

  test("bucketOf counts edges at and below the value") {
    val df = Seq(50, 150, 450, 800).toDF("v")
    val out = df.select(Drift.bucketOf(col("v"), Seq(100.0, 400.0, 700.0)).as("b"))
      .as[Long].collect().toSeq
    assert(out == Seq(0L, 1L, 2L, 3L))
  }
}

class EvalMetricsSpec extends SparkSpec {
  import spark.implicits._

  private def metrics(ranked: Seq[(Long, Long)], gold: Seq[Long], k: Int = 10) =
    Retrieval.evalMetrics(ranked.toDF("id", "rank"), gold.toDF("id"), "id", "rank", k)
      .as[(Double, Double, Double, Long)].head()

  test("perfect ranking scores 1.0 across the board") {
    val (mrr, p, ndcg, gn) = metrics(
      ranked = (1L to 10L).map(i => (i, i)), gold = (1L to 10L))
    assert(mrr == 1.0 && p == 1.0 && ndcg == 1.0 && gn == 10L)
  }

  test("empty gold scores 0 without dividing by zero") {
    val (mrr, p, ndcg, gn) = metrics(ranked = Seq((1L, 1L)), gold = Seq.empty)
    assert(mrr == 0.0 && p == 0.0 && ndcg == 0.0 && gn == 0L)
  }

  test("no ranked hit scores 0 even with a non-empty gold") {
    val (mrr, p, ndcg, gn) = metrics(ranked = Seq((1L, 1L), (2L, 2L)),
      gold = Seq(99L, 98L))
    assert(mrr == 0.0 && p == 0.0 && ndcg == 0.0 && gn == 2L)
  }

  test("single gold hit at rank 4: mrr 1/4, ndcg = 1/log2(5) against idcg 1") {
    val (mrr, p, ndcg, _) = metrics(
      ranked = (1L to 10L).map(i => (i, i)), gold = Seq(4L))
    assert(mrr == 0.25)
    assert(p == 0.1)
    val expect = BigDecimal(1.0 / (math.log(5) / math.log(2)))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(ndcg == expect)
  }
}

class RrfFuseSpec extends SparkSpec {
  import spark.implicits._

  test("a document in both lists outranks single-list documents") {
    val lex = Seq((1L, 10.0), (2L, 9.0), (3L, 8.0)).toDF("id", "score")
    val sem = Seq((2L, 0.9), (4L, 0.8)).toDF("id", "score")
    val out = Retrieval.rrfFuse(Seq(lex, sem), "id", "score", k0 = 60, topK = 10)
      .collect()
    assert(out.head.getLong(0) == 2L) // rank 2 + rank 1 beats any single list
    assert(out.head.getAs[Long]("n_lists") == 2L)
    // rrf(2) = 1/(60+2) + 1/(60+1)
    val expected = BigDecimal(1.0 / 62 + 1.0 / 61)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out.head.getAs[Double]("rrf_score") == expected)
  }

  test("ties within a list break on id, deterministically") {
    val l = Seq((5L, 1.0), (3L, 1.0)).toDF("id", "score")
    val out = Retrieval.rrfFuse(Seq(l), "id", "score", k0 = 60, topK = 2).collect()
    // id 3 gets rank 1 (tiebreak asc), so it fuses higher
    assert(out.map(_.getLong(0)).toSeq == Seq(3L, 5L))
  }
}
