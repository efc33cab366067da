package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Pins the Misra–Gries guarantees stated at
  * [[graft.functions.expressions.MisraGriesAgg]] (Misra & Gries 1982;
  * merged form per Agarwal et al. 2013, "Mergeable Summaries"): over a
  * stream of N tokens summarized at `capacity`,
  *
  *   (1) every token with true frequency > N/capacity appears;
  *   (2) for each kept token: trueCount − N/capacity ≤ estimate ≤ trueCount;
  *   (3) at most `capacity` entries, whatever the input size;
  *
  * and that the guarantees survive Spark's partial-aggregation path
  * (map-side summaries serialized, shuffled, merged) — checked by running
  * the same stream at several partition counts, which routes different
  * token subsets through different partial buffers.
  */
class MisraGriesSpec extends SparkSpec {
  import spark.implicits._

  // Zipf-ish adversarial stream: token_i occurs 2^(12-i) times for the 8
  // head tokens, plus 3000 singleton tail tokens that force decrements.
  private val stream: Seq[String] = {
    val head = (0 until 8).flatMap(i => Seq.fill(1 << (12 - i))(s"head_$i"))
    val tail = (0 until 3000).map(i => s"tail_$i")
    // deterministic interleave (no Random: order affects nothing pinned)
    val all = head ++ tail
    all.indices.sortBy(i => (i * 2654435761L) % all.size).map(all)
  }
  private val trueCounts: Map[String, Long] =
    stream.groupBy(identity).map { case (t, xs) => t -> xs.size.toLong }
  private val n: Long = stream.size.toLong

  private def summarize(capacity: Int, partitions: Int): Map[String, Long] = {
    val df = stream.toDF("token").repartition(partitions)
    val rows = df
      .agg(TextFunctions.misraGries(col("token"), capacity).as("mg"))
      .select(explode(col("mg")).as("e"))
      .select(col("e.token"), col("e.est_count"))
      .collect()
    rows.map { case Row(t: String, c: Long) => t -> c }.toMap
  }

  for (partitions <- Seq(1, 4, 7); capacity <- Seq(16, 64)) {
    test(s"MG guarantees hold at capacity=$capacity over $partitions partitions") {
      val est = summarize(capacity, partitions)
      val err = n.toDouble / capacity

      assert(est.size <= capacity, "(3) bounded state")
      trueCounts.foreach { case (tok, freq) =>
        if (freq > err)
          assert(est.contains(tok), s"(1) $tok freq=$freq > N/cap=$err missing")
      }
      est.foreach { case (tok, e) =>
        val truth = trueCounts(tok)
        assert(e <= truth, s"(2) $tok estimate $e overshoots true $truth")
        assert(e >= truth - err, s"(2) $tok estimate $e below ${truth - err}")
      }
    }
  }

  test("nulls are skipped like built-in aggregates") {
    val est = Seq(Some("a"), None, Some("a"), Some("b"), None)
      .toDF("token")
      .agg(TextFunctions.misraGries(col("token"), 4).as("mg"))
      .select(explode(col("mg")).as("e"))
      .select(col("e.token"), col("e.est_count"))
      .as[(String, Long)]
      .collect()
      .toMap
    assert(est === Map("a" -> 2L, "b" -> 1L))
  }

  test("output is sorted by (est_count desc, token asc) and SQL-registered") {
    graft.GraftExtensions.register(spark)
    Seq("b", "a", "a", "c", "c").toDF("token").createOrReplaceTempView("mg_in")
    val out = spark
      .sql("SELECT graft_misra_gries(token, 10) AS mg FROM mg_in")
      .select(explode(col("mg")).as("e"))
      .select(col("e.token"), col("e.est_count"))
      .as[(String, Long)]
      .collect()
      .toSeq
    assert(out === Seq(("a", 2L), ("c", 2L), ("b", 1L)))
  }
}
