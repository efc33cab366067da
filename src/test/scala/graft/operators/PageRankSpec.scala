package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PageRankSpec extends SparkSpec {
  import spark.implicits._

  private def ranksOf(edges: Seq[(String, String)], iters: Int): Map[String, Double] =
    PageRank.run(edges.toDF("src", "dst"), "src", "dst", iters)
      .as[(String, Double)].collect().toMap

  test("a directed ring is the fixed point: every rank stays 1.0") {
    val ring = Seq("a" -> "b", "b" -> "c", "c" -> "a")
    for (iters <- Seq(0, 1, 4)) {
      val r = ranksOf(ring, iters)
      assert(r.keySet === Set("a", "b", "c"))
      r.values.foreach(v => assert(math.abs(v - 1.0) < 1e-12))
    }
  }

  test("star graph concentrates rank on the hub, matches hand-computed values") {
    // a, b, c → hub; hub → a. outdeg(a)=outdeg(b)=outdeg(c)=outdeg(hub)=1
    val star = Seq("a" -> "hub", "b" -> "hub", "c" -> "hub", "hub" -> "a")
    val r1 = ranksOf(star, 1)
    // rank1(hub) = 0.15 + 0.85*(1+1+1) = 2.70 ; rank1(a) = 0.15 + 0.85*1 = 1.0
    // b, c receive nothing: rank1 = 0.15
    assert(math.abs(r1("hub") - 2.70) < 1e-12)
    assert(math.abs(r1("a") - 1.00) < 1e-12)
    assert(math.abs(r1("b") - 0.15) < 1e-12)
    assert(math.abs(r1("c") - 0.15) < 1e-12)
    val r2 = ranksOf(star, 2)
    // rank2(hub) = 0.15 + 0.85*(1.0 + 0.15 + 0.15) = 1.255
    // rank2(a)   = 0.15 + 0.85*2.70 = 2.445
    assert(math.abs(r2("hub") - 1.255) < 1e-12)
    assert(math.abs(r2("a") - 2.445) < 1e-12)
  }

  test("dangling vertices appear with the floor rank and split contributions by out-degree") {
    // a → b, a → c: a is dangling-in (nobody links to it), b and c dangling-out
    val r = ranksOf(Seq("a" -> "b", "a" -> "c"), 3)
    assert(math.abs(r("a") - 0.15) < 1e-12, "no in-links → floor after iteration 1")
    // rank1(b) = 0.15 + 0.85*(1/2) = 0.575; rank2+(b) = 0.15 + 0.85*(0.15/2)
    val expected = 0.15 + 0.85 * (0.15 / 2)
    assert(math.abs(r("b") - expected) < 1e-12)
    assert(r("b") === r("c"), "equal split across a's two out-edges")
  }

  test("total rank mass is conserved when no vertex dangles") {
    // strongly 1-out-regular graph (a permutation): mass must stay n exactly
    val perm = Seq("a" -> "b", "b" -> "c", "c" -> "d", "d" -> "a")
    val total = ranksOf(perm, 5).values.sum
    assert(math.abs(total - 4.0) < 1e-9)
  }

  test("runManaged releases every frame the run persisted") {
    // start from a clean slate so the assertion isolates THIS run's state
    spark.catalog.clearCache()
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
    assert(spark.sparkContext.getPersistentRDDs.isEmpty)

    val edges = Seq("a" -> "b", "b" -> "c", "c" -> "a", "a" -> "c").toDF("src", "dst")
    val managed = PageRank.runManaged(edges, "src", "dst", iterations = 3)
    val ranks = managed.ranks.as[(String, Double)].collect().toMap
    assert(ranks.keySet === Set("a", "b", "c"))
    assert(spark.sparkContext.getPersistentRDDs.nonEmpty,
      "the run should have persisted its edge/link/vertex frames")

    managed.release()
    assert(spark.sparkContext.getPersistentRDDs.isEmpty,
      "release() must drop every persisted frame the run created")

    // ranks stay valid post-release: a fresh action recomputes from edges
    val recomputed = managed.ranks.as[(String, Double)].collect().toMap
    assert(recomputed === ranks)
    assert(spark.sparkContext.getPersistentRDDs.isEmpty,
      "recomputation after release must not re-persist")
  }
}
