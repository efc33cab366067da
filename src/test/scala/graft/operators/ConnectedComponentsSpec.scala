package graft.operators

import graft.SparkSpec

class ConnectedComponentsSpec extends SparkSpec {
  import spark.implicits._

  private def components(edges: (Long, Long)*): Map[Long, Long] =
    ConnectedComponents.minLabel(edges.toDF("id_a", "id_b"))
      .as[(Long, Long)].collect().toMap

  test("chains, triangles and isolated pairs label to the component minimum") {
    val m = components((1L, 2L), (2L, 3L), (3L, 4L), // chain
      (10L, 11L), (11L, 12L), (10L, 12L),            // triangle
      (20L, 21L))                                     // isolated pair
    assert(m == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 20L -> 20L, 21L -> 20L))
  }

  test("long path converges within the iteration cap") {
    val path = (0L until 20L).map(i => (i, i + 1))
    val m = components(path: _*)
    assert(m.values.toSet == Set(0L), "every vertex reaches the global min")
  }

  test("edge direction never matters") {
    val m = components((5L, 1L), (1L, 9L), (9L, 3L))
    assert(m.values.toSet == Set(1L))
    assert(m.keySet == Set(1L, 3L, 5L, 9L))
  }

  test("both paths release every scratch checkpoint (block-store hygiene)") {
    val sc = spark.sparkContext
    val before = sc.getPersistentRDDs.keySet.toSet
    val edges = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id_a", "id_b")

    val localOut = ConnectedComponents.minLabel(edges)
    localOut.count()
    assert((sc.getPersistentRDDs.keySet.toSet -- before).isEmpty,
      "driver path must leave zero block-store state")

    val distOut = ConnectedComponents.minLabel(edges, driverMaxEdges = 0L)
    distOut.count()
    val leaked = sc.getPersistentRDDs.keySet.toSet -- before
    assert(leaked.size <= 1,
      s"distributed path may keep only the returned labels' blocks, leaked: $leaked")
    graft.core.Checkpoints.release(distOut)
    assert((sc.getPersistentRDDs.keySet.toSet -- before).isEmpty,
      "releasing the returned frame must free the last blocks")
  }

  test("distributed path produces identical labels to the local path") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L), (11L, 12L),
      (10L, 12L), (20L, 21L), (30L, 7L), (7L, 40L)).toDF("id_a", "id_b")
    val local = ConnectedComponents.minLabel(edges)
      .as[(Long, Long)].collect().toMap
    val distributed = ConnectedComponents.minLabel(edges, driverMaxEdges = 0L)
      .as[(Long, Long)].collect().toMap
    assert(local == distributed)
  }
}
