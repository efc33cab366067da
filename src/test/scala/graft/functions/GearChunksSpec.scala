package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

class GearChunksSpec extends SparkSpec {
  import spark.implicits._

  // deterministic pseudo-random payload (no RNG in tests)
  private def payload(n: Int, seed: Int): Array[Byte] = {
    val out = new Array[Byte](n)
    var x = seed * 2654435761L + 1
    for (i <- 0 until n) {
      x = x * 6364136223846793005L + 1442695040888963407L
      out(i) = (x >>> 33).toByte
    }
    out
  }

  private def chunksOf(bytes: Array[Byte]): Seq[(Long, Long, Long)] =
    Seq(Tuple1(bytes)).toDF("p")
      .select(Multimodal.cdcChunks($"p", minSize = 64, avgBits = 8, maxSize = 1024).as("c"))
      .head().getSeq[Row](0).map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))

  test("chunks tile the payload exactly, within [min, max] sizes") {
    val p = payload(20000, 7)
    val cs = chunksOf(p)
    assert(cs.head._1 == 0L)
    cs.sliding(2).foreach {
      case Seq((o1, l1, _), (o2, _, _)) => assert(o1 + l1 == o2, "chunks must tile")
      case _ => ()
    }
    assert(cs.map(_._2).sum == 20000L)
    // every chunk but the last respects [min, max]
    cs.init.foreach { case (_, l, _) => assert(l >= 64 && l <= 1024, s"bad length $l") }
    assert(cs.last._2 <= 1024)
    assert(cs.size > 10, s"avgBits=8 over 20k bytes should cut ~78 chunks, got ${cs.size}")
  }

  test("shift resistance: inserting bytes re-chunks only the edit neighborhood") {
    val p = payload(20000, 7)
    val edited = payload(64, 99) ++ p // 64 bytes inserted at the front
    val orig = chunksOf(p).map(_._3).toSet
    val after = chunksOf(edited).map(_._3).toSet
    val kept = orig.intersect(after).size.toDouble / orig.size
    assert(kept >= 0.8, s"CDC must keep most chunk hashes across an insert, kept $kept")
    // the fixed-grid strawman loses (nearly) everything: re-slicing the
    // edited payload on a 256-byte grid shares almost no chunk content
    val grid = p.grouped(256).map(c => c.toSeq).toSet
    val gridAfter = edited.grouped(256).map(c => c.toSeq).toSet
    val gridKept = grid.intersect(gridAfter).size.toDouble / grid.size
    assert(gridKept < 0.2, s"fixed-grid control should lose alignment, kept $gridKept")
  }

  test("deterministic across partitionings; empty payload yields no chunks") {
    val rows = (1 to 50).map(i => (i.toLong, payload(5000, i)))
    def hashes(parts: Int): Map[Long, Seq[Long]] =
      rows.toDF("id", "p").repartition(parts)
        .select($"id", explode(Multimodal.cdcChunks($"p", 64, 8, 1024)).as("c"))
        .select($"id", $"c.hash").as[(Long, Long)]
        .collect().groupBy(_._1).view.mapValues(_.map(_._2).sorted.toSeq).toMap
    assert(hashes(2) == hashes(13))
    val empty = Seq(Tuple1(Array.empty[Byte])).toDF("p")
      .select(size(Multimodal.cdcChunks($"p", 64, 8, 1024))).head().getInt(0)
    assert(empty == 0)
  }

  test("payloadNearDupPairs finds the edited twin, not unrelated payloads") {
    val base = payload(20000, 7)
    val df = Seq(
      (1L, base),
      (2L, payload(64, 99) ++ base),  // near-dup of 1 (insert at front)
      (3L, payload(20000, 555))       // unrelated
    ).toDF("id", "p")
    val pairs = Multimodal.payloadNearDupPairs(df, "id", "p", minOverlap = 0.5,
      minSize = 64, avgBits = 8, maxSize = 1024)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L)), s"got $pairs")
  }
}
