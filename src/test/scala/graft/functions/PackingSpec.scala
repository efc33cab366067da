package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Sequence packing ([[Packing.packOffsets]]): GPT-style
  * concatenate-and-split over sharded token streams. The oracle-bearing
  * `doc_pack_sequences` checks the full funnel against DuckDB; these pin
  * the invariants directly.
  */
class PackingSpec extends SparkSpec {
  import spark.implicits._

  private val items = (0 until 200)
    .map(i => (i.toLong, i % 7 + 1)) // token counts 1..7
    .toDF("id", "tok")

  private def packed = Packing.packOffsets(items, col("tok"), maxTokens = 10L,
    orderBy = Seq(col("id")), shardKey = col("id"), shards = 4)

  test("offsets are the exact running token stream per shard") {
    val rows = packed.select($"shard", $"id", $"tok", $"bin", $"bin_offset")
      .as[(Int, Long, Int, Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2)).toMap
    rows.foreach { case (_, shardRows) =>
      var before = 0L
      shardRows.foreach { case (_, _, tok, bin, off) =>
        assert(bin == before / 10, "bin = which window the first token lands in")
        assert(off == before % 10)
        before += tok
      }
    }
    assert(rows.size == 4, "all shards populated")
  }

  test("assignment is partition-independent and deterministic") {
    val a = packed.select($"id", $"shard", $"bin", $"bin_offset").collect().toSet
    val b = Packing.packOffsets(items.repartition(7), col("tok"), maxTokens = 10L,
        orderBy = Seq(col("id")), shardKey = col("id"), shards = 4)
      .select($"id", $"shard", $"bin", $"bin_offset").collect().toSet
    assert(a == b)
  }

  test("every bin except a shard's last is filled to the budget boundary") {
    // bins partition the shard's token stream into windows of exactly
    // maxTokens: the total tokens STARTING in bin b is (next bin's first
    // offset + b boundary) — equivalently, consecutive bins' first items
    // sit at offset < maxTokens and bins are dense (no gaps)
    val bins = packed.select($"shard", $"bin").distinct()
      .as[(Int, Long)].collect().groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    bins.foreach { case (_, bs) =>
      assert(bs.head == 0L && bs.zipWithIndex.forall { case (b, i) => b == i },
        "bins are dense from 0")
    }
  }
}
