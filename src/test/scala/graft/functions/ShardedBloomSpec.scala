package graft.functions

import graft.SparkSpec
import graft.functions.expressions.{BloomMightContainShardedExpr, ShardedBloomRuntime}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.BoundReference
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** The KEY-SPACE-SHARDED Bloom filter (r17 verdict task 4): above the
  * monolithic filter's documented partition point (~1.2 GB of bits at 1e9
  * keys) the freeze splits the key space into `floorMod(key, n)` shards,
  * each built, broadcast, fetched, and deserialized INDEPENDENTLY — so no
  * single driver/executor object ever holds the whole corpus's bits, and
  * an executor's resident filter bytes are bounded by shardBytes × the
  * shards its rows actually probe. These specs pin (1) probe parity with
  * the monolithic filter — no false negatives, admissions bit-identical,
  * (2) the residency bound itself — un-probed shards are never
  * deserialized, observable through [[ShardedBloomRuntime]] and the
  * expression's own slots.
  */
class ShardedBloomSpec extends SparkSpec {
  import spark.implicits._

  test("sharded build has no false negatives and admissions equal the monolithic path") {
    val keys = spark.range(5000).select(xxhash64(col("id")).as("k"))
      .repartition(7) // multi-partition build: shard routing must not care
    val mono = BloomDedup.buildLong(keys, col("k"), 5000L, 0.01)
    val sharded = BloomDedup.buildShardedLongNonEmpty(keys, col("k"), 5000L, 0.01, 8)
    assert(sharded.length == 8)
    val handles = BloomDedup.broadcastShards(spark, sharded)
    try {
      // every inserted key probes true through the sharded expression
      val misses = keys.filter(!BloomDedup.mightContainSharded(handles, col("k")))
      assert(misses.count() == 0L, "sharded probe must have no false negatives")

      // newKeysExact: identical surviving rows via monolithic vs sharded
      // probes (false-positive RATES may differ; the exact sliver join
      // makes both paths exact, so the results must be equal sets)
      val corpus = keys
      val incoming = spark.range(2500, 7500).select(xxhash64(col("id")).as("k"))
      val viaMono = BloomDedup.newKeysExact(incoming, corpus, "k", mono)
        .as[Long].collect().sorted.toSeq
      val viaSharded = BloomDedup.newKeysExact(incoming, corpus, "k", mono,
          shardedBcast = Some(handles))
        .as[Long].collect().sorted.toSeq
      assert(viaSharded == viaMono,
        "sharded and monolithic exact-dedup must admit identical keys")
    } finally handles.foreach(_.unpersist(blocking = false))
  }

  test("only probed shards deserialize: resident filters bounded by the probe set") {
    val shards = 8
    val keys = spark.range(4000).select(xxhash64(col("id")).as("k"))
    val built = BloomDedup.buildShardedLongNonEmpty(keys, col("k"), 4000L, 0.01, shards)
    val handles = BloomDedup.broadcastShards(spark, built)
    val group = handles(0).id
    try {
      ShardedBloomRuntime.clear(group)
      val expr = BloomMightContainShardedExpr(
        BoundReference(0, LongType, nullable = false), handles)
      val allKeys = keys.as[Long].collect()
      // probe ONLY keys of shard 3 through one expression instance
      val shard3 = allKeys.filter(k => java.lang.Math.floorMod(k, shards.toLong) == 3L)
      assert(shard3.nonEmpty)
      shard3.foreach(k => expr.eval(InternalRow(k)))
      assert(expr.residentShardCount == 1,
        s"probing one shard class must deserialize exactly one filter, " +
        s"got ${expr.residentShardCount}")
      assert(ShardedBloomRuntime.residentShards(group) == Set(3),
        "the runtime ledger must record exactly the probed shard")
      // widen to three classes → exactly three resident filters
      Seq(0L, 5L, 7L).foreach { c =>
        allKeys.find(k => java.lang.Math.floorMod(k, shards.toLong) == c)
          .foreach(k => expr.eval(InternalRow(k)))
      }
      assert(expr.residentShardCount == 4)
      assert(ShardedBloomRuntime.residentShards(group) == Set(0, 3, 5, 7))
    } finally {
      ShardedBloomRuntime.clear(group)
      handles.foreach(_.unpersist(blocking = false))
    }
  }

  test("concurrent tasks share one deserialized filter per (JVM, shard)") {
    // r18 kept deserialized shards per expression INSTANCE (i.e. per task):
    // T tasks × S shards meant up to T×S readFrom passes and resident
    // copies. The r19 JVM-wide cache must load each shard exactly once no
    // matter how many concurrent probes race on it.
    val shards = 4
    val keys = spark.range(4000).select(xxhash64(col("id")).as("k"))
    val built = BloomDedup.buildShardedLongNonEmpty(keys, col("k"), 4000L, 0.01, shards)
    val handles = BloomDedup.broadcastShards(spark, built)
    val group = handles(0).id
    try {
      ShardedBloomRuntime.clear(group)
      val allKeys = keys.as[Long].collect()
      val nThreads = 8 // ≥4 concurrent "tasks", each its own expression instance
      val barrier = new java.util.concurrent.CyclicBarrier(nThreads)
      val pool = java.util.concurrent.Executors.newFixedThreadPool(nThreads)
      try {
        val futures = (0 until nThreads).map { _ =>
          pool.submit(new java.util.concurrent.Callable[Long] {
            override def call(): Long = {
              val expr = BloomMightContainShardedExpr(
                BoundReference(0, LongType, nullable = false), handles)
              barrier.await() // all instances start probing together
              allKeys.count(k => expr.eval(InternalRow(k)).asInstanceOf[Boolean])
            }
          })
        }
        val counts = futures.map(_.get())
        assert(counts.distinct.size == 1, "every instance must see the same members")
      } finally pool.shutdown()
      assert(ShardedBloomRuntime.residentShards(group) == (0 until shards).toSet)
      assert(ShardedBloomRuntime.deserializationCount(group) == shards.toLong,
        s"each shard must deserialize exactly once per JVM under concurrency, " +
        s"got ${ShardedBloomRuntime.deserializationCount(group)} loads for $shards shards")
    } finally {
      ShardedBloomRuntime.clear(group)
      handles.foreach(_.unpersist(blocking = false))
    }
  }

  test("a sharded freeze gates identically to a monolithic freeze") {
    val corpus = (1L to 60L).map(i =>
      (i, s"standing document $i with its own unmistakably distinct subject line", "web"))
      .toDF("doc_id", "text", "source")
    val cfg = CorpusPipeline.Config(minChars = 10, requireKnownLang = false,
      nearDupThreshold = None, decontamThreshold = None)
    val batch = ((1L to 5L).map(i =>
        (i + 1000L, s"standing document $i with its own unmistakably distinct subject line", "web")) ++
      (1L to 5L).map(i => (i + 2000L, s"genuinely new material number $i never seen before", "web")))
      .toDF("doc_id", "text", "source")

    def admittedVia(shardCount: Int): Seq[Long] = {
      val frozen = CorpusPipeline.freezeCorpus(corpus, cfg, withBanded = true,
        bloomShardCount = shardCount)
      try {
        if (shardCount > 1) {
          assert(frozen.bloomShardsBcast.exists(_.length == shardCount),
            "a sharded freeze must carry one broadcast handle per shard")
          assert(frozen.bloomBcast.isEmpty && frozen.bloomMono.isEmpty,
            "a sharded freeze must not also hold the monolithic bits")
          intercept[IllegalStateException](frozen.bloom)
        } else assert(frozen.bloomBcast.isDefined)
        val (accepted, release) = CorpusPipeline.prepareIncrementalFrozen(
          batch, frozen, corpus, cfg, Some(0.8))
        try accepted.select("doc_id").as[Long].collect().sorted.toSeq
        finally release()
      } finally frozen.release()
    }

    val mono = admittedVia(1)
    val sharded = admittedVia(4)
    assert(mono == (2001L to 2005L).toSeq,
      s"exact dups must be gated out, novel rows admitted; got $mono")
    assert(sharded == mono, "sharding the filter must not change admissions")
  }
}
