package graft.functions.expressions

import java.io.ByteArrayInputStream

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.util.sketch.BloomFilter

/** Executor-side residency ledger for the sharded Bloom probe: which
  * shards of which filter group this JVM has actually deserialized. The
  * sharding exists to bound per-executor resident filter bytes by the
  * shards its tasks PROBE (broadcast blocks are fetched lazily on first
  * `value()`), and that claim is only checkable if the deserialization
  * event is observable — specs and the crossover harness read this, the
  * probe itself never does. One `touch` per (generated-class instance,
  * shard), never per row.
  */
object ShardedBloomRuntime {
  private val touched =
    new java.util.concurrent.ConcurrentHashMap[Long, java.util.Set[Int]]()
  def touch(group: Long, shard: Int): Unit =
    touched.computeIfAbsent(group,
      _ => java.util.concurrent.ConcurrentHashMap.newKeySet[Int]()).add(shard)
  /** distinct shards this JVM deserialized for `group` (a filter's
    * shard-0 broadcast id — unique per built filter) */
  def residentShards(group: Long): Set[Int] = {
    val s = touched.get(group)
    if (s == null) Set.empty
    else { val b = Set.newBuilder[Int]; s.forEach(i => b += i); b.result() }
  }
  def clear(group: Long): Unit = touched.remove(group)

  /** serialized bytes per shard, recorded at broadcast time — lets a
    * harness report resident bytes (= Σ sizes of touched shards) without
    * re-fetching the broadcasts */
  private val sizes =
    new java.util.concurrent.ConcurrentHashMap[Long, Array[Long]]()
  def registerGroup(group: Long, shardBytes: Array[Long]): Unit =
    sizes.put(group, shardBytes)
  /** (touched shards, resident bytes, total bytes) per known group */
  def snapshot: Map[Long, (Set[Int], Long, Long)] = {
    val b = Map.newBuilder[Long, (Set[Int], Long, Long)]
    sizes.forEach { (g, sz) =>
      val res = residentShards(g)
      b += g -> ((res, res.iterator.map(sz(_)).sum, sz.sum))
    }
    b.result()
  }
}

/** [[BloomMightContainBcastExpr]] over a KEY-SPACE-SHARDED filter: shard
  * `floorMod(key, n)` of `n` per-shard filters, each shipped as its own
  * broadcast handle. Executors deserialize (and, with Torrent broadcast,
  * even FETCH) only the shards their rows probe, so per-executor resident
  * filter bytes are bounded by shardBytes × touched shards instead of the
  * whole corpus's bits — the closing move on the last gate component that
  * was O(corpus) in one driver/executor object (a monolithic filter is
  * ~1.2 GB at 1e9 keys / 1% fpp). Build-side counterpart:
  * [[graft.functions.BloomDedup.buildShardedLongNonEmpty]], which routes
  * each key by the SAME floorMod — the probe is bit-identical to a
  * monolithic filter's on membership (no false negatives; fpp per shard
  * as configured), so admissions through it are unchanged.
  */
case class BloomMightContainShardedExpr(
    child: Expression,
    handles: Array[Broadcast[Array[Byte]]])
    extends UnaryExpression {

  private def groupId: Long = handles(0).id

  @transient private lazy val slots = new Array[BloomFilter](handles.length)

  private def filterFor(shard: Int): BloomFilter = {
    var f = slots(shard)
    if (f == null) slots.synchronized {
      f = slots(shard)
      if (f == null) {
        f = BloomFilter.readFrom(new ByteArrayInputStream(handles(shard).value))
        slots(shard) = f
        ShardedBloomRuntime.touch(groupId, shard)
      }
    }
    f
  }

  /** test seam: shards THIS instance holds deserialized right now */
  private[graft] def residentShardCount: Int = slots.count(_ != null)

  override def dataType: DataType = BooleanType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    InputCheck.long("bloom_might_contain_sharded", child)

  override protected def nullSafeEval(input: Any): Any = {
    val k = input.asInstanceOf[Long]
    val shard = java.lang.Math.floorMod(k, handles.length.toLong).toInt
    filterFor(shard).mightContainLong(k)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val handlesRef = ctx.addReferenceObj("graftBloomShards", handles,
      classOf[Broadcast[_]].getName + "[]")
    val slotsName = ctx.addMutableState(
      classOf[BloomFilter].getName + "[]", "graftBloomShardSlots", _ => "")
    val n = handles.length
    nullSafeCodeGen(ctx, ev, c =>
      s"""if ($slotsName == null) {
         |  $slotsName = new ${classOf[BloomFilter].getName}[$n];
         |}
         |int graftShard = (int) java.lang.Math.floorMod((long) $c, ${n}L);
         |if ($slotsName[graftShard] == null) {
         |  try {
         |    $slotsName[graftShard] = ${classOf[BloomFilter].getName}.readFrom(
         |      new java.io.ByteArrayInputStream(
         |        (byte[]) $handlesRef[graftShard].value()));
         |  } catch (java.io.IOException e) {
         |    throw new RuntimeException(e);
         |  }
         |  graft.functions.expressions.ShardedBloomRuntime.touch(
         |    ${groupId}L, graftShard);
         |}
         |${ev.value} = $slotsName[graftShard].mightContainLong($c);""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "bloom_might_contain_sharded"
}
