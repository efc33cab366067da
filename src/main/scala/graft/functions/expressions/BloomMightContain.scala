package graft.functions.expressions

import java.io.ByteArrayInputStream

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.util.sketch.BloomFilter

/** Map-side membership probe against a pre-built Bloom filter over LONG
  * keys — the stateless predicate that lets an incremental-ingest dedup
  * skip the exact anti-join for every key the filter has definitely never
  * seen (no false negatives: a `false` here is proof of novelty; a `true`
  * is only a candidate, at the filter's configured false-positive rate).
  *
  * The filter travels as its serialized bytes (engine-portable, stable
  * under plan serialization) and is deserialized at most once per
  * generated-class instance via a lazily-initialized mutable-state slot, so
  * the per-row cost inside whole-stage codegen is just the hash probes.
  * Stateless per row → usable under Structured Streaming as-is (the frozen
  * corpus-membership deployment, same trade as the frozen DSIR table).
  */
case class BloomMightContainExpr(child: Expression, filterBytes: Array[Byte])
    extends UnaryExpression {

  @transient private lazy val filter: BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(filterBytes))

  override def dataType: DataType = BooleanType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    InputCheck.long("bloom_might_contain", child)

  override protected def nullSafeEval(input: Any): Any =
    filter.mightContainLong(input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bytesRef = ctx.addReferenceObj("graftBloomBytes", filterBytes, "byte[]")
    val filterSlot = ctx.addMutableState(
      classOf[BloomFilter].getName, "graftBloomFilter", _ => "")
    nullSafeCodeGen(ctx, ev, c =>
      s"""if ($filterSlot == null) {
         |  try {
         |    $filterSlot = ${classOf[BloomFilter].getName}.readFrom(
         |      new java.io.ByteArrayInputStream($bytesRef));
         |  } catch (java.io.IOException e) {
         |    throw new RuntimeException(e);
         |  }
         |}
         |${ev.value} = $filterSlot.mightContainLong($c);""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "bloom_might_contain"
}

/** [[BloomMightContainExpr]] with the serialized filter shipped as a
  * BROADCAST handle instead of plan-embedded bytes. The bytes-in-plan
  * variant serializes the whole filter into EVERY task binary of every
  * stage that carries the predicate — ~1.2 MB per million keys at 1% fpp,
  * so a frozen 8M-doc corpus ships ~10 MB × stages × batches from the
  * driver (the "Broadcasting large task binary" regime, measured in the
  * r17 crossover sweep). A broadcast ships once per refresh and lives in
  * the executors' block managers; the task binary carries only the
  * handle. Same probe semantics bit-for-bit; deserialized at most once
  * per generated-class instance, exactly like the parent.
  */
case class BloomMightContainBcastExpr(
    child: Expression,
    filterBcast: org.apache.spark.broadcast.Broadcast[Array[Byte]])
    extends UnaryExpression {

  @transient private lazy val filter: BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(filterBcast.value))

  override def dataType: DataType = BooleanType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    InputCheck.long("bloom_might_contain_bcast", child)

  override protected def nullSafeEval(input: Any): Any =
    filter.mightContainLong(input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bcastRef = ctx.addReferenceObj("graftBloomBcast", filterBcast,
      classOf[org.apache.spark.broadcast.Broadcast[_]].getName)
    val filterSlot = ctx.addMutableState(
      classOf[BloomFilter].getName, "graftBloomFilterB", _ => "")
    nullSafeCodeGen(ctx, ev, c =>
      s"""if ($filterSlot == null) {
         |  try {
         |    $filterSlot = ${classOf[BloomFilter].getName}.readFrom(
         |      new java.io.ByteArrayInputStream((byte[]) $bcastRef.value()));
         |  } catch (java.io.IOException e) {
         |    throw new RuntimeException(e);
         |  }
         |}
         |${ev.value} = $filterSlot.mightContainLong($c);""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "bloom_might_contain_bcast"
}
