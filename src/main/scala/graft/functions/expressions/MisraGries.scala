package graft.functions.expressions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries frequent-items summary (Misra & Gries 1982; mergeable form
  * per Agarwal et al. 2013, "Mergeable Summaries" — both public papers).
  *
  * Bounded state: at most `capacity` (token, count) pairs, regardless of
  * input size. Guarantees after any sequence of updates and merges over a
  * stream of N tokens:
  *
  *   - every token with true frequency  >  N / capacity is present;
  *   - for each kept token, trueCount − N/capacity ≤ estimate ≤ trueCount.
  *
  * This is the aggregation-side shape that scales: partial summaries are
  * built map-side (bounded memory per task), merged pairwise on the
  * reducer — the full token histogram (|vocab| rows shuffled) is never
  * materialized. A recount pass over the ≤`capacity` candidates then turns
  * the superset into exact heavy hitters (see `text_heavy_hitters`).
  */
final class MgSummary(val capacity: Int) {
  val counts = new mutable.HashMap[String, Long]()

  def add(tok: String): Unit = counts.get(tok) match {
    case Some(c) => counts.update(tok, c + 1)
    case None =>
      if (counts.size < capacity) counts.update(tok, 1L)
      else { // classic MG step: decrement every counter, drop the zeros
        counts.mapValuesInPlace((_, c) => c - 1)
        counts.filterInPlace((_, c) => c > 0)
      }
  }

  /** Mergeable-summaries combine: add counts, then if over capacity
    * subtract the (capacity+1)-th largest count from all and drop ≤0 —
    * preserves both MG guarantees with the error bounds summing. */
  def merge(other: MgSummary): Unit = {
    other.counts.foreach { case (k, v) =>
      counts.update(k, counts.getOrElse(k, 0L) + v)
    }
    if (counts.size > capacity) {
      val sorted = counts.values.toArray.sortWith(_ > _)
      val cStar = sorted(capacity)
      counts.mapValuesInPlace((_, c) => c - cStar)
      counts.filterInPlace((_, c) => c > 0)
    }
  }
}

/** `misra_gries(token, capacity)` — aggregates a string column into an
  * array<struct<token, est_count>> sorted by (est_count desc, token asc),
  * at most `capacity` entries. Nulls are skipped, like built-in aggregates.
  */
case class MisraGriesAgg(
    child: Expression,
    capacity: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[MgSummary] with UnaryLike[Expression] {

  require(capacity > 0, "misra_gries capacity must be positive")

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    InputCheck.string("misra_gries", child)

  override def createAggregationBuffer(): MgSummary = new MgSummary(capacity)

  override def update(buffer: MgSummary, input: InternalRow): MgSummary = {
    val v = child.eval(input)
    if (v != null) buffer.add(v.asInstanceOf[UTF8String].toString)
    buffer
  }

  override def merge(buffer: MgSummary, other: MgSummary): MgSummary = {
    buffer.merge(other)
    buffer
  }

  override def eval(buffer: MgSummary): Any = {
    val entries = buffer.counts.toArray.sortBy { case (t, c) => (-c, t) }
    new GenericArrayData(entries.map { case (t, c) =>
      new GenericInternalRow(Array[Any](UTF8String.fromString(t), c))
    })
  }

  override def serialize(buffer: MgSummary): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    // format version byte: today the buffer only lives in in-flight shuffle
    // bytes, but if a summary ever lands in persisted streaming state the
    // tag is what lets a later format change remain readable
    out.writeByte(MisraGriesAgg.FormatV1)
    out.writeInt(buffer.capacity)
    out.writeInt(buffer.counts.size)
    // length-prefixed raw UTF-8, not writeUTF: modified-UTF-8 caps entries
    // at 65535 bytes and one pathological whitespace-free token would fail
    // the whole aggregation at shuffle time
    buffer.counts.foreach { case (k, v) =>
      val bytes = k.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      out.writeInt(bytes.length)
      out.write(bytes)
      out.writeLong(v)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(storage: Array[Byte]): MgSummary = {
    val in = new DataInputStream(new ByteArrayInputStream(storage))
    val version = in.readByte()
    if (version != MisraGriesAgg.FormatV1) {
      throw new IllegalStateException(
        s"misra_gries: unknown summary format version $version")
    }
    val s = new MgSummary(in.readInt())
    val n = in.readInt()
    var i = 0
    while (i < n) {
      val len = in.readInt()
      if (len < 0 || len > storage.length) {
        throw new IllegalStateException(
          s"misra_gries: corrupt summary — token length $len out of bounds " +
            s"(buffer ${storage.length} bytes)")
      }
      val bytes = new Array[Byte](len)
      in.readFully(bytes)
      s.counts.update(
        new String(bytes, java.nio.charset.StandardCharsets.UTF_8), in.readLong())
      i += 1
    }
    s
  }

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("token", StringType, nullable = false),
      StructField("est_count", LongType, nullable = false))),
    containsNull = false)

  override def nullable: Boolean = false

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): MisraGriesAgg =
    copy(child = newChild)

  override def prettyName: String = "misra_gries"
}

object MisraGriesAgg {
  /** Serialized-summary format tag (see `serialize`). */
  final val FormatV1: Byte = 1
}
