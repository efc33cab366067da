package graft.functions.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Content-defined chunking of a binary payload (gear rolling hash, the
  * FastCDC family): split a blob at content-determined boundaries so that
  * INSERTING OR DELETING bytes only re-chunks the neighborhood of the edit —
  * every chunk after the edit re-aligns and keeps its hash, which is what
  * makes chunk-level dedup of near-identical blobs (re-encoded media,
  * appended archives, edited documents) work where fixed-grid chunking
  * loses every boundary after the first change.
  *
  * Boundary rule: roll `h = (h << 1) + GEAR(byte)`; cut when
  * `(h & mask) == 0` with `mask = 2^avgBits − 1` (expected chunk size
  * ≈ 2^avgBits), never before `minSize`, always by `maxSize`. The GEAR
  * table is deterministic (splitmix64 of the byte value), so chunkings are
  * reproducible across runs, partitions, and JVMs.
  *
  * Output: `array<struct<offset:bigint, length:bigint, hash:bigint>>`
  * with FNV-1a 64 chunk hashes; chunks tile the payload exactly. Map-side
  * codegen expression — the payload bytes never shuffle; downstream dedup
  * explodes the (id, hash) pairs only (16 bytes/chunk), the same
  * posting-list funnel as the text span dedup. Byte-level charset work has
  * no SQL replay, so the contract is spec-pinned (`GearChunksSpec`), like
  * the mojibake/compression-ratio kernels.
  */
case class GearChunksExpr(child: Expression, minSize: Int, avgBits: Int,
                          maxSize: Int) extends UnaryExpression {
  require(minSize >= 1 && maxSize >= minSize && avgBits >= 1 && avgBits <= 30,
    s"bad chunk parameters: min=$minSize avgBits=$avgBits max=$maxSize")

  override def dataType: DataType = GearChunksExpr.schema

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    InputCheck.binary("gear_chunks", child)

  override protected def nullSafeEval(input: Any): Any =
    GearChunksExpr.compute(input.asInstanceOf[Array[Byte]], minSize, avgBits, maxSize)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.expressions.GearChunksExpr.compute(" +
        s"$c, $minSize, $avgBits, $maxSize);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "gear_chunks"
}

object GearChunksExpr {

  val schema: DataType = ArrayType(StructType(Seq(
    StructField("offset", LongType, nullable = false),
    StructField("length", LongType, nullable = false),
    StructField("hash", LongType, nullable = false))), containsNull = false)

  // deterministic gear table: splitmix64 of the byte value
  private val Gear: Array[Long] = Array.tabulate(256) { i =>
    var z = i.toLong + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  private def fnv1a(bytes: Array[Byte], from: Int, until: Int): Long = {
    var h = 0xcbf29ce484222325L
    var i = from
    while (i < until) {
      h ^= (bytes(i) & 0xffL)
      h *= 0x100000001b3L
      i += 1
    }
    h
  }

  /** Static so generated code calls it directly. Empty payload → empty
    * array. Chunks tile [0, len) exactly.
    */
  def compute(bytes: Array[Byte], minSize: Int, avgBits: Int, maxSize: Int): ArrayData = {
    val n = bytes.length
    if (n == 0) return new GenericArrayData(Array.empty[Any])
    val mask = (1L << avgBits) - 1L
    val rows = scala.collection.mutable.ArrayBuffer.empty[Any]
    var start = 0
    var h = 0L
    var i = 0
    var sizeInChunk = 0
    while (i < n) {
      h = (h << 1) + Gear(bytes(i) & 0xff)
      sizeInChunk += 1
      i += 1
      val cut = (sizeInChunk >= minSize && (h & mask) == 0L) ||
        sizeInChunk >= maxSize || i == n
      if (cut) {
        rows += InternalRow(start.toLong, sizeInChunk.toLong, fnv1a(bytes, start, i))
        start = i
        h = 0L
        sizeInChunk = 0
      }
    }
    new GenericArrayData(rows.toArray)
  }
}
