package graft.functions.expressions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Running element-wise sum for [[VectorMeanAgg]]: one `dim`-length double
  * buffer + a row count, regardless of group size.
  */
final class VecSumBuffer {
  var sums: Array[Double] = null
  var n: Long = 0L

  def add(values: Array[Double]): Unit = {
    if (sums == null) sums = new Array[Double](values.length)
    else if (sums.length != values.length) {
      throw new IllegalStateException(
        s"vector_mean: inconsistent dimensions ${sums.length} vs ${values.length}")
    }
    var i = 0
    while (i < values.length) { sums(i) += values(i); i += 1 }
    n += 1
  }

  def merge(other: VecSumBuffer): Unit = {
    if (other.sums != null) {
      if (sums == null) { sums = other.sums.clone(); n = other.n }
      else {
        if (sums.length != other.sums.length) {
          throw new IllegalStateException(
            s"vector_mean: inconsistent dimensions ${sums.length} vs ${other.sums.length}")
        }
        var i = 0
        while (i < sums.length) { sums(i) += other.sums(i); i += 1 }
        n += other.n
      }
    }
  }
}

/** `vector_mean(embedding)` — element-wise mean of an array column
  * (float or double elements), as `array<double>`; null for an all-null
  * group. Mean-pooling / centroid computation is the standard embedding
  * reduction (class prototypes, cluster centroids, doc-from-chunk
  * embeddings), and the aggregation-side shape is what scales: the state
  * is ONE dim-length double buffer per group, built map-side and merged
  * pairwise — the (row × dimension) explosion a posexplode + per-position
  * groupBy would shuffle never exists.
  */
case class VectorMeanAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[VecSumBuffer] with UnaryLike[Expression] {

  private lazy val elementType = child.dataType match {
    case ArrayType(et @ (FloatType | DoubleType), _) => et
    case other => throw new IllegalArgumentException(
      s"vector_mean expects array<float|double>, got $other")
  }

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    InputCheck.floatOrDoubleArray("vector_mean", child)

  override def createAggregationBuffer(): VecSumBuffer = new VecSumBuffer

  override def update(buffer: VecSumBuffer, input: InternalRow): VecSumBuffer = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      val values = new Array[Double](arr.numElements())
      var i = 0
      // a null ELEMENT has no defensible mean semantics (ArrayData.getFloat
      // would silently read 0) — fail loudly instead of skewing the centroid
      elementType match {
        case FloatType =>
          while (i < values.length) {
            if (arr.isNullAt(i)) throw nullElement(i)
            values(i) = arr.getFloat(i).toDouble; i += 1
          }
        case _ =>
          while (i < values.length) {
            if (arr.isNullAt(i)) throw nullElement(i)
            values(i) = arr.getDouble(i); i += 1
          }
      }
      buffer.add(values)
    }
    buffer
  }

  private def nullElement(i: Int): IllegalStateException =
    new IllegalStateException(
      s"vector_mean: null element at position $i — a null component has no " +
        "mean semantics; clean or filter the vector upstream")

  override def merge(buffer: VecSumBuffer, other: VecSumBuffer): VecSumBuffer = {
    buffer.merge(other)
    buffer
  }

  override def eval(buffer: VecSumBuffer): Any =
    if (buffer.sums == null) null
    else new GenericArrayData(buffer.sums.map(_ / buffer.n))

  override def serialize(buffer: VecSumBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeLong(buffer.n)
    if (buffer.sums == null) out.writeInt(-1)
    else {
      out.writeInt(buffer.sums.length)
      buffer.sums.foreach(out.writeDouble)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(storage: Array[Byte]): VecSumBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(storage))
    val b = new VecSumBuffer
    b.n = in.readLong()
    val dim = in.readInt()
    if (dim >= 0) {
      b.sums = Array.fill(dim)(in.readDouble())
    }
    b
  }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def nullable: Boolean = true

  override def withNewMutableAggBufferOffset(newOffset: Int): VectorMeanAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): VectorMeanAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): VectorMeanAgg =
    copy(child = newChild)

  override def prettyName: String = "vector_mean"
}
