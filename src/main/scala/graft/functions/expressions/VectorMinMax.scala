package graft.functions.expressions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Running element-wise min/max for [[VectorMinMaxAgg]]: two `dim`-length
  * double buffers, regardless of group size.
  */
final class VecMinMaxBuffer {
  var mins: Array[Double] = null
  var maxs: Array[Double] = null

  def add(values: Array[Double]): Unit = {
    if (mins == null) { mins = values.clone(); maxs = values.clone() }
    else {
      if (mins.length != values.length) {
        throw new IllegalStateException(
          s"vector_minmax: inconsistent dimensions ${mins.length} vs ${values.length}")
      }
      var i = 0
      while (i < values.length) {
        if (values(i) < mins(i)) mins(i) = values(i)
        if (values(i) > maxs(i)) maxs(i) = values(i)
        i += 1
      }
    }
  }

  def merge(other: VecMinMaxBuffer): Unit = {
    if (other.mins != null) {
      if (mins == null) { mins = other.mins.clone(); maxs = other.maxs.clone() }
      else {
        if (mins.length != other.mins.length) {
          throw new IllegalStateException(
            s"vector_minmax: inconsistent dimensions ${mins.length} vs ${other.mins.length}")
        }
        var i = 0
        while (i < mins.length) {
          if (other.mins(i) < mins(i)) mins(i) = other.mins(i)
          if (other.maxs(i) > maxs(i)) maxs(i) = other.maxs(i)
          i += 1
        }
      }
    }
  }
}

/** `vector_minmax(embedding)` — element-wise (min, max) of an array column
  * as `struct<mins: array<double>, maxs: array<double>>`; null for an
  * all-null group. The calibration pass of scalar (int8) quantization: the
  * state is two dim-length buffers per group, built map-side and merged
  * pairwise — same scale shape as [[VectorMeanAgg]], no (row × dimension)
  * posexplode shuffle.
  */
case class VectorMinMaxAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[VecMinMaxBuffer] with UnaryLike[Expression] {

  private lazy val elementType = child.dataType match {
    case ArrayType(et @ (FloatType | DoubleType), _) => et
    case other => throw new IllegalArgumentException(
      s"vector_minmax expects array<float|double>, got $other")
  }

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    InputCheck.floatOrDoubleArray("vector_minmax", child)

  override def createAggregationBuffer(): VecMinMaxBuffer = new VecMinMaxBuffer

  override def update(buffer: VecMinMaxBuffer, input: InternalRow): VecMinMaxBuffer = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      val values = new Array[Double](arr.numElements())
      var i = 0
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
      s"vector_minmax: null element at position $i — clean or filter upstream")

  override def merge(buffer: VecMinMaxBuffer, other: VecMinMaxBuffer): VecMinMaxBuffer = {
    buffer.merge(other)
    buffer
  }

  override def eval(buffer: VecMinMaxBuffer): Any =
    if (buffer.mins == null) null
    else InternalRow(new GenericArrayData(buffer.mins), new GenericArrayData(buffer.maxs))

  override def serialize(buffer: VecMinMaxBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    if (buffer.mins == null) out.writeInt(-1)
    else {
      out.writeInt(buffer.mins.length)
      buffer.mins.foreach(out.writeDouble)
      buffer.maxs.foreach(out.writeDouble)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(storage: Array[Byte]): VecMinMaxBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(storage))
    val b = new VecMinMaxBuffer
    val dim = in.readInt()
    if (dim >= 0) {
      b.mins = Array.fill(dim)(in.readDouble())
      b.maxs = Array.fill(dim)(in.readDouble())
    }
    b
  }

  override def dataType: DataType = StructType(Seq(
    StructField("mins", ArrayType(DoubleType, containsNull = false)),
    StructField("maxs", ArrayType(DoubleType, containsNull = false))))

  override def nullable: Boolean = true

  override def withNewMutableAggBufferOffset(newOffset: Int): VectorMinMaxAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): VectorMinMaxAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): VectorMinMaxAgg =
    copy(child = newChild)

  override def prettyName: String = "vector_minmax"
}
