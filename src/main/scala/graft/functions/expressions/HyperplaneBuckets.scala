package graft.functions.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Multi-table random-hyperplane LSH bucket ids, fused: for each of
  * `tables` hash tables, the `nbits` sign bits of dot products with
  * deterministic pseudo-random hyperplanes — all tables × planes × dims in
  * one pass over the vector with precomputed plane components.
  *
  * Replaces the composed form (`aggregate(zip_with(...))` per plane), which
  * re-walks the vector through interpreted lambdas tables×nbits times. Plane
  * component (t, p, j) is splitmix64(seed(t,p,j)) scaled to [-1, 1] —
  * deterministic across executors with no driver state (same contract as
  * VectorSimilarity.hyperplaneBucket, different hash constants).
  */
case class HyperplaneBucketsExpr(child: Expression, nbits: Int, dim: Int, tables: Int)
    extends UnaryExpression {

  require(nbits >= 1 && nbits <= 63 && dim >= 1 && tables >= 1)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    InputCheck.floatOrDoubleArray("hyperplane_buckets", child)

  private def elemIsFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  // plane components precomputed once per executor (lazy val on the
  // deserialized expression instance): tables*nbits*dim doubles
  @transient private lazy val planes: Array[Double] = {
    val out = new Array[Double](tables * nbits * dim)
    var idx = 0
    while (idx < out.length) {
      var z = idx.toLong * 0x9E3779B97F4A7C15L + 0x2545F4914F6CDD1DL
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      z ^= (z >>> 31)
      out(idx) = z.toDouble / Long.MaxValue.toDouble
      idx += 1
    }
    out
  }

  /** Instance method so generated code can call through a reference object
    * and share the per-executor cached plane components.
    */
  def computeRow(arr: ArrayData): ArrayData = {
    val n = math.min(dim, arr.numElements())
    val vec = new Array[Double](n)
    val isF = elemIsFloat
    var j = 0
    while (j < n) {
      vec(j) = if (isF) arr.getFloat(j).toDouble else arr.getDouble(j)
      j += 1
    }
    val out = new Array[Any](tables)
    var t = 0
    while (t < tables) {
      var bucket = 0L
      var p = 0
      while (p < nbits) {
        val base = (t * nbits + p) * dim
        var dot = 0.0
        var i = 0
        while (i < n) { dot += vec(i) * planes(base + i); i += 1 }
        if (dot > 0) bucket |= (1L << p)
        p += 1
      }
      out(t) = bucket
      t += 1
    }
    new GenericArrayData(out)
  }

  override protected def nullSafeEval(input: Any): Any =
    computeRow(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("hyperplaneBuckets", this,
      classOf[HyperplaneBucketsExpr].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.computeRow($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "hyperplane_buckets"
}
