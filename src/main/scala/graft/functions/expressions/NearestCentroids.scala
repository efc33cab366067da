package graft.functions.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Indices of the `n` nearest codebook centroids to a vector, by cosine
  * similarity (ties broken by centroid index) — the IVF cell-assignment /
  * probe primitive as one narrow codegen'd pass.
  *
  * The codebook rides inside the expression (shipped to executors once via
  * the generated code's reference array, ~1 MB for 4096 × 64-dim floats), so
  * assignment needs no crossJoin row blow-up and no per-id window shuffle:
  * a corpus of any size is assigned to cells map-side. Centroid norms are
  * precomputed once per executor.
  */
case class NearestCentroidsExpr(child: Expression, centroids: Array[Array[Float]], n: Int)
    extends UnaryExpression {

  require(n >= 1 && centroids.nonEmpty, "need n >= 1 and a non-empty codebook")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    InputCheck.floatOrDoubleArray("nearest_centroids", child)

  @transient private lazy val centNorms: Array[Double] = centroids.map { c =>
    var s = 0.0; var i = 0
    while (i < c.length) { s += c(i).toDouble * c(i); i += 1 }
    math.sqrt(s)
  }

  private def elemIsFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  /** Instance method so codegen can call through a reference object and
    * share the lazily cached centroid norms.
    */
  def computeRow(input: ArrayData): ArrayData = {
    val isF = elemIsFloat
    val dim = input.numElements()
    val vec = new Array[Double](dim)
    var vn = 0.0
    var j = 0
    while (j < dim) {
      vec(j) = if (isF) input.getFloat(j).toDouble else input.getDouble(j)
      vn += vec(j) * vec(j)
      j += 1
    }
    vn = math.sqrt(vn)
    val m = centroids.length
    val take = math.min(n, m)
    // selection of top-`take` by (sim desc, index asc); n is tiny (<= ~16)
    val bestSim = new Array[Double](take)
    val bestIdx = new Array[Int](take)
    java.util.Arrays.fill(bestSim, Double.NegativeInfinity)
    java.util.Arrays.fill(bestIdx, Int.MaxValue)
    var c = 0
    while (c < m) {
      val cent = centroids(c)
      val d = math.min(dim, cent.length)
      var dot = 0.0
      var i = 0
      while (i < d) { dot += vec(i) * cent(i); i += 1 }
      val denom = vn * centNorms(c)
      val sim = if (denom == 0.0) 0.0 else dot / denom
      // insert (sim, c) if it beats the current worst
      var pos = take - 1
      if (sim > bestSim(pos) || (sim == bestSim(pos) && c < bestIdx(pos))) {
        while (pos > 0 && (sim > bestSim(pos - 1) ||
            (sim == bestSim(pos - 1) && c < bestIdx(pos - 1)))) {
          bestSim(pos) = bestSim(pos - 1); bestIdx(pos) = bestIdx(pos - 1); pos -= 1
        }
        bestSim(pos) = sim; bestIdx(pos) = c
      }
      c += 1
    }
    val out = new Array[Any](take)
    var i = 0
    while (i < take) { out(i) = bestIdx(i); i += 1 }
    new GenericArrayData(out)
  }

  override protected def nullSafeEval(input: Any): Any =
    computeRow(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("nearestCentroids", this,
      classOf[NearestCentroidsExpr].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.computeRow($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "nearest_centroids"
}
