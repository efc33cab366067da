package graft.functions.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Product-quantization kernels. The codebooks travel FLATTENED inside the
  * expression (m·k·subDim floats ≈ 64 KB at the 8×256×8 default — the BPE
  * in-expression-vocab device), so encoding is one fused map-side pass with
  * no broadcast-join plumbing.
  */

/** vec (array<float>) → m-byte PQ code: the vector is unit-normalized IN
  * the kernel (codebooks are trained on unit vectors; encoding a raw
  * vector against them would rank ADC by |v|·cos instead of cos), then per
  * subspace the L2-nearest sub-centroid's index is taken (ties → lowest
  * index, deterministic). Cost m·k·subDim mults per row.
  */
case class PqEncodeExpr(child: Expression, flatCodebooks: Array[Float],
                        m: Int, k: Int, subDim: Int)
    extends UnaryExpression {
  require(flatCodebooks.length == m * k * subDim, "codebook shape mismatch")

  override def dataType: DataType = BinaryType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    InputCheck.floatArray("pq_encode", child)

  override protected def nullSafeEval(input: Any): Any =
    PqEncodeExpr.compute(input.asInstanceOf[ArrayData], flatCodebooks, m, k, subDim)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("pqCodebooks", flatCodebooks, "float[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.expressions.PqEncodeExpr.compute($c, $cbRef, $m, $k, $subDim);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "pq_encode"
}

object PqEncodeExpr {
  def compute(vec: ArrayData, cb: Array[Float], m: Int, k: Int, subDim: Int): Array[Byte] = {
    val dim = m * subDim
    val v = new Array[Float](dim)
    val n = math.min(dim, vec.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { val x = vec.getFloat(i); v(i) = x; s += x.toDouble * x; i += 1 }
    if (s > 0.0) {
      val inv = 1.0 / math.sqrt(s)
      i = 0
      while (i < n) { v(i) = (v(i) * inv).toFloat; i += 1 }
    }
    val out = new Array[Byte](m)
    var mi = 0
    while (mi < m) {
      val base = mi * k * subDim
      val off = mi * subDim
      var best = 0
      var bestD = Double.MaxValue
      var c = 0
      while (c < k) {
        val cBase = base + c * subDim
        var d = 0.0
        var j = 0
        while (j < subDim) {
          val diff = v(off + j) - cb(cBase + j)
          d += diff.toDouble * diff
          j += 1
        }
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      out(mi) = best.toByte
      mi += 1
    }
    out
  }
}

/** PQ codes (binary) → ADC approximate-dot scores against a BATCH of
  * queries: the per-query distance tables (query_mi · centroid partial
  * dots, q·m·k floats) are precomputed ONCE by the caller and shipped in
  * the expression, so scoring a code is q·m table lookups — this is where
  * PQ beats the exact dot (m lookups vs dim mults per query). Returns
  * array<double> of length q (one score per query, caller posexplodes).
  */
case class PqAdcScoresExpr(child: Expression, tables: Array[Float],
                           q: Int, m: Int, k: Int)
    extends UnaryExpression {
  require(tables.length == q * m * k, "ADC table shape mismatch")

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    InputCheck.binary("pq_adc_scores", child)

  override protected def nullSafeEval(input: Any): Any =
    PqAdcScoresExpr.compute(input.asInstanceOf[Array[Byte]], tables, q, m, k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tRef = ctx.addReferenceObj("adcTables", tables, "float[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.expressions.PqAdcScoresExpr.compute($c, $tRef, $q, $m, $k);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "pq_adc_scores"
}

object PqAdcScoresExpr {
  def compute(codes: Array[Byte], tables: Array[Float], q: Int, m: Int, k: Int): ArrayData = {
    val out = new Array[Any](q)
    var qi = 0
    while (qi < q) {
      val base = qi * m * k
      var s = 0.0
      var mi = 0
      while (mi < m) {
        s += tables(base + mi * k + (codes(mi) & 0xff))
        mi += 1
      }
      out(qi) = s
      qi += 1
    }
    new GenericArrayData(out)
  }
}
