package graft.functions.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Shannon entropy (bits) of a text's character (code point) distribution —
  * the cheap gibberish / encoded-blob detector a quality gate wants next to
  * length and punctuation bands: English prose sits around 4–4.5 bits,
  * uniform base64/hex blobs push toward log2(alphabet size), single-char
  * spam toward 0. One fused map-side pass per row (no explode → groupBy —
  * the composed form shuffles |corpus chars| rows for a value computable in
  * a per-row count table); DuckDB replays it with unnest + GROUP BY +
  * -sum(p·log2(p)) for the oracle.
  */
case class CharEntropyExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    InputCheck.string("char_entropy", child)

  override protected def nullSafeEval(input: Any): Any =
    CharEntropyExpr.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.expressions.CharEntropyExpr.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "char_entropy"
}

object CharEntropyExpr {

  private val Log2 = math.log(2.0)

  /** Static so generated code calls it directly. Empty text → 0.0; the
    * single-distinct-char case normalizes -0.0 to 0.0 (both engines would
    * otherwise emit IEEE -0.0, which string-compares unequal downstream).
    */
  def compute(input: UTF8String): Double = {
    val s = input.toString
    if (s.isEmpty) return 0.0
    val counts = new java.util.HashMap[Integer, Int]()
    var i = 0
    var n = 0L
    while (i < s.length) {
      val cp = s.codePointAt(i)
      counts.merge(cp, 1, (a, b) => a + b)
      i += Character.charCount(cp)
      n += 1
    }
    var acc = 0.0
    val it = counts.values().iterator()
    while (it.hasNext) {
      val p = it.next().toDouble / n
      acc += p * (math.log(p) / Log2)
    }
    val e = -acc
    if (e == 0.0) 0.0 else e
  }
}
