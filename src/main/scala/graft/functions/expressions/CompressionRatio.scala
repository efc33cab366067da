package graft.functions.expressions

import java.util.zip.Deflater

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Deflate compression ratio (compressed/raw bytes) of a document — the
  * quality signal the Gopher/MassiveText filters use next to the
  * repetition gate: highly repetitive or templated text compresses far
  * below prose (ratio → 0.1), random/encrypted blobs don't compress at all
  * (ratio → 1), English prose sits around 0.35–0.6. One Deflater pass per
  * row (level 6, the zlib default), map-side inside codegen; no DuckDB
  * zlib exists so the contract is spec-pinned (monotone fixtures +
  * library-level determinism), not oracle-replayed — the one structural
  * rows-only carve-out this family needs.
  *
  * The compressed stream is DISCARDED — only its length is kept, via
  * `deflate` into a fixed scratch buffer, so the expression allocates no
  * per-row output proportional to the document.
  */
case class CompressionRatioExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    InputCheck.string("compression_ratio", child)

  override protected def nullSafeEval(input: Any): Any =
    CompressionRatioExpr.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.expressions.CompressionRatioExpr.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "compression_ratio"
}

object CompressionRatioExpr {

  private val scratch = new ThreadLocal[Array[Byte]] {
    override def initialValue(): Array[Byte] = new Array[Byte](1 << 16)
  }

  /** Static so generated code calls it directly. Empty text → 1.0 (nothing
    * to compress is not evidence of repetition). Rounded to 6 dp so the
    * value is stable under double formatting on any engine.
    */
  def compute(input: UTF8String): Double = {
    val raw = input.getBytes
    if (raw.isEmpty) return 1.0
    val deflater = new Deflater(Deflater.DEFAULT_COMPRESSION, true)
    try {
      deflater.setInput(raw)
      deflater.finish()
      val buf = scratch.get()
      var compressed = 0L
      while (!deflater.finished()) {
        compressed += deflater.deflate(buf)
      }
      math.rint(compressed.toDouble / raw.length * 1e6) / 1e6
    } finally deflater.end()
  }
}
