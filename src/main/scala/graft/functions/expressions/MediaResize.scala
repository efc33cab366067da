package graft.functions.expressions

import java.awt.RenderingHints
import java.awt.image.BufferedImage

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Opaque byte-budget downsample: cap a payload at `targetBytes` by stride
  * sampling. Deliberately NOT an image operation — works on any modality's
  * bytes. Fused expression (static-call codegen, same device as
  * [[CompressionRatioExpr]]) so the payload column never leaves the
  * whole-stage-codegen pipeline the way a ScalaUDF boundary would force.
  */
case class StridedResizeExpr(child: Expression, targetBytes: Int)
  extends UnaryExpression {

  require(targetBytes > 0, "targetBytes must be positive")

  override def dataType: DataType = BinaryType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    InputCheck.binary("strided_resize", child)

  override protected def nullSafeEval(input: Any): Any =
    MediaResize.stride(input.asInstanceOf[Array[Byte]], targetBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.expressions.MediaResize.stride($c, $targetBytes);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "strided_resize"
}

/** REAL image resize: decode, scale the longest side to `maxDim` with a
  * bilinear Graphics2D draw (deterministic software rendering), re-encode
  * as PNG; within-bound images and non-image payloads pass through
  * unchanged. The ImageIO work dwarfs row overhead, but expressing it as a
  * static-call expression (not a ScalaUDF) keeps the surrounding
  * projection inside one codegen stage — consistent with the engine's
  * fused-kernel discipline.
  */
case class ResizeImageExpr(child: Expression, maxDim: Int)
  extends UnaryExpression {

  require(maxDim > 0, "maxDim must be positive")

  override def dataType: DataType = BinaryType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    InputCheck.binary("resize_image", child)

  override protected def nullSafeEval(input: Any): Any =
    MediaResize.resizeToDim(input.asInstanceOf[Array[Byte]], maxDim)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.expressions.MediaResize.resizeToDim($c, $maxDim);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "resize_image"
}

object MediaResize {

  /** Static so generated code calls it directly. */
  def stride(bytes: Array[Byte], targetBytes: Int): Array[Byte] =
    if (bytes.length <= targetBytes) bytes
    else {
      val stride = bytes.length.toDouble / targetBytes
      Array.tabulate(targetBytes)(i => bytes((i * stride).toInt))
    }

  /** Static so generated code calls it directly. */
  def resizeToDim(bytes: Array[Byte], maxDim: Int): Array[Byte] =
    graft.functions.Multimodal.readImage(bytes) match {
      case Some(img) if math.max(img.getWidth, img.getHeight) > maxDim =>
        val scale = maxDim.toDouble / math.max(img.getWidth, img.getHeight)
        val w = math.max(1, math.round(img.getWidth * scale).toInt)
        val h = math.max(1, math.round(img.getHeight * scale).toInt)
        val t = if (img.getType == BufferedImage.TYPE_CUSTOM)
          BufferedImage.TYPE_INT_RGB else img.getType
        val out = new BufferedImage(w, h, t)
        val g = out.createGraphics()
        g.setRenderingHint(RenderingHints.KEY_INTERPOLATION,
          RenderingHints.VALUE_INTERPOLATION_BILINEAR)
        g.drawImage(img, 0, 0, w, h, null)
        g.dispose()
        graft.functions.Multimodal.writePng(out)
      case _ => bytes
    }
}
