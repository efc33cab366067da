package graft.functions.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Distinct 64-bit hashes of the character k-shingles of normalized text,
  * fused into one expression: lowercase → strip non-alphanumerics to single
  * spaces → trim → slide a k-window → xxhash-style hash per shingle →
  * distinct — all in a single pass with no intermediate shingle strings.
  *
  * Replaces the composed built-ins route (`array_distinct(transform(
  * sequence(...), substr))` + per-element hashing), which allocates one
  * string per shingle and walks the text through interpreted lambdas. For
  * MinHash the shingle strings themselves are never needed — only their
  * hashes — so this emits `array<long>` directly. Normalization matches
  * [[graft.functions.TextFunctions.normalized]] exactly (same separator
  * classes), keeping hash-set Jaccard equal to string-set Jaccard up to
  * 64-bit collisions (~n²/2⁶⁵ per document pair — negligible).
  *
  * Hashing: FNV-1a over the shingle's chars with avalanche finish —
  * deterministic, seedable downstream via xxhash64(seed, h).
  *
  * Codegen: emits a direct static call to [[ShingleHashesExpr.compute]], so
  * the expression participates in whole-stage codegen (no interpreted
  * per-row `eval` dispatch, no stage split) while the tight char loop stays
  * a single JIT-friendly method.
  */
case class ShingleHashesExpr(child: Expression, k: Int, distinct: Boolean = true)
    extends UnaryExpression {

  require(k >= 1, "shingle size must be >= 1")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    InputCheck.string("shingle_hashes", child)

  override protected def nullSafeEval(input: Any): Any =
    ShingleHashesExpr.compute(input.asInstanceOf[UTF8String], k, distinct)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.expressions.ShingleHashesExpr.compute($c, $k, $distinct);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "shingle_hashes"
}

object ShingleHashesExpr {

  /** Single-pass normalize + shingle + hash (+ distinct). Static so generated
    * code calls it directly (monomorphic, inlinable call site). With
    * `distinct = false` the hashes come back in POSITION ORDER with repeats
    * kept — the form winnowing ([[WinnowExpr]]) needs; set semantics
    * (MinHash/Jaccard) use the default distinct form.
    */
  def compute(input: UTF8String, k: Int): ArrayData = compute(input, k, distinct = true)

  def compute(input: UTF8String, k: Int, distinct: Boolean): ArrayData = {
    val s = input.toString
    // normalization pass (identical classes to TextFunctions.normalized)
    val sb = new java.lang.StringBuilder(s.length)
    var pendingSpace = false
    var i = 0
    while (i < s.length) {
      val c = Character.toLowerCase(s.charAt(i))
      if ((c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')) {
        if (pendingSpace && sb.length > 0) sb.append(' ')
        pendingSpace = false
        sb.append(c)
      } else {
        pendingSpace = true
      }
      i += 1
    }
    val norm = sb
    val n = norm.length
    if (distinct) {
      val out = new java.util.HashSet[java.lang.Long]()
      if (n < k) {
        out.add(hashRange(norm, 0, n))
      } else {
        var start = 0
        while (start + k <= n) {
          out.add(hashRange(norm, start, start + k))
          start += 1
        }
      }
      val arr = new Array[Any](out.size)
      val it = out.iterator()
      var j = 0
      while (it.hasNext) { arr(j) = it.next().longValue(); j += 1 }
      new GenericArrayData(arr)
    } else {
      if (n < k) {
        new GenericArrayData(Array[Any](hashRange(norm, 0, n)))
      } else {
        val arr = new Array[Any](n - k + 1)
        var start = 0
        while (start + k <= n) {
          arr(start) = hashRange(norm, start, start + k)
          start += 1
        }
        new GenericArrayData(arr)
      }
    }
  }

  /** FNV-1a 64 over chars [from, until) with a splitmix64 finish. */
  private def hashRange(sb: java.lang.StringBuilder, from: Int, until: Int): Long = {
    var h = 0xCBF29CE484222325L
    var i = from
    while (i < until) {
      h ^= sb.charAt(i).toLong
      h *= 0x100000001B3L
      i += 1
    }
    var z = h + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }
}
