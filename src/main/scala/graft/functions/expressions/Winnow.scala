package graft.functions.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Winnowing fingerprint selection over a rolling-hash sequence (Schleimer,
  * Wilkerson & Aiken, "Winnowing: Local Algorithms for Document
  * Fingerprinting", SIGMOD 2003): slide a window of `w` consecutive k-gram
  * hashes and select each window's minimum, rightmost on ties; a position
  * selected by consecutive windows is recorded once.
  *
  * Guarantees (the paper's): at least one fingerprint per window — any match
  * of length >= w + k - 1 between two documents shares at least one selected
  * fingerprint — and expected density 2/(w+1) of the input hashes, so the
  * fingerprint set is ~w/2× smaller than the full shingle set while staying
  * position-robust (an edit perturbs only the windows that overlap it).
  * Sequences shorter than one window select the global minimum.
  *
  * Per-row closed form over [[ShingleHashesExpr]] output — no explode, no
  * shuffle; the monotonic-deque scan is O(n) per document.
  *
  * Ref semantics: document fingerprinting supporting near-dup detection,
  * SURVEY §7.5 — a training-data pipeline extension (the reference framework
  * has no content fingerprinting).
  */
case class WinnowExpr(child: Expression, w: Int) extends UnaryExpression {

  require(w >= 1, "window must be >= 1")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"winnow expects array<bigint>, got ${other.simpleString(2)}")
    }

  override protected def nullSafeEval(input: Any): Any =
    WinnowExpr.compute(input.asInstanceOf[ArrayData], w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.expressions.WinnowExpr.compute($c, $w);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "winnow"
}

object WinnowExpr {

  /** Monotonic-deque sliding minimum with rightmost-tie selection; emits a
    * hash whenever the selected POSITION changes (the paper's "record once"
    * rule). Static so generated code calls it directly.
    */
  def compute(input: ArrayData, w: Int): ArrayData = {
    val n = input.numElements()
    if (n == 0) return new GenericArrayData(Array.empty[Any])
    val out = new java.util.ArrayList[Any](math.max(4, 2 * n / (w + 1)))
    // deque of candidate positions; hashes increase front→back, rightmost
    // tie wins so equal values evict earlier positions
    val deque = new Array[Int](n)
    var head = 0; var tail = 0 // [head, tail)
    var lastSelected = -1
    var i = 0
    while (i < n) {
      val h = input.getLong(i)
      while (tail > head && input.getLong(deque(tail - 1)) >= h) tail -= 1
      deque(tail) = i; tail += 1
      while (deque(head) <= i - w) head += 1
      // a window ends at each i >= w-1; short sequences winnow as one window
      if (i >= w - 1 || i == n - 1) {
        val sel = deque(head)
        if (sel != lastSelected) {
          out.add(input.getLong(sel))
          lastSelected = sel
        }
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }
}
