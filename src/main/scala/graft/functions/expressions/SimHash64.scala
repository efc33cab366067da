package graft.functions.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** 64-bit SimHash of a pre-hashed token array, fused into one narrow
  * expression: bit i of the fingerprint is set iff more than half the
  * token hashes have bit i set (majority vote per bit).
  *
  * A SimHash fingerprint is a pure per-row function of the token-hash
  * multiset, so — like [[MinHashSignatureExpr]] — it needs no explode and no
  * shuffle. This replaces the corpus-scale formulation (explode to one row
  * per token, groupBy(id) with 64 bit-vote `sum` aggregates + a count),
  * which shuffled |corpus tokens| rows through a 65-column generated
  * aggregate. Bit-for-bit identical to that aggregate's
  * `ones(i) * 2 > n` rule, including ties-toward-zero; the caller supplies
  * the same per-token hash (`xxhash64`) the exploded form applied.
  *
  * Ref semantics: near-dup detection supporting dedup, SURVEY §7.5; the
  * reference framework has no SimHash — training-data pipeline extension.
  */
case class SimHash64Expr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"simhash64 expects array<bigint>, got ${other.simpleString(2)}")
    }

  override protected def nullSafeEval(input: Any): Any =
    SimHash64Expr.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.expressions.SimHash64Expr.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "simhash64"
}

object SimHash64Expr {

  /** Static so generated code calls it directly. Empty arrays fingerprint
    * to 0 — callers filter empty token sets first to preserve the exploded
    * form's drop-empty-documents semantics.
    */
  def compute(input: ArrayData): Long = {
    val n = input.numElements()
    val ones = new Array[Int](64)
    var j = 0
    while (j < n) {
      val h = input.getLong(j)
      var i = 0
      while (i < 64) {
        ones(i) += ((h >>> i) & 1L).toInt
        i += 1
      }
      j += 1
    }
    var fp = 0L
    var i = 0
    while (i < 64) {
      if (ones(i) * 2 > n) fp |= (1L << i)
      i += 1
    }
    fp
  }
}
