package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.types._

/** Analysis-time input-type guards for the engine's expressions.
  *
  * Every expression here is registered as a SQL function
  * ([[graft.GraftExtensions]]), so a wrong-typed argument can arrive from a
  * plain `spark.sql(...)` string. Without a `checkInputDataTypes` the error
  * surfaces as a `ClassCastException` inside a running executor task —
  * after a scan has already been scheduled — instead of an
  * `AnalysisException` at plan time. These helpers make the one-line
  * override cheap so no expression has a reason to skip it.
  *
  * NullType handling: a FOLDABLE NullType child (a bare NULL literal, or
  * any expression constant-folding to one) is accepted — the whole guarded
  * expression is then itself foldable and the optimizer collapses it to a
  * NULL literal before codegen, so `graft_lang_id(NULL)` stays a NULL
  * result. A NON-foldable NullType child (a provably-all-NULL computed
  * column, e.g. a CASE whose every branch is NULL) is rejected with the
  * typed error instead: such a child would survive to `doGenCode`, where
  * the generated kernel call receives an `Object`-typed slot and fails
  * Janino compilation — results would still be right (eval is null-safe)
  * but whole-stage codegen would silently fall back for the entire stage.
  * A degenerate input earning a clear analysis error beats that.
  */
private[graft] object InputCheck {

  private def result(ok: Boolean, fn: String, expected: String,
                     child: Expression): TypeCheckResult =
    if (ok || (child.dataType == NullType && child.foldable))
      TypeCheckResult.TypeCheckSuccess
    else if (child.dataType == NullType)
      TypeCheckResult.TypeCheckFailure(
        s"$fn expects $expected, got a non-literal always-NULL input — " +
          "cast it to the expected type")
    else TypeCheckResult.TypeCheckFailure(
      s"$fn expects $expected, got ${child.dataType.simpleString(2)}")

  /** Any string (collation-agnostic — the kernels operate on UTF8String). */
  def string(fn: String, child: Expression): TypeCheckResult =
    result(child.dataType.isInstanceOf[StringType], fn, "string", child)

  def binary(fn: String, child: Expression): TypeCheckResult =
    result(child.dataType == BinaryType, fn, "binary", child)

  def long(fn: String, child: Expression): TypeCheckResult =
    result(child.dataType == LongType, fn, "bigint", child)

  /** `array<float>` or `array<double>` — the embedding-column contract. */
  def floatOrDoubleArray(fn: String, child: Expression): TypeCheckResult =
    result(child.dataType match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }, fn, "array<float|double>", child)

  /** Strictly `array<float>` (kernels that read via `getFloat` only). */
  def floatArray(fn: String, child: Expression): TypeCheckResult =
    result(child.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }, fn, "array<float>", child)
}
