package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
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
  */
private[graft] object InputCheck {

  // NullType (a bare NULL literal) is always accepted: every guarded
  // expression is null-safe — eval short-circuits to NULL before the
  // kernel runs — and Spark's own typed functions accept NULL the same
  // way. Rejecting it would turn `graft_lang_id(NULL)` from a NULL result
  // into an AnalysisException.
  private def result(ok: Boolean, fn: String, expected: String,
                     actual: DataType): TypeCheckResult =
    if (ok || actual == NullType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$fn expects $expected, got ${actual.simpleString(2)}")

  /** Any string (collation-agnostic — the kernels operate on UTF8String). */
  def string(fn: String, actual: DataType): TypeCheckResult =
    result(actual.isInstanceOf[StringType], fn, "string", actual)

  def binary(fn: String, actual: DataType): TypeCheckResult =
    result(actual == BinaryType, fn, "binary", actual)

  def long(fn: String, actual: DataType): TypeCheckResult =
    result(actual == LongType, fn, "bigint", actual)

  /** `array<float>` or `array<double>` — the embedding-column contract. */
  def floatOrDoubleArray(fn: String, actual: DataType): TypeCheckResult =
    result(actual match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }, fn, "array<float|double>", actual)

  /** Strictly `array<float>` (kernels that read via `getFloat` only). */
  def floatArray(fn: String, actual: DataType): TypeCheckResult =
    result(actual match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }, fn, "array<float>", actual)
}
