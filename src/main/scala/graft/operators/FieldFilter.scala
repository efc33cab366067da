package graft.operators

import org.apache.spark.sql.DataFrame

/** Column include/exclude filtering with essential-field protection.
  *
  * Mirrors the reference's FieldsFilteringService
  * (/root/reference/src/main/scala/services/filters/FieldsFilteringService.scala:27-72)
  * and its server-side twin ColumnSummaryFieldsFilteringService
  * (ColumnSummaryFieldsFilteringService.scala:23-64): matching is
  * case-insensitive, and dropping an essential field (PKs, merge key, version
  * columns) is a configuration error, reported eagerly.
  *
  * On Spark this is a pure projection — Catalyst pushes the pruned column set
  * all the way into the parquet/JDBC scan, so the "server-side" and
  * "row-level" variants of the reference collapse into one operator.
  */
object FieldFilter {

  final case class FieldFilterError(message: String) extends IllegalArgumentException(message)

  /** Keep only `include` columns (case-insensitive); `essential` columns are
    * always retained and must not be explicitly excluded.
    */
  def include(df: DataFrame, includeCols: Seq[String], essential: Seq[String] = Nil): DataFrame = {
    val incl = includeCols.map(_.toLowerCase(java.util.Locale.ROOT)).toSet
    val ess = essential.map(_.toLowerCase(java.util.Locale.ROOT)).toSet
    val keep = df.columns.filter(c => incl.contains(c.toLowerCase(java.util.Locale.ROOT)) || ess.contains(c.toLowerCase(java.util.Locale.ROOT)))
    val missing = incl -- df.columns.map(_.toLowerCase(java.util.Locale.ROOT)).toSet
    if (missing.nonEmpty)
      throw FieldFilterError(s"include list references unknown columns: ${missing.mkString(", ")}")
    if (keep.isEmpty)
      throw FieldFilterError(
        "field filter would select zero columns (empty include list with no essential columns)")
    df.select(keep.head, keep.tail: _*)
  }

  /** Drop `excludeCols` (case-insensitive); excluding an essential field is an
    * error, matching the reference's PK-protection validation.
    */
  def exclude(df: DataFrame, excludeCols: Seq[String], essential: Seq[String] = Nil): DataFrame = {
    val excl = excludeCols.map(_.toLowerCase(java.util.Locale.ROOT)).toSet
    val ess = essential.map(_.toLowerCase(java.util.Locale.ROOT)).toSet
    val clash = excl.intersect(ess)
    if (clash.nonEmpty)
      throw FieldFilterError(s"cannot exclude essential fields: ${clash.mkString(", ")}")
    val keep = df.columns.filterNot(c => excl.contains(c.toLowerCase(java.util.Locale.ROOT)))
    if (keep.isEmpty)
      throw FieldFilterError(
        "field filter would select zero columns (exclude list covers every column)")
    df.select(keep.head, keep.tail: _*)
  }
}
