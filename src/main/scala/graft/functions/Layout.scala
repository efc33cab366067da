package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.{ColumnBridge => ExpressionUtils}

import graft.functions.expressions.HilbertIndex2dExpr

/** Multi-column data layout keys — the write-side half of data skipping at
  * 100 TB. A table range-partitioned and sorted by a space-filling-curve key
  * over its two (or more) hottest filter columns produces parquet files
  * whose per-file min/max stats are tight in EVERY keyed dimension, so a
  * predicate on any one of them prunes most files before a byte is read
  * (the Delta/Iceberg `OPTIMIZE ZORDER BY` idea). Single-column sort gives
  * that only for the first column; the curve key gives it for all of them
  * at a bounded loss per dimension.
  *
  * Everything here is engine-portable by construction: the Morton key is
  * composed from codegen'd shift/mask builtins, and each helper has a SQL
  * renderer the DuckDB oracle runs verbatim — the Spark Column and the
  * oracle text are generated from the same term list, so the two engines
  * cannot drift.
  *
  * Scale posture: key computation is map-side (zero shuffle); the one
  * exchange a layout job needs is the `repartitionByRange(key)` before the
  * write, which is exactly the exchange the sorted write requires anyway.
  * Min/max bounds for scaling attach via the scalar-broadcast idiom (a
  * no-grouping aggregate cross-joined in-plan — one extra pass over the
  * stats-bearing columns, no driver round-trip).
  */
object Layout {

  /** Morton (Z-order) interleave of pre-scaled non-negative coordinates:
    * bit i of dimension d lands at position `i * nDims + d`, so a prefix of
    * the key pins an aligned tile in every dimension at once. Composed
    * entirely from builtin shift/and/or Columns — no UDF, no custom node,
    * one whole-stage-codegen span.
    */
  def zOrderKey(bits: Int, cols: Column*): Column = {
    require(cols.nonEmpty, "zOrderKey needs at least one column")
    require(bits >= 1 && bits * cols.size <= 63,
      s"bits=$bits over ${cols.size} dims must stay within a positive long")
    val n = cols.size
    val terms =
      for { (c, d) <- cols.zipWithIndex; i <- 0 until bits }
        yield shiftleft(shiftright(c, i).bitwiseAND(lit(1L)), i * n + d)
    terms.reduce(_ bitwiseOR _)
  }

  /** [[zOrderKey]] rendered as SQL over column names — same term list, so
    * the oracle replays the interleave bit-for-bit. Valid in both Spark SQL
    * and DuckDB (plain `>> << & |` with full parenthesization).
    */
  def zOrderSql(bits: Int, cols: Seq[String]): String = {
    require(cols.nonEmpty && bits >= 1 && bits * cols.size <= 63)
    val n = cols.size
    val terms =
      for { (c, d) <- cols.zipWithIndex; i <- 0 until bits }
        yield s"((($c >> $i) & 1) << ${i * n + d})"
    terms.mkString("(", " | ", ")")
  }

  /** Exact integer min-max scaling into [0, 2^bits): both engines evaluate
    * `((v - min) * (2^bits - 1)) intdiv span` in pure integer math (`div`
    * in Spark SQL, `//` in DuckDB — identical on non-negative operands), so
    * the grid coordinate is bit-identical across engines. `span` must be
    * `greatest(max - min, 1)` so a constant column scales to 0 instead of
    * dividing by zero.
    */
  def scaledSql(col: String, minCol: String, spanCol: String, bits: Int,
                duck: Boolean): String = {
    val m = (1L << bits) - 1
    val intdiv = if (duck) "//" else "div"
    s"((($col - $minCol) * CAST($m AS BIGINT)) $intdiv $spanCol)"
  }

  /** Hilbert-curve index of two pre-scaled coordinates — strictly better
    * locality than Morton (unit steps only; a key prefix still pins an
    * aligned subquadrant). Runs as one fused codegen'd walk per row.
    */
  def hilbertKey(order: Int, x: Column, y: Column): Column =
    ExpressionUtils.column(HilbertIndex2dExpr(
      ExpressionUtils.expression(x), ExpressionUtils.expression(y), order))

  /** The same xy→d walk as a DuckDB recursive CTE: each row iterates the
    * rotate-and-accumulate step from s = 2^(order-1) down to s = 0,
    * carrying (x, y, s, d); the terminal s = 0 rows hold the index. `carry`
    * lists pass-through columns (row identity / original coordinates for
    * bounding-box aggregation downstream).
    */
  def hilbertSqlCte(order: Int, srcCte: String, xCol: String, yCol: String,
                    carry: Seq[String]): String = {
    val s0 = 1L << (order - 1)
    val carryCols = if (carry.isEmpty) "" else carry.mkString(", ") + ","
    s"""hil AS (
       |  SELECT $carryCols $xCol AS hx, $yCol AS hy,
       |         CAST($s0 AS BIGINT) AS hs, CAST(0 AS BIGINT) AS hd
       |  FROM $srcCte
       |  UNION ALL
       |  SELECT $carryCols
       |    CASE WHEN (hy & hs) <> 0 THEN hx
       |         WHEN (hx & hs) <> 0 THEN hs - 1 - hy ELSE hy END,
       |    CASE WHEN (hy & hs) <> 0 THEN hy
       |         WHEN (hx & hs) <> 0 THEN hs - 1 - hx ELSE hx END,
       |    hs // 2,
       |    hd + hs * hs * xor(3 * (CASE WHEN (hx & hs) <> 0 THEN 1 ELSE 0 END),
       |                       (CASE WHEN (hy & hs) <> 0 THEN 1 ELSE 0 END))
       |  FROM hil WHERE hs > 0
       |)""".stripMargin
  }

}
