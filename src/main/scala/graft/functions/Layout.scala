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

  /** Grid bounds a 2-D layout write used — persist them next to the table
    * (table properties / sidecar) so readers can route predicates through
    * [[bucketsForRange]] with the identical scaling.
    */
  final case class GridBounds2d(xMin: Long, xSpan: Long, yMin: Long, ySpan: Long)

  /** The write-side half: key the frame on the curve over (xCol, yCol),
    * bucket by the key's top `prefixBits`, and write one partition
    * directory per bucket with rows sorted by the full key inside — every
    * file gets a tight min/max bounding box in BOTH dimensions, and the
    * bucket column makes [[bucketsForRange]] routing partition-level
    * pruning (row-group min/max stats prune further inside each file).
    * One exchange total (the partition shuffle the sorted write needs
    * anyway). Bounds come from one 1-row aggregate — the only driver
    * round-trip.
    */
  def layoutWrite2d(df: org.apache.spark.sql.DataFrame, xCol: String,
                    yCol: String, bits: Int, prefixBits: Int, path: String,
                    hilbert: Boolean = false): GridBounds2d = {
    val r = df.agg(min(xCol).cast("long"), max(xCol).cast("long"),
      min(yCol).cast("long"), max(yCol).cast("long")).head()
    val b = GridBounds2d(r.getLong(0), math.max(r.getLong(1) - r.getLong(0), 1L),
      r.getLong(2), math.max(r.getLong(3) - r.getLong(2), 1L))
    requireScaleSafe(b.xSpan, bits, xCol)
    requireScaleSafe(b.ySpan, bits, yCol)
    val zx = expr(scaledSql(xCol, b.xMin.toString, b.xSpan.toString, bits, duck = false))
    val zy = expr(scaledSql(yCol, b.yMin.toString, b.ySpan.toString, bits, duck = false))
    val key = if (hilbert) hilbertKey(bits, zx, zy) else zOrderKey(bits, zx, zy)
    df.withColumn("__layout_key", key)
      .withColumn("bucket", shiftright(col("__layout_key"), bits * 2 - prefixBits))
      .repartition(col("bucket"))
      .sortWithinPartitions(col("bucket"), col("__layout_key"))
      .drop("__layout_key")
      .write.partitionBy("bucket").mode("overwrite").parquet(path)
    b
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
  /** Inverse Hilbert walk (d → (x, y)) — the read-side router needs it to
    * locate the aligned subquadrant a key-prefix bucket covers.
    */
  def hilbertD2xy(order: Int, d: Long): (Long, Long) = {
    var x = 0L; var y = 0L
    var t = d
    var s = 1L
    val n = 1L << order
    while (s < n) {
      val rx = 1L & (t / 2)
      val ry = 1L & (t ^ rx)
      if (ry == 0L) {
        if (rx == 1L) { x = s - 1 - x; y = s - 1 - y }
        val tmp = x; x = y; y = tmp
      }
      x += s * rx
      y += s * ry
      t /= 4
      s <<= 1
    }
    (x, y)
  }

  /** The grid tile (aligned box) a key-prefix bucket covers. For a Morton
    * key over `nDims` dims, bucket bit j is key bit (bits·nDims − prefixBits
    * + j), which belongs to dim (that position mod nDims) — de-interleaving
    * the bucket id yields each dim's tile index; tile width = 2^(bits −
    * prefixBits/nDims). For Hilbert (2-D), the bucket IS the order-
    * (prefixBits/2) curve position of the subquadrant — invert with
    * [[hilbertD2xy]]. Returns per-dim [lo, hi] inclusive grid bounds.
    */
  def bucketTile(bucket: Long, bits: Int, nDims: Int, prefixBits: Int,
                 hilbert: Boolean): Seq[(Long, Long)] = {
    require(prefixBits % nDims == 0, "prefixBits must split evenly across dims")
    val tileBitsPerDim = prefixBits / nDims
    val tileWidth = 1L << (bits - tileBitsPerDim)
    val tiles: Seq[Long] =
      if (hilbert) {
        require(nDims == 2, "hilbert routing is 2-D")
        val (tx, ty) = hilbertD2xy(tileBitsPerDim, bucket)
        Seq(tx, ty)
      } else {
        (0 until nDims).map { d =>
          (0 until tileBitsPerDim).foldLeft(0L) { (acc, i) =>
            acc | (((bucket >> (i * nDims + d)) & 1L) << i)
          }
        }
      }
    tiles.map(t => (t * tileWidth, (t + 1) * tileWidth - 1))
  }

  /** Read-side router: which key-prefix buckets can contain a grid-range
    * predicate `lo ≤ dim ≤ hi`? Enumerates the 2^prefixBits tiles (a
    * partition-level constant — 64 for the default 6-bit prefix) and keeps
    * those whose tile overlaps the range. With the table partitioned by
    * bucket, `col("bucket").isin(result: _*)` turns a predicate on EITHER
    * curve dimension into partition pruning — the point of the layout.
    */
  def bucketsForRange(bits: Int, nDims: Int, prefixBits: Int, dim: Int,
                      lo: Long, hi: Long, hilbert: Boolean = false): Seq[Long] =
    (0L until (1L << prefixBits)).filter { b =>
      val (tLo, tHi) = bucketTile(b, bits, nDims, prefixBits, hilbert)(dim)
      tHi >= lo && tLo <= hi
    }

  /** The scaled-grid math computes `(v - min) * (2^bits - 1)` BEFORE the
    * integer divide, in 64-bit — a wide-span column (epoch microseconds:
    * span ~1e15) with bits=16 overflows and wraps IDENTICALLY in both
    * engines, so the oracle cannot catch it. Rejected up front instead:
    * span · (2^bits − 1) must fit a long. (Wide domains: pre-bucket the
    * column — e.g. microseconds → seconds — before layout.)
    */
  private[graft] def requireScaleSafe(span: Long, bits: Int, col: String): Unit = {
    val m = (1L << bits) - 1
    require(span <= Long.MaxValue / m,
      s"layout scaling of '$col' would overflow: span=$span * (2^$bits-1)=$m " +
        "exceeds Long range — reduce bits or pre-bucket the column")
  }

  /** Driver-side mirror of [[scaledSql]] — maps a raw predicate constant
    * onto the grid so [[bucketsForRange]] can route it.
    */
  def scaleValue(v: Long, min: Long, span: Long, bits: Int,
                 colName: String = "value"): Long = {
    requireScaleSafe(span, bits, colName)
    val m = (1L << bits) - 1
    val clamped = math.min(math.max(v, min), min + span)
    (clamped - min) * m / span
  }

  /** How much the read-side router skipped: total files in the layout,
    * files surviving bucket routing, files surviving the footer min/max
    * overlap check (= files actually opened for rows).
    */
  final case class PruneStats(filesTotal: Int, filesAfterBuckets: Int,
                              filesAfterFooters: Int)

  /** The composed read side of the layout story, end-to-end: scale the raw
    * predicate onto the grid, route it to curve-prefix buckets
    * ([[bucketsForRange]] — partition-level pruning), then drop every
    * surviving file whose parquet FOOTER min/max doesn't overlap the range
    * (file-level pruning, metadata-only reads via
    * [[graft.tools.FooterStats]]), and scan only what's left. The result is
    * bit-identical to the unpruned filtered scan — pruning only removes
    * files the predicate can't match (spec-asserted in `LayoutSpec`).
    *
    * This is what a transactional catalog's data-skipping does from its
    * stats manifest; without one, the footers ARE the manifest. At 100 TB
    * the footer pass reads a few KB per file, not rows — and only for files
    * that already survived bucket routing, so it's proportional to the
    * SELECTED fraction, not the corpus. `dim` 0/1 selects which curve
    * dimension the range predicate targets.
    */
  def prunedRangeScan2d(spark: org.apache.spark.sql.SparkSession, path: String,
                        b: GridBounds2d, bits: Int, prefixBits: Int,
                        xCol: String, yCol: String, dim: Int, lo: Long, hi: Long,
                        hilbert: Boolean = false)
      : (org.apache.spark.sql.DataFrame, PruneStats) = {
    require(dim == 0 || dim == 1, "dim selects xCol (0) or yCol (1)")
    val predCol = if (dim == 0) xCol else yCol
    val (dMin, dSpan) = if (dim == 0) (b.xMin, b.xSpan) else (b.yMin, b.ySpan)
    val gLo = scaleValue(lo, dMin, dSpan, bits, predCol)
    val gHi = scaleValue(hi, dMin, dSpan, bits, predCol)
    val buckets =
      bucketsForRange(bits, 2, prefixBits, dim, gLo, gHi, hilbert).toSet
    // per-file bounds from the actual footers (metadata-only)
    val perFile = graft.tools.FooterStats.int64ColumnBounds(path, predCol)
      .groupBy(_._1).map { case (f, gs) =>
        (f, gs.map(_._2).min, gs.map(_._3).max)
      }.toSeq
    val bucketRe = ".*[/\\\\]bucket=(\\d+)[/\\\\].*".r
    val inBuckets = perFile.filter { case (f, _, _) =>
      f match {
        case bucketRe(bs) => buckets.contains(bs.toLong)
        case _ => true // unbucketed files can't be ruled out by routing
      }
    }
    val selected = inBuckets.filter { case (_, mn, mx) => mx >= lo && mn <= hi }
    val base =
      if (selected.isEmpty)
        spark.read.option("basePath", path).parquet(path).filter(lit(false))
      else
        spark.read.option("basePath", path).parquet(selected.map(_._1): _*)
    (base.filter(col(predCol).between(lo, hi)),
      PruneStats(perFile.size, inBuckets.size, selected.size))
  }

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
