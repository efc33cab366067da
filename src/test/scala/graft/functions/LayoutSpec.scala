package graft.functions

import graft.SparkSpec
import graft.functions.expressions.HilbertIndex2dExpr
import org.apache.spark.sql.functions._

/** Space-filling-curve layout keys (`Layout`): interleave fixtures, the
  * Column-vs-generated-SQL parity that the oracle device rests on, the
  * Hilbert curve's defining unit-step property (exhaustively, order 4), and
  * the locality guarantee the whole module exists for — a key-prefix bucket
  * pins an aligned tile in EVERY dimension, which single-column sort cannot.
  */
class LayoutSpec extends SparkSpec {
  import spark.implicits._

  test("zOrderKey: hand-computed interleave fixtures") {
    val rows = Seq((0xAL, 0x5L), (0L, 0L), (0xFFFFL, 0L), (0L, 0xFFFFL), (0xFFFFL, 0xFFFFL))
      .toDF("x", "y")
      .select(Layout.zOrderKey(16, $"x", $"y").as("z")).as[Long].collect()
    // x=1010b lands on even positions (2,6), y=0101b on odd (1,5): 68|34
    assert(rows(0) == 102L)
    assert(rows(1) == 0L)
    // dim 0 alone fills the even bits; dim 1 alone the odd bits
    assert(rows(2) == 0x55555555L)
    assert(rows(3) == 0xAAAAAAAAL)
    assert(rows(4) == 0xFFFFFFFFL)
  }

  test("zOrderKey Column form == zOrderSql generated text (the oracle device)") {
    val df = spark.range(0, 2000)
      .select((col("id") * 7919L % 65536L).as("x"), (col("id") * 104729L % 65536L).as("y"))
    val both = df.select(
      Layout.zOrderKey(16, $"x", $"y").as("a"),
      expr(Layout.zOrderSql(16, Seq("x", "y"))).as("b"))
    assert(both.filter($"a" =!= $"b").count() == 0)
  }

  test("hilbert order 1: the four quadrant fixtures") {
    assert(HilbertIndex2dExpr.compute(1, 0, 0) == 0L)
    assert(HilbertIndex2dExpr.compute(1, 0, 1) == 1L)
    assert(HilbertIndex2dExpr.compute(1, 1, 1) == 2L)
    assert(HilbertIndex2dExpr.compute(1, 1, 0) == 3L)
  }

  test("hilbert order 4: exhaustive — a bijection onto 0..255 with unit steps") {
    val pts = for (x <- 0 until 16; y <- 0 until 16)
      yield (HilbertIndex2dExpr.compute(4, x, y), (x, y))
    val byD = pts.sortBy(_._1)
    assert(byD.map(_._1) == (0L until 256L), "d must be a permutation of 0..255")
    byD.sliding(2).foreach { case Seq((_, (x1, y1)), (d2, (x2, y2))) =>
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) == 1,
        s"curve jumps at d=$d2: ($x1,$y1) -> ($x2,$y2)")
    }
  }

  test("hilbert Column path matches the static walk; null stays null") {
    val got = Seq[(java.lang.Long, java.lang.Long)]((3L, 7L), (null, 1L))
      .toDF("x", "y").select(Layout.hilbertKey(4, $"x", $"y")).collect()
    assert(got(0).getLong(0) == HilbertIndex2dExpr.compute(4, 3, 7))
    assert(got(1).isNullAt(0))
  }

  test("layout buckets pin an aligned tile per dimension; x-only sort does not") {
    // top 6 key bits = 3 high bits of each 16-bit dim -> every bucket bbox
    // must fit a 2^13-wide tile in BOTH dimensions. This is the structural
    // guarantee data skipping rests on, for both curves.
    for (q <- Seq("layout_zorder", "layout_hilbert")) {
      val agg = graft.SparkEntry.queries(q)(spark, sf)
        .select($"x_max" - $"x_min", $"y_max" - $"y_min")
        .as[(Long, Long)].collect()
      agg.foreach { case (xr, yr) =>
        assert(xr < 8192 && yr < 8192, s"$q bucket bbox ($xr,$yr) exceeds the 2^13 tile")
      }
    }
    // the single-column layout control: bucketing the same grid by zx alone
    // leaves some bucket spanning (nearly) the full y range — the layout
    // z/hilbert replaces
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
      .select($"l_partkey", $"l_suppkey")
    val b = li.agg(min("l_partkey").as("pmin"), max("l_partkey").as("pmax"),
        min("l_suppkey").as("smin"), max("l_suppkey").as("smax"))
      .select($"pmin", greatest($"pmax" - $"pmin", lit(1L)).as("pspan"),
        $"smin", greatest($"smax" - $"smin", lit(1L)).as("sspan"))
    val maxYRange = li.crossJoin(broadcast(b))
      .withColumn("zx", expr(Layout.scaledSql("l_partkey", "pmin", "pspan", 16, duck = false)))
      .withColumn("zy", expr(Layout.scaledSql("l_suppkey", "smin", "sspan", 16, duck = false)))
      .groupBy(shiftright($"zx", 10)).agg((max($"zy") - min($"zy")).as("yr"))
      .agg(max($"yr")).as[Long].collect().head
    assert(maxYRange > 8192, s"x-sorted control should leave y unconstrained (got $maxYRange)")
  }

  test("hilbertD2xy inverts the forward walk, exhaustively at order 4") {
    for (x <- 0 until 16; y <- 0 until 16) {
      val d = HilbertIndex2dExpr.compute(4, x, y)
      assert(Layout.hilbertD2xy(4, d) == ((x.toLong, y.toLong)))
    }
  }

  test("bucketTile contains every point of its bucket, both curves") {
    val pts = for (i <- 0 until 500) yield ((i * 7919L) % 65536L, (i * 104729L) % 65536L)
    for ((x, y) <- pts) {
      // driver-side mirror of the Column interleave
      val zkey = (0 until 16).foldLeft(0L)((acc, i) =>
        acc | (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1)))
      val hkey = HilbertIndex2dExpr.compute(16, x, y)
      for ((key, hil) <- Seq((zkey, false), (hkey, true))) {
        val tile = Layout.bucketTile(key >> 26, 16, 2, 6, hilbert = hil)
        assert(x >= tile(0)._1 && x <= tile(0)._2, s"x=$x outside ${tile(0)} hil=$hil")
        assert(y >= tile(1)._1 && y <= tile(1)._2, s"y=$y outside ${tile(1)} hil=$hil")
      }
    }
  }

  test("layoutWrite2d + bucketsForRange: a predicate on either dim prunes partitions") {
    for (hil <- Seq(false, true)) {
      val dir = java.nio.file.Files.createTempDirectory(s"layout$hil").toString
      val li = spark.read.parquet(s"$sf/lineitem.parquet")
        .select($"l_orderkey", $"l_partkey", $"l_suppkey")
      val bounds = Layout.layoutWrite2d(li, "l_partkey", "l_suppkey", 16, 6, dir, hil)
      val table = spark.read.parquet(dir)

      // range predicate on the SECOND dim — the one single-column sort
      // can't skip for
      val (lo, hi) = (5L, 20L)
      val gLo = Layout.scaleValue(lo, bounds.yMin, bounds.ySpan, 16)
      val gHi = Layout.scaleValue(hi, bounds.yMin, bounds.ySpan, 16)
      val buckets = Layout.bucketsForRange(16, 2, 6, dim = 1, gLo, gHi, hil)
      assert(buckets.size < 64, "router must not select every bucket")

      val routed = table
        .filter($"bucket".isin(buckets: _*) && $"l_suppkey".between(lo, hi))
      val full = li.filter($"l_suppkey".between(lo, hi))
      assert(routed.count() == full.count(), "routing must lose no rows")

      val filesTouched = routed.select(input_file_name()).distinct().count()
      val filesTotal = table.select(input_file_name()).distinct().count()
      assert(filesTouched < filesTotal,
        s"hil=$hil: pruning read $filesTouched of $filesTotal files")
    }
  }

  test("real parquet footers: every layout file is min/max-skippable on BOTH dims") {
    import graft.tools.FooterStats
    val dir = java.nio.file.Files.createTempDirectory("layoutfooter").toString
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
      .select($"l_orderkey", $"l_partkey", $"l_suppkey")
    Layout.layoutWrite2d(li, "l_partkey", "l_suppkey", 16, 6, dir)
    // raw-unit tile width: 3 prefix bits per dim -> span/8 (+1 rounding)
    val b = li.agg(max("l_partkey") - min("l_partkey"),
      max("l_suppkey") - min("l_suppkey")).as[(Long, Long)].collect().head
    val (pTile, sTile) = (b._1 / 8 + 2, b._2 / 8 + 2)
    val pStats = FooterStats.int64ColumnBounds(dir, "l_partkey")
    val sStats = FooterStats.int64ColumnBounds(dir, "l_suppkey")
    assert(pStats.nonEmpty && sStats.nonEmpty, "footers must be readable")
    pStats.foreach { case (f, mn, mx, _, _) =>
      assert(mx - mn <= pTile, s"$f partkey range ${mx - mn} exceeds the tile $pTile")
    }
    sStats.foreach { case (f, mn, mx, _, _) =>
      assert(mx - mn <= sTile, s"$f suppkey range ${mx - mn} exceeds the tile $sTile")
    }
    // control: the same data written WITHOUT the layout leaves suppkey
    // unskippable (some file spans nearly the full range)
    val ctlDir = java.nio.file.Files.createTempDirectory("layoutctl").toString
    li.repartition(8).write.mode("overwrite").parquet(ctlDir)
    val ctl = FooterStats.int64ColumnBounds(ctlDir, "l_suppkey")
    assert(ctl.exists { case (_, mn, mx, _, _) => mx - mn > sTile * 2 },
      "control files should be wide on suppkey for this proof to mean anything")
  }

  test("scaledSql: constant column scales to 0; extremes hit the grid edges") {
    val df = Seq((5L, 5L, 1L, 0L, 100L, 100L), (105L, 5L, 100L, 100L, 100L, 100L))
      .toDF("v", "vmin", "vspan", "expect", "cmin", "cspan")
    val got = df.select(
      expr(Layout.scaledSql("v", "vmin", "vspan", 16, duck = false)).as("s"),
      expr(Layout.scaledSql("cmin", "cmin", "cspan", 16, duck = false)).as("c"))
      .as[(Long, Long)].collect()
    assert(got(0) == ((0L, 0L)), "v at min -> 0; constant column -> 0")
    assert(got(1)._1 == 65535L, "v at max -> 2^16-1")
  }

  test("prunedRangeScan2d: files skipped at both levels; result identical to the full scan") {
    for (hil <- Seq(false, true)) {
      val dir = java.nio.file.Files.createTempDirectory(s"layoutscan$hil").toString
      val li = spark.read.parquet(s"$sf/lineitem.parquet")
        .select($"l_orderkey", $"l_partkey", $"l_suppkey")
      val bounds = Layout.layoutWrite2d(li, "l_partkey", "l_suppkey", 16, 6, dir, hil)
      val (scanned, stats) = Layout.prunedRangeScan2d(spark, dir, bounds,
        16, 6, "l_partkey", "l_suppkey", dim = 1, lo = 5L, hi = 20L, hilbert = hil)
      // (a) the router + footers actually skip files
      assert(stats.filesAfterBuckets < stats.filesTotal,
        s"hil=$hil: bucket routing skipped nothing: $stats")
      assert(stats.filesAfterFooters <= stats.filesAfterBuckets)
      assert(stats.filesAfterFooters < stats.filesTotal,
        s"hil=$hil: no file-level skipping: $stats")
      // (b) pruning is lossless — identical multiset of rows
      val got = scanned.select($"l_orderkey", $"l_partkey", $"l_suppkey")
        .as[(Long, Long, Long)].collect().sorted.toSeq
      val want = li.filter($"l_suppkey".between(5L, 20L))
        .as[(Long, Long, Long)].collect().sorted.toSeq
      assert(got == want, s"hil=$hil: pruned scan lost or invented rows")
      // and the plan touches no file outside the selected set (a selected
      // file can still yield 0 rows — footer overlap is necessary, not
      // sufficient — hence <=)
      val filesRead = scanned.select(input_file_name()).distinct().count()
      assert(filesRead <= stats.filesAfterFooters)
    }
  }

  test("overflow guard: wide-span scaling is rejected up front, not silently wrapped") {
    // span ~1e15 (epoch microseconds over ~30 years) at bits=16 overflows
    // (v-min)*(2^16-1) in 64-bit — both engines would wrap identically, so
    // the oracle can't catch it; the API must refuse instead.
    val wideSpan = 1000000000000000L
    intercept[IllegalArgumentException] {
      Layout.scaleValue(wideSpan / 2, 0L, wideSpan, 16)
    }
    // the same span is fine at a coarser grid
    assert(Layout.scaleValue(wideSpan / 2, 0L, wideSpan, 8) == 127L)
    // and layoutWrite2d refuses before writing anything
    import spark.implicits._
    val df = Seq((0L, 0L), (wideSpan, 1L)).toDF("x", "y")
    val dir = java.nio.file.Files.createTempDirectory("layoutovf").toString
    intercept[IllegalArgumentException] {
      Layout.layoutWrite2d(df, "x", "y", bits = 16, prefixBits = 4, dir)
    }
  }

  test("footer bounds are conservative: INT32 widens, null/missing stats never prune") {
    import graft.tools.FooterStats
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("footercons").toString
    Seq((7, Option.empty[Long], "a"), (9, Option.empty[Long], "b"))
      .toDF("i32", "allnull", "s")
      .coalesce(1).write.mode("overwrite").parquet(dir)
    // INT32 physical type: promoted to long bounds, not a ClassCastException
    val i32 = FooterStats.int64ColumnBounds(dir, "i32")
    assert(i32.nonEmpty && i32.forall { case (_, mn, mx, _, _) => mn == 7L && mx == 9L })
    // all-null column: no usable stats → full-range bounds, not an NPE
    val nul = FooterStats.int64ColumnBounds(dir, "allnull")
    assert(nul.nonEmpty && nul.forall { case (_, mn, mx, _, _) =>
      mn == Long.MinValue && mx == Long.MaxValue })
    // column absent from the file entirely: same conservative full range
    val missing = FooterStats.int64ColumnBounds(dir, "no_such_col")
    assert(missing.nonEmpty && missing.forall { case (_, mn, mx, _, _) =>
      mn == Long.MinValue && mx == Long.MaxValue })
    // non-integer physical type: conservative, not a ClassCastException
    val str = FooterStats.int64ColumnBounds(dir, "s")
    assert(str.nonEmpty && str.forall { case (_, mn, mx, _, _) =>
      mn == Long.MinValue && mx == Long.MaxValue })
  }
}
