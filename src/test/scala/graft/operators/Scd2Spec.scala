package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.prop.TableDrivenPropertyChecks

class Scd2Spec extends SparkSpec with TableDrivenPropertyChecks {
  import spark.implicits._

  // change stream: (key, version, state, isDelete)
  private def changes(rows: (String, Long, String, Boolean)*): DataFrame =
    rows.toDF("k", "v", "state", "del")

  private def build(df: DataFrame): DataFrame =
    Scd2.buildHistory(df, "k", "v", Seq("state"), isDelete = col("del"))

  private def collected(df: DataFrame): Seq[(String, String, Long, Option[Long], Boolean)] =
    df.select($"k", $"state", $"valid_from", $"valid_to", $"is_current")
      .as[(String, String, Long, Option[Long], Boolean)]
      .collect().sortBy(r => (r._1, r._3)).toSeq

  test("state runs collapse; transitions open intervals; last is current") {
    val out = collected(build(changes(
      ("k1", 1L, "a", false), ("k1", 2L, "a", false), // same state → one run
      ("k1", 3L, "b", false),                         // transition
      ("k1", 5L, "a", false))))                       // back to a → new run
    assert(out == Seq(
      ("k1", "a", 1L, Some(3L), false),
      ("k1", "b", 3L, Some(5L), false),
      ("k1", "a", 5L, None, true)))
  }

  test("delete closes the interval; re-insert reopens") {
    val out = collected(build(changes(
      ("k1", 1L, "a", false),
      ("k1", 4L, "a", true),    // tombstone: closes at 4, emits no row
      ("k1", 9L, "a", false))))
    assert(out == Seq(
      ("k1", "a", 1L, Some(4L), false),
      ("k1", "a", 9L, None, true)))
  }

  test("re-delivered (key, version) rows do not fragment history") {
    val once = changes(("k1", 1L, "a", false), ("k1", 3L, "b", false))
    val replayed = once.union(once)
    assert(collected(build(replayed)) == collected(build(once)))
  }

  test("asOf returns the state live at the version, exclusive of closes") {
    val h = build(changes(
      ("k1", 1L, "a", false), ("k1", 3L, "b", false),
      ("k2", 2L, "x", false), ("k2", 5L, "x", true)))
    def at(v: Long): Seq[(String, String)] =
      Scd2.asOf(h, lit(v)).select($"k", $"state").as[(String, String)]
        .collect().sorted.toSeq
    assert(at(1L) == Seq("k1" -> "a"))
    assert(at(2L) == Seq("k1" -> "a", "k2" -> "x"))
    assert(at(4L) == Seq("k1" -> "b", "k2" -> "x"))
    assert(at(5L) == Seq("k1" -> "b")) // k2 deleted at 5 (exclusive close)
    assert(at(0L) == Seq.empty)
  }

  test("asOfJoin picks the interval covering each fact; gaps and pre-birth drop") {
    val h = build(changes(
      ("k1", 1L, "a", false), ("k1", 5L, "b", false),  // a:[1,5), b:[5,∞)
      ("k2", 2L, "x", false), ("k2", 6L, "x", true)))  // x:[2,6), deleted
    val facts = Seq(
      ("k1", 3L), ("k1", 5L), ("k1", 9L), // a, b (open at 5), b
      ("k2", 2L), ("k2", 7L),             // x, dropped (deletion gap)
      ("k1", 0L),                         // dropped (pre-birth)
      ("k3", 4L)                          // dropped (no history)
    ).toDF("k", "fv")
    val out = Scd2.asOfJoin(facts, h, "k", col("fv"))
      .select($"k", $"fv", $"state").as[(String, Long, String)]
      .collect().sortBy(r => (r._1, r._2)).toSeq
    assert(out == Seq(("k1", 3L, "a"), ("k1", 5L, "b"), ("k1", 9L, "b"),
      ("k2", 2L, "x")))
  }

  test("incremental applyChanges == full rebuild, across split points") {
    // a stream with runs, deletes, re-inserts, and a key absent from batch 2
    val all = Seq(
      ("k1", 1L, "a", false), ("k1", 2L, "a", false), ("k1", 3L, "b", false),
      ("k1", 6L, "b", true), ("k1", 8L, "c", false),
      ("k2", 1L, "x", false), ("k2", 4L, "y", false),
      ("k3", 2L, "m", false))
    val expected = collected(build(changes(all: _*)))
    forAll(Table("split", 1, 3, 5, 7)) { split =>
      val (a, b) = all.partition(_._2 <= split)
      val h0 = build(changes(a: _*))
      val h1 = Scd2.applyChanges(h0, changes(b: _*), "k", "v", Seq("state"),
        isDelete = col("del"))
      assert(collected(h1) == expected, s"split at $split")
    }
  }

  test("applyChanges replaying an already-applied batch is a no-op") {
    val a = changes(("k1", 1L, "a", false), ("k2", 2L, "x", false))
    val b = changes(("k1", 5L, "b", false), ("k2", 6L, "x", true))
    val h1 = Scd2.applyChanges(build(a), b, "k", "v", Seq("state"), col("del"))
    val h2 = Scd2.applyChanges(h1, b, "k", "v", Seq("state"), col("del"))
    assert(collected(h2) == collected(h1))
  }

  test("null tracked state is handled null-safely (no phantom boundaries)") {
    val df = Seq(
      ("k1", 1L, None: Option[String], false),
      ("k1", 2L, None: Option[String], false), // null == null → same run
      ("k1", 3L, Some("a"), false))            // null → a is a transition
      .toDF("k", "v", "state", "del")
    val out = Scd2.buildHistory(df, "k", "v", Seq("state"), col("del"))
      .select($"state", $"valid_from").as[(Option[String], Long)]
      .collect().sortBy(_._2).toSeq
    assert(out == Seq((None, 1L), (Some("a"), 3L)))
  }

  test("asOfJoinBucketed == asOfJoin for every bucket width, hot keys included") {
    // a HOT key with many short intervals (the case the bucketing bounds),
    // a normal key, an all-deleted key, and an open current interval
    val rnd = new scala.util.Random(13)
    val hot = (1L to 400L).map(v =>
      ("hot", v, s"s${rnd.nextInt(5)}", rnd.nextInt(10) == 0))
    val rest = Seq(
      ("k1", 10L, "a", false), ("k1", 300L, "b", false),
      ("k2", 50L, "x", false), ("k2", 60L, "x", true))
    val h = build(changes(hot ++ rest: _*))
    val facts = ((1L to 500L by 7L).map(v => ("hot", v)) ++
      Seq(("k1", 5L), ("k1", 11L), ("k1", 299L), ("k1", 301L), ("k1", 450L),
        ("k2", 55L), ("k2", 60L), ("k3", 7L))).toDF("k", "fv")
    def sortedOut(df: DataFrame) =
      df.select($"k", $"fv", $"state", $"valid_from")
        .as[(String, Long, String, Long)].collect().sortBy(r => (r._1, r._2)).toSeq
    val expected = sortedOut(Scd2.asOfJoin(facts, h, "k", col("fv")))
    assert(expected.nonEmpty)
    forAll(Table("bucketWidth", 1L, 3L, 16L, 100L, 10000L)) { w =>
      assert(sortedOut(Scd2.asOfJoinBucketed(facts, h, "k", col("fv"), w))
        == expected, s"bucketWidth $w")
    }
    // the auto-derived width is just another point on the same axis —
    // identical output with no width parameter supplied
    assert(sortedOut(Scd2.asOfJoinBucketedAuto(facts, h, "k", col("fv")))
      == expected, "auto-derived bucket width")
  }

  test("auto width ≈ median closed-interval length; candidates bounded like the manual pick") {
    // the hot-key fixture of the bound test: 200 single-version intervals,
    // so the median closed length is exactly 1 — the width the manual
    // parameter's doc tells callers to aim for
    val h = build(changes((1L to 200L).map(v =>
      ("hot", v, s"s$v", false)): _*))
    val facts = (1L to 200L by 10L).map(v => ("hot", v)).toDF("k", "fv")
    val w = Scd2.autoBucketWidthFrame(h, facts, col("fv")).collect()(0).getLong(0)
    assert(w == 1L, s"expected the median interval length 1, derived $w")
    // candidate bound at the derived width matches the manual formula's:
    // ≤ (w + 1) candidates per fact on single-version intervals
    val cap = facts.agg(max($"fv").as("__cap"))
    val hb = h.crossJoin(broadcast(cap))
      .withColumn("__b", explode(sequence(
        floor($"valid_from" / w),
        greatest(floor(least(coalesce($"valid_to" - 1, $"__cap"), $"__cap") / w),
          floor($"valid_from" / w)))))
    val autoCandidates = facts.withColumn("__b", floor($"fv" / w)).as("f")
      .join(hb.as("h"), col("f.k") === col("h.k") && col("f.__b") === col("h.__b"))
      .count()
    assert(autoCandidates <= facts.count() * (w + 1),
      s"auto-width candidates $autoCandidates not bounded by bucket occupancy")
  }

  test("auto width falls back to the version span when every interval is open") {
    // one interval per key, all open — no closed length to take a median
    // of; the span fallback keeps the explode at a handful of buckets and
    // the output identical to the plain join
    val h = Seq(("k1", "a", 3L, None: Option[Long]),
      ("k2", "b", 90L, None: Option[Long]))
      .toDF("k", "state", "valid_from", "valid_to")
    val facts = Seq(("k1", 5L), ("k2", 95L), ("k2", 89L)).toDF("k", "fv")
    val w = Scd2.autoBucketWidthFrame(h, facts, col("fv")).collect()(0).getLong(0)
    assert(w == 88L, s"expected max(from)−min(from)+1 = 88, derived $w")
    def sortedOut(df: DataFrame) =
      df.select($"k", $"fv", $"state").as[(String, Long, String)]
        .collect().sortBy(r => (r._1, r._2)).toSeq
    assert(sortedOut(Scd2.asOfJoinBucketedAuto(facts, h, "k", col("fv")))
      == sortedOut(Scd2.asOfJoin(facts, h, "k", col("fv"))))
  }

  test("a far-future sentinel close (Long.MaxValue instead of NULL) cannot explode the bucketing") {
    // buildHistory emits NULL valid_to for open intervals, but a history
    // table written by another tool may carry a sentinel close instead;
    // without the cap clamp on CLOSED intervals, sequence() would try to
    // materialize (Long.MaxValue − from)/bucketWidth bucket ids and fail
    // the job — with it the sentinel behaves exactly like an open interval
    val h = Seq(
      ("k1", "a", 1L, Some(5L)),
      ("k1", "b", 5L, Some(Long.MaxValue)), // sentinel "open"
      ("k2", "x", 2L, None: Option[Long]))  // genuinely open
      .toDF("k", "state", "valid_from", "valid_to")
    val facts = Seq(("k1", 3L), ("k1", 7L), ("k2", 9L)).toDF("k", "fv")
    def sortedOut(df: DataFrame) =
      df.select($"k", $"fv", $"state").as[(String, Long, String)]
        .collect().sortBy(r => (r._1, r._2)).toSeq
    val expected = sortedOut(Scd2.asOfJoin(facts, h, "k", col("fv")))
    assert(expected == Seq(("k1", 3L, "a"), ("k1", 7L, "b"), ("k2", 9L, "x")))
    assert(sortedOut(Scd2.asOfJoinBucketed(facts, h, "k", col("fv"), 2L))
      == expected)
  }

  test("bucketing bounds the hot key's pre-filter candidate set") {
    // hot key: 200 single-version intervals. The plain as-of join's
    // candidate set per fact is ALL 200; with bucketWidth 4 a fact meets
    // only the intervals overlapping its bucket.
    val h = build(changes((1L to 200L).map(v =>
      ("hot", v, s"s$v", false)): _*))
    val facts = (1L to 200L by 10L).map(v => ("hot", v)).toDF("k", "fv")
    val plainCandidates = facts.as("f")
      .join(h.as("h"), col("f.k") === col("h.k")).count()
    // replicate the bucketed join WITHOUT the interval filter
    val w = 4L
    val cap = facts.agg(max($"fv").as("__cap"))
    val hb = h.crossJoin(broadcast(cap))
      .withColumn("__b", explode(sequence(
        floor($"valid_from" / w),
        greatest(floor(coalesce($"valid_to" - 1, $"__cap") / w),
          floor($"valid_from" / w)))))
    val bucketedCandidates = facts.withColumn("__b", floor($"fv" / w)).as("f")
      .join(hb.as("h"), col("f.k") === col("h.k") && col("f.__b") === col("h.__b"))
      .count()
    info(s"pre-filter candidates: plain=$plainCandidates bucketed=$bucketedCandidates " +
      s"(factor ${plainCandidates.toDouble / bucketedCandidates})")
    assert(plainCandidates == 20L * 200L)
    // ≤ (bucketWidth + 1) candidates per fact: intervals are 1 version long
    assert(bucketedCandidates <= facts.count() * (w + 1),
      s"bucketed candidates $bucketedCandidates not bounded by bucket occupancy")
  }

  test("facts far beyond the last state change cannot explode the auto width") {
    // timestamp/LSN version domains: a key stabilizes early (closed
    // intervals with tiny median length) while facts keep arriving for
    // eons — the open interval spans cap − from versions, and a width
    // chosen from interval LENGTHS alone would explode it to billions of
    // buckets (a hard sequence() failure). The span floor caps the
    // explode at ≤ ~4097 buckets per interval whatever the domain.
    val h = Seq(
      ("k1", "a", 1L, Some(3L)), ("k1", "b", 3L, Some(5L)), // median len 2
      ("k1", "c", 5L, None: Option[Long]))                  // open, stable
      .toDF("k", "state", "valid_from", "valid_to")
    val far = 10_000_000_000L // cap − from ≈ 1e10 ≫ sequence() limit / 2
    val facts = Seq(("k1", 2L), ("k1", 4L), ("k1", far)).toDF("k", "fv")
    val w = Scd2.autoBucketWidthFrame(h, facts, col("fv")).collect()(0).getLong(0)
    assert(w >= far / 4096L, s"span floor must bound the explode, got width $w")
    val out = Scd2.asOfJoinBucketedAuto(facts, h, "k", col("fv"))
      .select($"k", $"fv", $"state").as[(String, Long, String)]
      .collect().sortBy(_._2).toSeq
    assert(out == Seq(("k1", 2L, "a"), ("k1", 4L, "b"), ("k1", far, "c")))
  }

  test("auto-width join degrades cleanly on empty history / empty facts") {
    val h = Seq(("k1", "a", 1L, None: Option[Long]))
      .toDF("k", "state", "valid_from", "valid_to")
    val emptyH = h.limit(0)
    val facts = Seq(("k1", 5L)).toDF("k", "fv")
    val emptyF = facts.limit(0)
    // empty history → width coalesces to 1, zero output rows
    assert(Scd2.autoBucketWidthFrame(emptyH, facts, col("fv"))
      .collect()(0).getLong(0) == 1L)
    assert(Scd2.asOfJoinBucketedAuto(facts, emptyH, "k", col("fv")).count() == 0)
    // empty facts → NULL cap drops out of the width (greatest skips nulls)
    // and the join is empty without errors
    assert(Scd2.autoBucketWidthFrame(h, emptyF, col("fv"))
      .collect()(0).getLong(0) >= 1L)
    assert(Scd2.asOfJoinBucketedAuto(emptyF, h, "k", col("fv")).count() == 0)
  }

  test("auto-width == plain as-of join on randomized histories (property)") {
    // random change streams (hot keys, deletes, re-inserts, sparse keys)
    // and random facts: the derived width must never change the answer,
    // whatever the interval-length distribution looks like
    val rnd = new scala.util.Random(41)
    for (trial <- 1 to 3) {
      val keys = (1 to 8).map(k => s"k$k")
      val stream = keys.flatMap { k =>
        val n = 1 + rnd.nextInt(40)
        val versions = Seq.fill(n)(rnd.nextInt(1000).toLong + 1L).distinct.sorted
        versions.map(v => (k, v, s"s${rnd.nextInt(4)}", rnd.nextInt(8) == 0))
      }
      val h = build(changes(stream: _*))
      val facts = (1 to 150)
        .map(_ => (s"k${1 + rnd.nextInt(10)}", rnd.nextInt(1200).toLong))
        .toDF("k", "fv")
      def sortedOut(df: DataFrame) =
        df.select($"k", $"fv", $"state", $"valid_from")
          .as[(String, Long, String, Long)].collect()
          .sortBy(r => (r._1, r._2, r._4)).toSeq
      val expected = sortedOut(Scd2.asOfJoin(facts, h, "k", col("fv")))
      assert(sortedOut(Scd2.asOfJoinBucketedAuto(facts, h, "k", col("fv")))
        == expected, s"trial $trial")
    }
  }

  test("one exchange: boundary + interval windows share the key partitioning") {
    val plan = build(changes(("k1", 1L, "a", false))).queryExecution
      .executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges == 1, s"expected a single key exchange, plan:\n$plan")
  }
}
