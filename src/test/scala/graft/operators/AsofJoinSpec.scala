package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AsofJoinSpec extends SparkSpec {
  import spark.implicits._

  private val left = Seq(
    (1L, 100L, 10L), // before any right row for key 1
    (2L, 100L, 25L), // between right rows at 20 and 30
    (3L, 100L, 30L), // exactly equal to a right timestamp
    (4L, 100L, 99L), // after every right row
    (5L, 200L, 50L)  // key with no right rows at all
  ).toDF("id", "k", "t")

  private val right = Seq(
    (901L, 100L, 20L, 2.0),
    (902L, 100L, 30L, 3.0),
    (903L, 100L, 40L, 4.0)
  ).toDF("rid", "k", "t", "rv")

  test("backward as-of picks the latest right row at or before each left row") {
    val out = AsofJoin.asofBackward(left, right, Seq("k"), "t", "t",
      Seq("rid", "rv"))
      .select($"id", $"asof_rid", $"asof_rv")
      .as[(Long, Option[Long], Option[Double])].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out(1L) == ((None, None)), "no right row at or before t=10")
    assert(out(2L) == ((Some(901L), Some(2.0))))
    assert(out(3L) == ((Some(902L), Some(3.0))), "equal timestamp is included")
    assert(out(4L) == ((Some(903L), Some(4.0))))
    assert(out(5L) == ((None, None)), "unmatched key carries nulls (left-asof)")
  }

  test("a NULL in the matching row's carry column is carried AS NULL, never spliced") {
    // the matching right row carries (price=NULL, size=7); an older row
    // carries (price=100, size=5). Per-column ignoreNulls carrying would
    // emit (price=100, size=7) — a franken-row that never existed, and
    // under a tolerance an out-of-tolerance price smuggled through a row
    // judged in-tolerance by its timestamp alone. The carried match must
    // be exactly ONE real right row, NULL fields included.
    val l = Seq((1L, 100L, 10L)).toDF("id", "k", "t")
    val r = Seq(
      (100L, 1L, Option(100.0), 5L),
      (100L, 9L, None: Option[Double], 7L)
    ).toDF("k", "t", "price", "size")
    val out = AsofJoin.asofBackward(l, r, Seq("k"), "t", "t", Seq("price", "size"))
      .select($"asof_price", $"asof_size")
      .as[(Option[Double], Option[Long])].collect().head
    assert(out == ((None, Some(7L))),
      s"must carry the t=9 row whole (price NULL), got $out")
    // same contract under a tolerance: the t=9 match is in-tolerance, and
    // its NULL price must not be backfilled from the out-of-tolerance t=1
    val tol = AsofJoin.asofBackward(l, r, Seq("k"), "t", "t",
      Seq("price", "size"), tolerance = Some(lit(2L)))
      .select($"asof_price", $"asof_size")
      .as[(Option[Double], Option[Long])].collect().head
    assert(tol == ((None, Some(7L))))
    // nearest shares the struct-carry contract
    val near = AsofJoin.asofNearest(l, r, Seq("k"), "t", "t", Seq("price", "size"))
      .select($"asof_price", $"asof_size")
      .as[(Option[Double], Option[Long])].collect().head
    assert(near == ((None, Some(7L))))
  }

  test("left columns pass through untouched; row count is |left|") {
    val out = AsofJoin.asofBackward(left, right, Seq("k"), "t", "t", Seq("rv"))
    assert(out.count() == 5)
    assert(out.columns.toSeq == Seq("id", "k", "t", "asof_rv"))
  }

  test("forward as-of picks the earliest right row at or after each left row") {
    val out = AsofJoin.asofForward(left, right, Seq("k"), "t", "t",
      Seq("rid", "rv"))
      .select($"id", $"asof_rid", $"asof_rv")
      .as[(Long, Option[Long], Option[Double])].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out(1L) == ((Some(901L), Some(2.0))), "t=10 sees the t=20 row ahead")
    assert(out(2L) == ((Some(902L), Some(3.0))))
    assert(out(3L) == ((Some(902L), Some(3.0))), "equal timestamp is included")
    assert(out(4L) == ((None, None)), "no right row at or after t=99")
    assert(out(5L) == ((None, None)))
  }

  test("tolerance nulls out matches farther than the bound") {
    val b = AsofJoin.asofBackward(left, right, Seq("k"), "t", "t", Seq("rid"),
        tolerance = Some(lit(5L)))
      .select($"id", $"asof_rid").as[(Long, Option[Long])].collect().toMap
    assert(b(2L) == Some(901L), "t=25 to t=20 is within 5")
    assert(b(3L) == Some(902L), "exact match has delta 0")
    assert(b(4L) == None, "t=99 to t=40 exceeds the bound")
    val f = AsofJoin.asofForward(left, right, Seq("k"), "t", "t", Seq("rid"),
        tolerance = Some(lit(5L)))
      .select($"id", $"asof_rid").as[(Long, Option[Long])].collect().toMap
    assert(f(2L) == Some(902L), "t=25 to t=30 is within 5")
    assert(f(1L) == None, "t=10 to t=20 exceeds the bound")
  }

  test("nearest picks the closer side and breaks ties backward") {
    val out = AsofJoin.asofNearest(left, right, Seq("k"), "t", "t", Seq("rid"))
      .select($"id", $"asof_rid").as[(Long, Option[Long])].collect().toMap
    assert(out(1L) == Some(901L), "only a forward match exists at t=10")
    assert(out(2L) == Some(901L), "t=25: backward 20 and forward 30 tie -> backward")
    assert(out(3L) == Some(902L), "exact match wins")
    assert(out(4L) == Some(903L), "only a backward match exists at t=99")
    assert(out(5L) == None)
    val tol = AsofJoin.asofNearest(left, right, Seq("k"), "t", "t", Seq("rid"),
        tolerance = Some(lit(5L)))
      .select($"id", $"asof_rid").as[(Long, Option[Long])].collect().toMap
    assert(tol(1L) == None, "nearest match at delta 10 is outside tolerance 5")
    assert(tol(2L) == Some(901L))
  }

  test("forward matches a window-free reference on real data") {
    val ev = eventsMicros()
    val clicks = ev.filter($"event_type" === "click")
      .select($"event_id".as("cid"), $"user_id", $"ts")
    val views = ev.filter($"event_type" === "view")
      .select($"user_id", $"ts", $"event_id".as("vid"))
    val fast = AsofJoin.asofForward(clicks, views, Seq("user_id"), "ts", "ts", Seq("vid"))
      .select($"cid", $"asof_vid").as[(Long, Option[Long])].collect().toMap
    val ref = clicks.as("c").join(views.as("v"),
        $"c.user_id" === $"v.user_id" && $"v.ts" >= $"c.ts", "left")
      .groupBy($"cid").agg(min_by($"vid", $"v.ts").as("vid"))
      .as[(Long, Option[Long])].collect().toMap
    assert(fast == ref)
  }

  test("matches a window-free reference computed per row") {
    val ev = eventsMicros()
    val clicks = ev.filter($"event_type" === "click")
      .select($"event_id".as("cid"), $"user_id", $"ts")
    val views = ev.filter($"event_type" === "view")
      .select($"user_id", $"ts", $"event_id".as("vid"))
    val fast = AsofJoin.asofBackward(clicks, views, Seq("user_id"), "ts", "ts", Seq("vid"))
      .select($"cid", $"asof_vid").as[(Long, Option[Long])].collect().toMap
    // reference: max-ts view <= click ts via plain join + groupBy (small sf)
    val ref = clicks.as("c").join(views.as("v"),
        $"c.user_id" === $"v.user_id" && $"v.ts" <= $"c.ts", "left")
      .groupBy($"cid").agg(max_by($"vid", $"v.ts").as("vid"))
      .as[(Long, Option[Long])].collect().toMap
    assert(fast == ref)
  }
}
