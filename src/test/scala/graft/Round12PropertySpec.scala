package graft

import graft.operators.{Expectations, PageRank}
import graft.sources.AvroSchemaConverter
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property invariants over the round-12 operators, same seeded-sampling
  * device as [[PropertySpec]].
  */
class Round12PropertySpec extends SparkSpec {
  import spark.implicits._

  private def forAllSampled[A](gen: Gen[A], n: Int = 8)(body: A => Unit): Unit =
    (0 until n).foreach { i =>
      body(gen.pureApply(Gen.Parameters.default, Seed(7000L + i)))
    }

  private val edgesGen: Gen[List[(Int, Int)]] = for {
    n <- Gen.choose(3, 12)
    m <- Gen.choose(n, 3 * n)
    edges <- Gen.listOfN(m, for {
      s <- Gen.choose(0, n - 1)
      d0 <- Gen.choose(0, n - 2) // skip s without a retrying filter
    } yield (s, if (d0 >= s) d0 + 1 else d0))
  } yield edges.distinct

  test("PageRank invariants: floor, mass bound, determinism") {
    forAllSampled(edgesGen) { edges =>
      if (edges.nonEmpty) {
        val df = edges.toDF("src", "dst")
        val ranks = PageRank.run(df, "src", "dst", iterations = 3)
          .as[(Int, Double)].collect().toMap
        val nVerts = (edges.map(_._1) ++ edges.map(_._2)).distinct.size
        assert(ranks.size == nVerts, "every vertex appears exactly once")
        // floor: (1-d) is the minimum any vertex can hold
        ranks.values.foreach(r => assert(r >= 0.15 - 1e-12))
        // mass: dangling vertices only LEAK mass, never create it
        assert(ranks.values.sum <= nVerts + 1e-9)
        val again = PageRank.run(df, "src", "dst", iterations = 3)
          .as[(Int, Double)].collect().toMap
        assert(again == ranks, "deterministic across runs")
      }
    }
  }

  test("PageRank on a permutation graph conserves mass exactly") {
    forAllSampled(Gen.choose(2, 10)) { n =>
      val perm = (0 until n).map(i => (i, (i + 1) % n)) // directed ring
      val total = PageRank.run(perm.toDF("src", "dst"), "src", "dst", 4)
        .as[(Int, Double)].collect().map(_._2).sum
      assert(math.abs(total - n) < 1e-9)
    }
  }

  // Avro grammar: primitives, logical types, nullable unions, arrays —
  // the expected Spark type is constructed alongside the schema text, so
  // the property checks the full mapping, not one hand-picked case.
  private val leafGen: Gen[(String, DataType)] = Gen.oneOf(
    ("\"long\"", LongType), ("\"int\"", IntegerType), ("\"string\"", StringType),
    ("\"double\"", DoubleType), ("\"boolean\"", BooleanType),
    ("{\"type\":\"int\",\"logicalType\":\"date\"}", DateType),
    ("{\"type\":\"long\",\"logicalType\":\"timestamp-micros\"}", TimestampType),
    ("{\"type\":\"bytes\",\"logicalType\":\"decimal\",\"precision\":10,\"scale\":2}",
      DecimalType(10, 2)))

  private val fieldGen: Gen[(String, String, DataType, Boolean)] = for {
    (avro, spark) <- leafGen
    shape <- Gen.oneOf("plain", "nullable", "array")
  } yield shape match {
    case "plain" => (avro, avro, spark, false)
    case "nullable" => (s"""["null",$avro]""", avro, spark, true)
    case "array" =>
      (s"""{"type":"array","items":$avro}""", avro,
        ArrayType(spark, containsNull = false), false)
  }

  test("Avro conversion maps every generated field to its expected Spark type") {
    forAllSampled(Gen.listOfN(5, fieldGen), n = 12) { fields =>
      val json = fields.zipWithIndex
        .map { case ((avro, _, _, _), i) => s"""{"name":"f$i","type":$avro}""" }
        .mkString("""{"type":"record","name":"R","fields":[""", ",", "]}")
      val st = AvroSchemaConverter.toStructType(json)
      fields.zipWithIndex.foreach { case ((_, _, expected, nullable), i) =>
        assert(st(s"f$i").dataType === expected, s"field f$i of $json")
        assert(st(s"f$i").nullable === nullable)
      }
    }
  }

  private val valuesGen: Gen[List[Int]] = Gen.listOfN(12, Gen.choose(-50, 50))

  test("Expectations: the pass verdict is exactly value-within-band; holds agrees") {
    forAllSampled(valuesGen) { values =>
      if (values.nonEmpty) {
        val df = values.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("id", "v")
        val exps = Seq(
          Expectations.inRange("v", -10, 10, atLeast = 0.3),
          Expectations.minOf("v", atLeast = -25.0),
          Expectations.maxOf("v", atMost = 25.0),
          Expectations.uniqueness("id"))
        val rows = Expectations.audit(df, exps).collect()
        rows.foreach { r =>
          val (value, lo, hi, pass) =
            (r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getBoolean(5))
          assert(pass == (value >= lo && value <= hi),
            s"${r.getString(0)}: pass=$pass but value=$value band=[$lo,$hi]")
        }
        assert(Expectations.holds(df, exps) == rows.forall(_.getBoolean(5)))
      }
    }
  }

  private val docsGen: Gen[List[String]] = {
    val word = Gen.oneOf("data", "model", "training", "cat", "dog", "fish", "tree")
    Gen.choose(3, 8).flatMap(n => Gen.listOfN(n,
      Gen.choose(2, 12).flatMap(len => Gen.listOfN(len, word).map(_.mkString(" ")))))
  }

  private val cdcFeedGen: Gen[List[(String, Long, String, Double, Boolean)]] = for {
    n <- Gen.choose(6, 24)
    rows <- Gen.listOfN(n, for {
      k <- Gen.oneOf("k1", "k2", "k3", "k4")
      g <- Gen.oneOf("a", "b", "c")
      v <- Gen.choose(0.0, 100.0)
      del <- Gen.frequency(4 -> false, 1 -> true)
    } yield (k, g, v, del))
  } yield rows.zipWithIndex.map { case ((k, g, v, del), i) =>
    (k, i.toLong + 1, g, v, del) // unique monotone versions
  }

  test("SCD2 incremental == full rebuild on RANDOM change streams at random splits") {
    import graft.operators.Scd2
    import org.apache.spark.sql.functions.col
    forAllSampled(cdcFeedGen, n = 6) { feed =>
      val full = feed.toDF("k", "ver", "g", "v", "del")
      val expected = Scd2.buildHistory(full, "k", "ver", Seq("g"), col("del"))
        .select($"k", $"g", $"valid_from", $"valid_to", $"is_current")
        .as[(String, String, Long, Option[Long], Boolean)]
        .collect().sortBy(r => (r._1, r._3)).toSeq
      val split = feed.length / 2
      val pre = feed.filter(_._2 <= split).toDF("k", "ver", "g", "v", "del")
      val post = feed.filter(_._2 > split).toDF("k", "ver", "g", "v", "del")
      val h0 = Scd2.buildHistory(pre, "k", "ver", Seq("g"), col("del"))
      val got = Scd2.applyChanges(h0, post, "k", "ver", Seq("g"), col("del"))
        .select($"k", $"g", $"valid_from", $"valid_to", $"is_current")
        .as[(String, String, Long, Option[Long], Boolean)]
        .collect().sortBy(r => (r._1, r._3)).toSeq
      assert(got == expected, s"feed: $feed")
    }
  }

  test("IVM maintain == recompute on RANDOM change streams") {
    import graft.operators.{Dedup, IncrementalAgg, MsSqlCtDialect}
    import org.apache.spark.sql.functions.col
    forAllSampled(cdcFeedGen, n = 6) { feed =>
      def df(rows: List[(String, Long, String, Double, Boolean)]) =
        rows.map { case (k, ver, g, v, del) =>
          (k, ver, g, v, if (del) "D" else "U")
        }.toDF("k", "SYS_CHANGE_VERSION", "g", "v", "SYS_CHANGE_OPERATION")
      def stateOf(rows: List[(String, Long, String, Double, Boolean)]) =
        Dedup.latestByKey(df(rows), col("k"), Seq(col("SYS_CHANGE_VERSION")))
          .filter(col("SYS_CHANGE_OPERATION") =!= "D")
      val split = feed.length / 2
      val (pre, post) = feed.partition(_._2 <= split)
      val target = stateOf(pre).drop("SYS_CHANGE_OPERATION")
      val latest = Dedup.latestByKey(df(post), col("k"), Seq(col("SYS_CHANGE_VERSION")))
      val view0 = IncrementalAgg.bootstrap(target, Seq("g"), "v")
      val got = IncrementalAgg.maintain(view0, target, latest, "k",
        MsSqlCtDialect, Seq("g"), "v")
        .select($"g", $"cnt".cast("long"), org.apache.spark.sql.functions.round($"sum_value", 6))
        .as[(String, Long, Double)].collect().sortBy(_._1).toSeq
      val expected = IncrementalAgg.bootstrap(stateOf(feed), Seq("g"), "v")
        .select($"g", $"cnt".cast("long"), org.apache.spark.sql.functions.round($"sum_value", 6))
        .as[(String, Long, Double)].collect().sortBy(_._1).toSeq
      assert(got == expected, s"feed: $feed")
    }
  }

  test("funnel is input-order and partitioning invariant on random feeds") {
    import graft.operators.Funnel
    import org.apache.spark.sql.functions.col
    val feedGen: Gen[List[(Long, Long, String)]] = for {
      n <- Gen.choose(8, 30)
      rows <- Gen.listOfN(n, for {
        u <- Gen.choose(1L, 5L)
        t <- Gen.choose(0L, 100L)
        e <- Gen.oneOf("view", "click", "purchase", "other")
      } yield (u, t, e))
    } yield rows
    val steps = Seq(
      "view" -> (col("event_type") === "view"),
      "click" -> (col("event_type") === "click"),
      "purchase" -> (col("event_type") === "purchase"))
    forAllSampled(feedGen, n = 5) { feed =>
      def run(rows: List[(Long, Long, String)], parts: Int) =
        Funnel.ordered(rows.toDF("user_id", "ts", "event_type").repartition(parts),
          "user_id", "ts", steps)
          .select($"user_id", $"t_view", $"t_click", $"t_purchase")
          .as[(Long, Long, Option[Long], Option[Long])]
          .collect().sortBy(_._1).toSeq
      assert(run(feed, 3) == run(scala.util.Random.javaRandomToRandom(
        new java.util.Random(42)).shuffle(feed), 7),
        "funnel depends on timestamps, never on row arrival order")
    }
  }

  test("weighted sample invariants: subset of positive weights, exact size, in-corpus") {
    import graft.functions.Sampling
    import org.apache.spark.sql.functions.col
    val wGen: Gen[List[Double]] = Gen.choose(5, 40)
      .flatMap(n => Gen.listOfN(n, Gen.oneOf(0.0, 0.5, 1.0, 10.0, 1000.0)))
    forAllSampled(wGen, n = 5) { ws =>
      val df = ws.zipWithIndex.map { case (w, i) => (i.toLong, w) }.toDF("id", "w")
      val k = 5
      val picked = Sampling.weightedSample(df, col("id"), col("w"), k)
        .select($"id").as[Long].collect().toSet
      val positive = ws.zipWithIndex.filter(_._1 > 0).map(_._2.toLong).toSet
      assert(picked.subsetOf(positive), "only positive-weight rows can be drawn")
      assert(picked.size == math.min(k, positive.size), "exact sample size")
    }
  }

  test("PSI invariants: non-negative always, zero iff identical, monotone under disjointness") {
    import graft.functions.Drift
    val countsGen: Gen[(List[Int], List[Int])] = for {
      a <- Gen.listOfN(4, Gen.choose(0, 40))
      b <- Gen.listOfN(4, Gen.choose(0, 40))
    } yield (a, b)
    val edges = Seq(100.0, 200.0, 300.0)
    def frame(counts: List[Int]) = counts.zipWithIndex.flatMap { case (c, b) =>
      Seq.fill(c)(b * 100 + 50)
    } match {
      case Nil => List(50).toDF("v").limit(0)
      case vs => vs.toDF("v")
    }
    forAllSampled(countsGen, n = 8) { case (a, b) =>
      if (a.sum > 0 && b.sum > 0) {
        val psiAb = Drift.psiNumeric(frame(a), frame(b), col("v"), edges)
          .select($"psi_total").as[Double].head()
        assert(psiAb >= 0.0, s"PSI is a sum of (p-q)ln(p/q) terms, each >= 0; got $psiAb")
        val psiAa = Drift.psiNumeric(frame(a), frame(a), col("v"), edges)
          .select($"psi_total").as[Double].head()
        assert(psiAa == 0.0, "identical distributions score exactly 0")
      }
    }
  }

  test("RRF invariants: single-list fusion preserves the list's order; k0 damping monotone") {
    import graft.functions.Retrieval
    val listGen: Gen[List[Double]] = Gen.choose(3, 10)
      .flatMap(n => Gen.listOfN(n, Gen.choose(0.0, 100.0)))
    forAllSampled(listGen, n = 6) { scores =>
      val df = scores.zipWithIndex.map { case (s, i) => (i.toLong, s) }.toDF("id", "score")
      val fused = Retrieval.rrfFuse(Seq(df), "id", "score", k0 = 60, topK = 100)
        .select($"id", $"rrf_score").as[(Long, Double)].collect().toSeq
      // fused order (rrf desc) must equal the input's (score desc, id asc) order
      val expected = scores.zipWithIndex
        .sortBy { case (s, i) => (-s, i) }.map(_._2.toLong)
      assert(fused.map(_._1) == expected, "a single list fuses to its own ranking")
      assert(fused.map(_._2).sliding(2).forall {
        case Seq(x, y) => x >= y
        case _ => true
      })
    }
  }

  test("BM25 invariants: non-negative scores; adding a query-term hit never lowers a doc's score") {
    import graft.functions.Retrieval
    import org.apache.spark.sql.functions.col
    forAllSampled(docsGen, n = 6) { texts =>
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val terms = Seq("data", "model")
      val scores = Retrieval.bm25Rank(docs, "doc_id", col("text"), terms, topK = 100)
        .as[(Long, Double)].collect().toMap
      scores.values.foreach(s => assert(s >= 0.0, "the +1-floor idf keeps scores non-negative"))
      // append one more 'data' token to every doc that already matches:
      // with corpus stats recomputed the RANKING device still cannot give
      // a zero-hit doc a positive score
      val zeroHit = texts.zipWithIndex.filterNot(_._1.split(" ").exists(terms.contains))
      zeroHit.foreach { case (_, i) => assert(!scores.contains(i.toLong),
        "docs with no query term never enter the ranking") }
    }
  }

  test("BM25 from a written-and-reloaded inverted index is score-identical to the scan path") {
    import graft.functions.Retrieval
    import org.apache.spark.sql.functions.col
    forAllSampled(docsGen, n = 4) { texts =>
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val terms = Seq("data", "model", "training")
      val scan = Retrieval.bm25Rank(docs, "doc_id", col("text"), terms, topK = 100)
        .as[(Long, Double)].collect().toSeq
      // materialize the index for real: write the three relations to
      // parquet, reload, and answer from the reloaded frames only
      val dir = java.nio.file.Files.createTempDirectory("bm25idx").toString
      val built = Retrieval.buildIndex(docs, "doc_id", col("text"))
      built.postings.write.mode("overwrite").parquet(s"$dir/postings")
      built.lengths.write.mode("overwrite").parquet(s"$dir/lengths")
      built.scalars.write.mode("overwrite").parquet(s"$dir/scalars")
      val reloaded = Retrieval.Bm25Index(
        spark.read.parquet(s"$dir/postings"),
        spark.read.parquet(s"$dir/lengths"),
        spark.read.parquet(s"$dir/scalars"))
      val indexed = Retrieval.bm25FromIndex(reloaded, "doc_id", terms, topK = 100)
        .as[(Long, Double)].collect().toSeq
      assert(indexed == scan, "the index changes the plan, never the scores")
    }
  }

  test("TF-IDF invariants: corpus-wide terms score 0; per-doc rows ≤ k; df consistent") {
    import graft.functions.Retrieval
    import org.apache.spark.sql.functions.col
    forAllSampled(docsGen, n = 6) { texts =>
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val rows = Retrieval.tfidfTopTerms(docs, "doc_id", col("text"), k = 3)
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
      val n = texts.size
      rows.foreach { case (_, _, tf, df, score) =>
        assert(df >= 1 && df <= n && tf >= 1)
        if (df == n) assert(score == 0.0, "idf = ln(N/N) = 0 for a ubiquitous term")
        assert(score >= 0.0)
      }
      rows.groupBy(_._1).foreach { case (_, g) => assert(g.length <= 3) }
      // df must be consistent: every row mentioning the same term reports
      // the same document frequency
      rows.groupBy(_._2).foreach { case (_, g) => assert(g.map(_._4).distinct.size == 1) }
    }
  }

  private val vecsGen: Gen[List[List[Float]]] = for {
    dim <- Gen.choose(1, 5)
    n <- Gen.choose(1, 8)
    vs <- Gen.listOfN(n, Gen.listOfN(dim, Gen.choose(-100, 100).map(_.toFloat)))
  } yield vs

  test("vector_mean equals the local arithmetic mean, at any partitioning") {
    forAllSampled(vecsGen) { vecs =>
      val dim = vecs.head.size
      val expected = (0 until dim).map(j =>
        vecs.map(_(j).toDouble).sum / vecs.size)
      for (parts <- Seq(1, 3)) {
        val got = vecs.map(v => Tuple1(v.toArray)).toDF("embedding")
          .repartition(parts)
          .agg(graft.functions.VectorSimilarity.vectorMean($"embedding"))
          .head().getSeq[Double](0)
        got.zip(expected).foreach { case (g, e) =>
          assert(math.abs(g - e) < 1e-6, s"parts=$parts got=$got expected=$expected")
        }
      }
    }
  }
}
