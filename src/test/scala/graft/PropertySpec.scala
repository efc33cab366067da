package graft

import graft.core.SchemaEvolution
import graft.operators.{CdcMerge, Dedup, UpsertBlobDialect}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-based invariants over the core operators. Generators are small
  * (Spark jobs per case are expensive) but the properties are the
  * load-bearing ones: evolution algebra, dedup cardinality, merge
  * idempotence/commutativity-with-replay.
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  /** Deterministic sampling in place of the scalatestplus bridge (not on
    * the offline classpath): 10 seeded samples per property.
    */
  private def forAllSampled[A](gen: Gen[A], n: Int = 10)(body: A => Unit): Unit =
    (0 until n).foreach { i =>
      body(gen.pureApply(Gen.Parameters.default, Seed(1000L + i)))
    }

  private def forAllSampled2[A, B](ga: Gen[A], gb: Gen[B], n: Int = 10)(body: (A, B) => Unit): Unit =
    (0 until n).foreach { i =>
      body(ga.pureApply(Gen.Parameters.default, Seed(2000L + i)),
        gb.pureApply(Gen.Parameters.default, Seed(3000L + i)))
    }

  private val fieldGen: Gen[StructField] = for {
    name <- Gen.oneOf("a", "B", "c", "Dd", "e1")
    dt <- Gen.oneOf[DataType](IntegerType, ShortType, LongType, StringType, DoubleType)
  } yield StructField(name, dt)

  private val schemaGen: Gen[StructType] =
    Gen.listOfN(4, fieldGen)
      .map(fs => StructType(fs.groupBy(_.name.toLowerCase).map(_._2.head).toArray))

  test("evolution is idempotent and monotone (schema algebra, no Spark jobs)") {
    forAllSampled2(schemaGen, schemaGen) { (target: StructType, source: StructType) =>
      val once = SchemaEvolution.evolve(target, source)
      val twice = SchemaEvolution.evolve(once, source)
      // idempotent
      assert(SchemaEvolution.schemaEquals(once, twice))
      // monotone: every target and source field name is present after evolve
      val names = once.fieldNames.map(_.toLowerCase).toSet
      assert(target.fieldNames.forall(n => names.contains(n.toLowerCase)))
      assert(source.fieldNames.forall(n => names.contains(n.toLowerCase)))
      // no duplicates (case-insensitive)
      assert(names.size == once.fields.length)
    }
  }

  private val rowsGen: Gen[List[(String, Long, String)]] =
    Gen.listOfN(12, for {
      k <- Gen.oneOf("k1", "k2", "k3")
      v <- Gen.chooseNum(1L, 6L)
      p <- Gen.alphaLowerStr.map(_.take(4))
    } yield (k, v, p))

  test("watermark JSON round-trips for arbitrary unicode strings (driver-side, no Spark jobs)") {
    import graft.core.Watermark
    // fragments cover controls, quotes, backslashes, astral-plane chars —
    // the classes that broke the old regex + sequential-replace parser.
    // Whole code points only: a lone surrogate is not valid UTF-8 (and even
    // crashes sbt's XML test reporter when embedded in a failure message).
    val fragment = Gen.oneOf(
      Gen.asciiPrintableStr.map(_.take(3)), Gen.const("\\"), Gen.const("\""),
      Gen.const("\n"), Gen.const("\t"), Gen.const("\u0001"), Gen.const("\u00e9"),
      Gen.const("\u4e2d"), Gen.const("\ud83d\ude00"), Gen.const("\\n"))
    val s = Gen.listOfN(6, fragment).map(_.mkString)
    val wmGen = for {
      kind <- s; version <- s; ts <- Gen.chooseNum(0L, Long.MaxValue)
    } yield Watermark(kind, version, ts)
    forAllSampled(wmGen, n = 100) { wm =>
      assert(Watermark.fromJson(wm.toJson).contains(wm),
        s"round-trip failed for kind=${wm.kind.map(_.toInt).mkString(",")} " +
          s"version=${wm.version.map(_.toInt).mkString(",")}")
    }
  }

  test("dedup-latest yields exactly one row per key with the max version") {
    forAllSampled(rowsGen) { rows =>
      if (rows.nonEmpty) {
        val df = rows.toDF("ARCANE_MERGE_KEY", "createdon", "payload")
        val out = Dedup.latestByKey(df, col("ARCANE_MERGE_KEY"),
          Seq(col("createdon")), Seq(col("payload"))).collect()
        val expected = rows.groupBy(_._1).view.mapValues(_.map(_._2).max).toMap
        assert(out.length == expected.size)
        out.foreach(r => assert(r.getLong(1) == expected(r.getString(0))))
      }
    }
  }

  test("budget-mixture rates: bounded, monotone in budget, cap at source size") {
    import graft.functions.Sampling
    val tokensGen = Gen.mapOf(Gen.zip(
      Gen.oneOf("web", "code", "books", "wiki"),
      Gen.chooseNum(1L, 1000000L)))
    val weightsGen = Gen.mapOf(Gen.zip(
      Gen.oneOf("web", "code", "books", "wiki"),
      Gen.chooseNum(0.05, 1.0)))
    forAllSampled2(tokensGen, weightsGen, n = 25) { (tokens, weights) =>
      val lo = Sampling.mixtureWeights(tokens, weights, tokenBudget = 10000L)
      val hi = Sampling.mixtureWeights(tokens, weights, tokenBudget = 100000L)
      assert(lo.keySet == weights.keySet, "one rate per configured source")
      lo.foreach { case (s, r) =>
        assert(r > 0.0 && r <= 1.0, s"rate in (0,1]: $s -> $r")
        assert(hi(s) >= r, "a larger budget never lowers a keep rate")
        // a budget share covering the whole source keeps all of it
        val full = Sampling.mixtureWeights(tokens, weights,
          tokenBudget = (tokens.getOrElse(s, 0L) / weights(s)).toLong + 1L)
        assert(full(s) == 1.0)
      }
    }
  }

  test("temperature weights: normalized, order-flattening, T=1 is the natural share") {
    import graft.functions.Sampling
    val tokensGen = Gen.mapOf(Gen.zip(
      Gen.oneOf("web", "code", "books", "wiki"),
      Gen.chooseNum(1L, 1000000L))).suchThat(_.size >= 2)
    forAllSampled(tokensGen, n = 25) { tokens =>
      val total = tokens.values.sum.toDouble
      val natural = Sampling.temperatureWeights(tokens, temperature = 1.0)
      val flat = Sampling.temperatureWeights(tokens, temperature = 5.0)
      assert(math.abs(natural.values.sum - 1.0) < 1e-9, "weights normalize to 1")
      assert(math.abs(flat.values.sum - 1.0) < 1e-9)
      tokens.foreach { case (s, n) =>
        assert(math.abs(natural(s) - n / total) < 1e-9,
          "T=1 reproduces the natural size distribution")
      }
      // flattening: the biggest source's share never GROWS as T rises,
      // the smallest source's share never shrinks
      val big = tokens.maxBy(_._2)._1
      val small = tokens.minBy(_._2)._1
      assert(flat(big) <= natural(big) + 1e-12)
      assert(flat(small) >= natural(small) - 1e-12)
      // determinism: same map content in a different insertion order gives
      // bit-identical weights (the normalizer sums in sorted-key order)
      val reordered = Sampling.temperatureWeights(
        tokens.toSeq.reverse.foldLeft(Map.empty[String, Long])(_ + _), 2.0)
      val w2 = Sampling.temperatureWeights(tokens, 2.0)
      assert(reordered == w2, "weights must not depend on map iteration order")
    }
  }

  test("span coverage: window interval-union equals brute-force set coverage") {
    import graft.functions.SpanDedup
    val k = 3
    // random word sequences over a tiny alphabet force plenty of repeated
    // k-grams, both across documents and within one
    val wordsGen = Gen.listOfN(4, Gen.choose(5, 30).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf("a", "b", "c", "d"))))
    forAllSampled(wordsGen) { docsWords =>
      val docs = docsWords.zipWithIndex
        .map { case (ws, i) => (i.toLong, ws.mkString(" ")) }
        .toDF("doc_id", "text")
      val got = SpanDedup.coverageStats(docs, "doc_id", col("text"), k)
        .as[(Long, Long, Long, Double)].collect()
        .map(r => r._1 -> ((r._2, r._3))).toMap
      // brute-force reference: first occurrence of each gram STRING per
      // global (doc, pos) order, every other instance covers a token set
      val grams = docsWords.zipWithIndex.flatMap { case (ws, d) =>
        ws.sliding(k).filter(_.size == k).zipWithIndex
          .map { case (g, p) => (g.mkString(" "), d.toLong, p + 1) }
      }
      val byGram = grams.groupBy(_._1)
      val coveredByDoc = grams
        .filter { case (g, d, p) =>
          val all = byGram(g)
          all.size > 1 && (d, p) != all.map(t => (t._2, t._3)).min
        }
        .groupBy(_._2)
        .view.mapValues(_.flatMap { case (_, _, p) => p until (p + k) }.toSet.size)
      docsWords.indices.foreach { d =>
        val (n, dup) = got(d.toLong)
        assert(n == docsWords(d).size)
        assert(dup == coveredByDoc.getOrElse(d.toLong, 0).toLong,
          s"doc $d: window union $dup vs brute force ${coveredByDoc.getOrElse(d.toLong, 0)}")
      }
    }
  }

  test("curve keys: interleave bijectivity, prefix-tile nesting, hilbert adjacency (driver-side, no Spark jobs)") {
    import graft.functions.Layout
    import graft.functions.expressions.HilbertIndex2dExpr
    val coordGen = Gen.zip(Gen.chooseNum(0L, 65535L), Gen.chooseNum(0L, 65535L))
    def z(x: Long, y: Long): Long =
      (0 until 16).foldLeft(0L)((acc, i) =>
        acc | (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1)))
    forAllSampled(coordGen, n = 50) { case (x, y) =>
      // de-interleaving the full key recovers the point (bijectivity)
      val key = z(x, y)
      val tile0 = Layout.bucketTile(key, 16, 2, 32, hilbert = false)
      assert(tile0 == Seq((x, x), (y, y)))
      // coarser prefixes nest: the 6-bit tile contains the 8-bit tile
      val t6 = Layout.bucketTile(key >> 26, 16, 2, 6, hilbert = false)
      val t8 = Layout.bucketTile(key >> 24, 16, 2, 8, hilbert = false)
      (t6 zip t8).foreach { case ((lo6, hi6), (lo8, hi8)) =>
        assert(lo6 <= lo8 && hi8 <= hi6, "finer tile must nest inside coarser")
      }
      // hilbert: d2xy inverts xy2d at full order
      val d = HilbertIndex2dExpr.compute(16, x, y)
      assert(Layout.hilbertD2xy(16, d) == ((x, y)))
    }
  }

  test("url normalization: idempotent and query/fragment-insensitive (driver-side strings via one job)") {
    import graft.functions.UrlFunctions
    val hostGen = for {
      h <- Gen.oneOf("Ex.COM", "www.site.org", "A.b.C.io")
      p <- Gen.oneOf("", ":443", ":80", ":8080")
      path <- Gen.oneOf("", "/", "/a", "/a//b/", "/A/B//C")
      q <- Gen.oneOf("", "?id=1", "?utm_source=x&id=2")
      f <- Gen.oneOf("", "#frag")
    } yield s"https://$h$p$path$q$f"
    val urls = (0 until 12).map(i =>
      hostGen.pureApply(Gen.Parameters.default, Seed(4000L + i)))
    val once = urls.toDF("u").select(UrlFunctions.normalizeUrl($"u")).as[String].collect().toSeq
    val twice = once.toDF("u").select(UrlFunctions.normalizeUrl($"u")).as[String].collect().toSeq
    assert(twice == once, "normalization must be idempotent")
    // stripping query+fragment BEFORE normalizing changes nothing
    val preStripped = urls.map(_.takeWhile(c => c != '?' && c != '#'))
      .toDF("u").select(UrlFunctions.normalizeUrl($"u")).as[String].collect().toSeq
    assert(preStripped == once, "query/fragment must not affect the canonical URL")
  }

  test("upsert merge: replay of the same batch is always a no-op") {
    forAllSampled2(rowsGen, rowsGen) { (tRows, cRows) =>
      if (tRows.nonEmpty && cRows.nonEmpty) {
        val target = Dedup.latestByKey(
          tRows.toDF("ARCANE_MERGE_KEY", "createdon", "payload"),
          col("ARCANE_MERGE_KEY"), Seq(col("createdon")), Seq(col("payload")))
        val changes = Dedup.latestByKey(
          cRows.toDF("ARCANE_MERGE_KEY", "createdon", "payload"),
          col("ARCANE_MERGE_KEY"), Seq(col("createdon")), Seq(col("payload")))
        val once = CdcMerge.applyChanges(target, changes, "ARCANE_MERGE_KEY", UpsertBlobDialect)
        val twice = CdcMerge.applyChanges(once, changes, "ARCANE_MERGE_KEY", UpsertBlobDialect)
        val a = once.orderBy("ARCANE_MERGE_KEY", "createdon", "payload").collect().toSeq
        val b = twice.orderBy("ARCANE_MERGE_KEY", "createdon", "payload").collect().toSeq
        assert(a == b)
      }
    }
  }
}
