package graft.functions

import graft.SparkSpec
import graft.functions.expressions.RepetitionStatsExpr
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** The DuckDB oracle (`doc_repetition_stats`) covers the word-ngram path on
  * the real corpus; the synthetic corpus has no newlines and no repeated
  * 5-grams, so the line-level signals and the dup5 path are pinned here on
  * hand-computed fixtures instead.
  */
class RepetitionStatsSpec extends SparkSpec {
  import spark.implicits._

  private def stats(text: String): (Int, Double, Double, Double, Double, Double, Int, Double, Double) = {
    val r = Seq(text).toDF("text")
      .select(TextFunctions.repetitionStats($"text").as("st"))
      .select("st.*").collect().head
    (r.getInt(0), r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4),
      r.getDouble(5), r.getInt(6), r.getDouble(7), r.getDouble(8))
  }

  test("word repetition fractions on a hand-computed fixture") {
    // words [a b a b]: 4 words, 2 distinct; norm_len = 7 ("a b a b")
    val (wc, dupW, top2, top3, top4, dup5, lc, dupL, dupLc) = stats("a b a b")
    assert(wc == 4 && lc == 1)
    assert(dupW == 0.5)
    assert(math.abs(top2 - 6.0 / 7) < 1e-12)  // "a b" ×2, len 3
    assert(top3 == 0.0)                       // "a b a" occurs once → excluded
    assert(top4 == 0.0)                       // the whole text, once → excluded
    assert(dup5 == 0.0 && dupL == 0.0 && dupLc == 0.0)
  }

  test("genuinely repeated 3- and 4-grams yield NONZERO top3/top4 fractions") {
    // "a b c" ×3: 9 words, normLen = 9 + 8 = 17
    //   3-grams: "a b c" ×3 (len 5) → top3 = 15/17; "b c a"/"c a b" ×2 → 10
    //   4-grams: "a b c a"/"b c a b"/"c a b c" all ×2 (len 7) → top4 = 14/17
    //   2-grams: "a b"/"b c" ×3 (len 3) → top2 = 9/17
    val (wc, _, top2, top3, top4, _, _, _, _) = stats("a b c a b c a b c")
    assert(wc == 9)
    assert(math.abs(top2 - 9.0 / 17) < 1e-12)
    assert(math.abs(top3 - 15.0 / 17) < 1e-12)
    assert(math.abs(top4 - 14.0 / 17) < 1e-12)
    assert(top3 > 0.0 && top4 > 0.0,
      "count>=2 n-grams must still contribute — only singletons are excluded")
  }

  test("dup5 counts every occurrence of repeated 5-grams (can exceed 1)") {
    // "x y z w v" ×3: 11 sliding 5-grams, all repeated (one ×3, four ×2),
    // each 9 chars → dup5 = (3 + 2·4)·9 / norm_len 29
    val text = "x y z w v x y z w v x y z w v"
    val (_, _, _, _, _, dup5, _, _, _) = stats(text)
    assert(math.abs(dup5 - 99.0 / 29) < 1e-12)
    assert(dup5 > 1.0, "overlap-counting definition exceeds 1 on loops")
  }

  test("line-level signals: separators keep empty segments, dup chars count all occurrences") {
    val (_, _, _, _, _, _, lc, dupL, dupLc) = stats("ab\ncd\nab\n")
    assert(lc == 4, "trailing \\n yields a kept empty segment")
    assert(dupL == 0.25)                      // 4 lines, 3 distinct
    assert(math.abs(dupLc - 4.0 / 6) < 1e-12) // "ab" ×2 = 4 of 6 line chars
  }

  test("degenerate inputs: empty, whitespace-only, single word") {
    for (t <- Seq("", "   ", "\n\n", "word")) {
      val (wc, dupW, top2, top3, top4, dup5, lc, dupL, dupLc) = stats(t)
      assert(dupW == 0.0 && top2 == 0.0 && top3 == 0.0 && top4 == 0.0 && dup5 == 0.0,
        s"word fractions must be 0 on '$t'")
      assert(wc == (if (t == "word") 1 else 0))
      assert(lc >= 1 && dupLc >= 0.0)
      // "\n\n" = three empty lines, all identical → fully duplicated lines
      if (t == "\n\n") assert(lc == 3 && dupL == 2.0 / 3)
      else assert(dupL == 0.0 || t.trim.isEmpty)
    }
  }

  test("interpreted eval matches the codegen path on corpus + fixtures") {
    val corpus = spark.read.parquet(s"$sf/documents.parquet")
      .select($"text").as[String].collect().toSeq
    val fixtures = Seq("", "a b a b", "x y\nx y\nx y", "one\n\none\n",
      "repeat repeat repeat repeat repeat repeat")
    (corpus.take(50) ++ fixtures).foreach { text =>
      val interpreted = RepetitionStatsExpr.compute(UTF8String.fromString(text))
      val viaPlan = Seq(text).toDF("text")
        .select(TextFunctions.repetitionStats($"text").as("st")).select("st.*")
        .collect().head
      val n = RepetitionStatsExpr.schema.length
      (0 until n).foreach { i =>
        val a = interpreted.get(i, RepetitionStatsExpr.schema(i).dataType)
        val b = viaPlan.get(i)
        assert(a == b, s"field $i mismatch on '${text.take(30)}': $a vs $b")
      }
    }
  }

  test("fused gate equals the struct-field conjunction on corpus + fixtures") {
    // the gate exists so a FILTER evaluates the kernel once (the struct
    // form multi-evaluates per conjunct after pushdown) — semantics must
    // stay identical to the conjunction it replaces
    val docs = spark.read.parquet(s"$sf/documents.parquet").select($"text")
      .union(Seq("", "a b a b", "x y\nx y\nx y", "one\n\none\n",
        "repeat repeat repeat repeat repeat repeat").toDF("text"))
    val th = CorpusPipeline.RepetitionThresholds()
    val rows = docs.select(
      CorpusPipeline.repetitionGate($"text", th).as("fused"),
      CorpusPipeline.repetitionGateOn(
        TextFunctions.repetitionStats($"text"), th).as("composed"))
      .collect()
    rows.foreach(r => assert(r.getBoolean(0) == r.getBoolean(1)))
    assert(rows.exists(!_.getBoolean(0)), "thresholds actually gate something")
  }

  test("SQL surface: graft_repetition_stats registered and equal to the DataFrame form") {
    graft.GraftExtensions.register(spark)
    spark.read.parquet(s"$sf/documents.parquet").limit(20)
      .createOrReplaceTempView("rep_docs")
    val viaSql = spark.sql(
      "SELECT doc_id, graft_repetition_stats(text) AS st FROM rep_docs ORDER BY doc_id")
      .select($"doc_id", $"st.top2_frac", $"st.dup_word_frac").collect()
    val viaDf = spark.table("rep_docs")
      .select($"doc_id", TextFunctions.repetitionStats($"text").as("st"))
      .select($"doc_id", $"st.top2_frac", $"st.dup_word_frac")
      .orderBy($"doc_id").collect()
    assert(viaSql.toSeq == viaDf.toSeq)
  }
}
