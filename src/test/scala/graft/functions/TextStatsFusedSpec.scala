package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TextStatsFusedSpec extends SparkSpec {
  import spark.implicits._

  private val edgeCases = Seq(
    "", " ", "   ", "\t", "\n\n", "\ta b\n", "a", "a b c", "  padded  ",
    "digits 123 and 4!", "all!!!punct###", "word", "mixed\t tabs\nand lines",
    "ünïcödé tëxt with áccents", "emoji \uD83D\uDE00 here", "1 2 3",
    "trailing space ", " leading", "a  double  spaces", "xy\fz",
    // VT 0x0B is NOT whitespace under the pinned RE2 class — it must count
    // as a punctuation/BPE symbol and never split tokens
    "vt\u000Bbearing", "\u000B", "a \u000B b")

  test("fused TextStatsExpr matches the composed regexp forms on corpus + edge cases") {
    val corpus = spark.read.parquet(s"$sf/documents.parquet").select($"text")
      .as[String].collect().toSeq
    val df = (corpus ++ edgeCases).toDF("text")
    val st = TextFunctions.textStats($"text")
    val rows = df.select(
      // composed (regexp) forms — the parity oracle
      TextFunctions.tokenCount($"text").cast("int").as("c_tokens"),
      TextFunctions.bpeTokenCount($"text").cast("int").as("c_bpe"),
      // pinned class [ \t\n\f\r] == RE2 \s (the TextStatsExpr contract)
      regexp_count($"text", lit("[^A-Za-z0-9 \\t\\n\\f\\r]")).cast("int").as("c_punct"),
      regexp_count($"text", lit("[0-9]")).cast("int").as("c_digit"),
      length(regexp_replace($"text", "[ \\t\\n\\f\\r]+", "")).cast("int").as("c_nonws"),
      length($"text").cast("int").as("c_chars"),
      // fused single-pass struct
      st.getField("n_tokens").as("f_tokens"),
      st.getField("n_bpe").as("f_bpe"),
      st.getField("n_punct").as("f_punct"),
      st.getField("n_digit").as("f_digit"),
      st.getField("n_nonws").as("f_nonws"),
      st.getField("n_chars").as("f_chars"),
      $"text").collect()
    val names = Seq("tokens", "bpe", "punct", "digit", "nonws", "chars")
    rows.foreach { r =>
      val txt = r.getString(12).take(40).replace("\n", "\\n").replace("\t", "\\t")
      names.zipWithIndex.foreach { case (name, i) =>
        assert(r.getInt(i) == r.getInt(i + 6),
          s"$name mismatch on '$txt': composed=${r.getInt(i)} fused=${r.getInt(i + 6)}")
      }
    }
  }

  test("fused/composed/normalized parity holds on generated hostile strings") {
    // scalacheck sweep beyond the curated fixtures: strings drawn from an
    // alphabet chosen to stress the pinned-class boundaries — every
    // whitespace variant (incl. VT 0x0B and NBSP, which are NOT pinned
    // whitespace), combining accents, surrogate-pair emoji, digits, punct
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val atom = Gen.oneOf(
      Gen.alphaNumChar.map(_.toString), Gen.const(" "), Gen.const("\t"),
      Gen.const("\n"), Gen.const("\f"), Gen.const("\r"), Gen.const("\u000B"),
      Gen.const("\u00A0"), Gen.const("!"), Gen.const("."), Gen.const("_"),
      Gen.const("é"), Gen.const("ß"), Gen.const("中"), Gen.const("\uD83D\uDE00"),
      Gen.const("e\u0301"))
    val strGen = Gen.choose(0, 40).flatMap(n => Gen.listOfN(n, atom).map(_.mkString))
    val generated = (0 until 300).map(i =>
      strGen.pureApply(Gen.Parameters.default, Seed(7000L + i)))
    val st = TextFunctions.textStats($"text")
    val rows = generated.toDF("text").select(
      TextFunctions.tokenCount($"text").cast("int").as("c_tokens"),
      TextFunctions.bpeTokenCount($"text").cast("int").as("c_bpe"),
      regexp_count($"text", lit("[^A-Za-z0-9 \\t\\n\\f\\r]")).cast("int").as("c_punct"),
      regexp_count($"text", lit("[0-9]")).cast("int").as("c_digit"),
      length(regexp_replace($"text", "[ \\t\\n\\f\\r]+", "")).cast("int").as("c_nonws"),
      length($"text").cast("int").as("c_chars"),
      st.getField("n_tokens").as("f_tokens"),
      st.getField("n_bpe").as("f_bpe"),
      st.getField("n_punct").as("f_punct"),
      st.getField("n_digit").as("f_digit"),
      st.getField("n_nonws").as("f_nonws"),
      st.getField("n_chars").as("f_chars"),
      TextFunctions.normalized($"text").as("f_norm"),
      TextFunctions.normalizedComposed($"text").as("c_norm"),
      $"text").collect()
    val names = Seq("tokens", "bpe", "punct", "digit", "nonws", "chars")
    rows.foreach { r =>
      val txt = r.getString(14).take(40).replace("\n", "\\n").replace("\t", "\\t")
      names.zipWithIndex.foreach { case (name, i) =>
        assert(r.getInt(i) == r.getInt(i + 6),
          s"$name mismatch on '$txt': composed=${r.getInt(i)} fused=${r.getInt(i + 6)}")
      }
      assert(r.getString(12) == r.getString(13),
        s"normalize mismatch on '$txt': fused='${r.getString(12)}' composed='${r.getString(13)}'")
    }
  }

  test("fused LangIdExpr matches the composed regexp form on corpus + edge cases") {
    val corpus = spark.read.parquet(s"$sf/documents.parquet").select($"text")
      .as[String].collect().toSeq
    val extra = Seq("", "the und der die", "de de de el los", "word_the_glued",
      "THE AND OF IS", "le la et les des", "no stopwords here at all",
      "that that that nicht nicht nicht")
    val rows = (corpus ++ extra).toDF("text")
      .select(TextFunctions.langId($"text").as("fused"),
        TextFunctions.langIdComposed($"text").as("composed"), $"text").collect()
    rows.foreach { r =>
      assert(r.getString(0) == r.getString(1),
        s"langid mismatch on '${r.getString(2).take(40)}': fused=${r.getString(0)} composed=${r.getString(1)}")
    }
  }

  test("fused NormalizedTextExpr matches the composed regexp form on corpus + edge cases") {
    val corpus = spark.read.parquet(s"$sf/documents.parquet").select($"text")
      .as[String].collect().toSeq
    val extra = Seq("", "   ", "!!!", "Hello, WORLD!", "a--b__c  d",
      "ünïcödé ÁÉ düß", "MiXeD123cAsE", "\ttabs\nand\nnewlines\t",
      "trailing punct...", "...leading punct")
    val rows = (corpus ++ extra).toDF("text")
      .select(TextFunctions.normalized($"text").as("fused"),
        TextFunctions.normalizedComposed($"text").as("composed"), $"text").collect()
    rows.foreach { r =>
      assert(r.getString(0) == r.getString(1),
        s"normalize mismatch on '${r.getString(2).take(40)}': fused='${r.getString(0)}' composed='${r.getString(1)}'")
    }
  }

  test("derived ratios from the fused struct equal the composed scalar functions") {
    val docs = spark.read.parquet(s"$sf/documents.parquet").limit(200)
    val st = TextFunctions.textStats($"text")
    val nChars = st.getField("n_chars")
    val nTokens = st.getField("n_tokens")
    val rows = docs.select(
      round(TextFunctions.punctRatio($"text"), 6).as("c_p"),
      round(when(nChars === 0, lit(0.0))
        .otherwise(st.getField("n_punct").cast("double") / nChars), 6).as("f_p"),
      round(TextFunctions.meanTokenLength($"text"), 6).as("c_m"),
      round(when(nTokens === 0, lit(0.0))
        .otherwise(st.getField("n_nonws").cast("double") / nTokens), 6).as("f_m"),
      TextFunctions.qualityScore($"text").as("c_q")).collect()
    rows.foreach { r =>
      assert(r.getDouble(0) == r.getDouble(1), "punct ratio")
      assert(r.getDouble(2) == r.getDouble(3), "mean token length")
    }
  }

  test("fused QualityGateExpr equals the composed band-check conjunction") {
    // the fused gate exists so a FILTER runs the stats kernel once (the
    // struct form multi-evaluates per conjunct after pushdown) — the
    // boolean must match the conjunction it replaces on every row
    val docs = spark.read.parquet(s"$sf/documents.parquet").select($"text")
      .union(Seq("", "  ", "x", "ok " * 10, "!!!???***" * 20,
        "1234567890 " * 30, ("w" * 30 + " ") * 5).toDF("text"))
    val st = TextFunctions.textStats($"text")
    val nChars = st.getField("n_chars")
    val nTokens = st.getField("n_tokens")
    val punct = when(nChars === 0, lit(0.0))
      .otherwise(st.getField("n_punct").cast("double") / nChars)
    val digit = when(nChars === 0, lit(0.0))
      .otherwise(st.getField("n_digit").cast("double") / nChars)
    val meanTok = when(nTokens === 0, lit(0.0))
      .otherwise(st.getField("n_nonws").cast("double") / nTokens)
    val composed = nChars.between(20, 20000) && punct < 0.2 && digit < 0.25 &&
      meanTok.between(2.0, 12.0)
    val rows = docs.select(
      CorpusPipeline.qualityGate($"text", 20, 20000, 0.2, 0.25, 2.0, 12.0).as("fused"),
      composed.as("composed"), $"text").collect()
    rows.foreach { r =>
      assert(r.getBoolean(0) == r.getBoolean(1),
        s"gate mismatch on '${r.getString(2).take(40)}'")
    }
    assert(rows.exists(!_.getBoolean(0)) && rows.exists(_.getBoolean(0)))
  }
}
