package graft

import graft.functions.TextFunctions
import org.apache.spark.sql.functions._

class GraftExtensionsSpec extends SparkSpec {
  import spark.implicits._

  GraftExtensions.register(spark)

  test("SQL functions resolve and match the DataFrame API on the corpus") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    docs.createOrReplaceTempView("ext_docs")
    val viaSql = spark.sql(
      """SELECT doc_id, graft_lang_id(text) AS lang_id,
        |  graft_fingerprint(text) AS fp,
        |  graft_text_stats(text).n_tokens AS n_tokens
        |FROM ext_docs""".stripMargin)
    val viaDf = docs.select($"doc_id",
      TextFunctions.langId($"text").as("lang_id"),
      TextFunctions.fingerprint($"text").as("fp"),
      TextFunctions.textStats($"text").getField("n_tokens").as("n_tokens"))
    assert(viaSql.exceptAll(viaDf).isEmpty && viaDf.exceptAll(viaSql).isEmpty)
  }

  test("parameterized functions take integer literals; vectors work in SQL") {
    val r = spark.sql(
      """SELECT size(graft_word_ngram_hashes('a b c d e', 3)) AS ngrams,
        |  size(graft_minhash_signature(graft_shingle_hashes('abcdefgh', 5), 16)) AS sig,
        |  graft_cosine_similarity(array(1.0F, 0.0F), array(1.0F, 0.0F)) AS cos_same,
        |  graft_dot_product(array(1.0F, 2.0F), array(3.0F, 4.0F)) AS dot
        |FROM range(1)""".stripMargin).head()
    assert(r.getInt(0) == 3)
    assert(r.getInt(1) == 16)
    assert(r.getDouble(2) == 1.0)
    assert(r.getDouble(3) == 11.0)
    val r2 = spark.sql(
      s"""SELECT graft_nfc_normalize('Café') AS nfc,
        |  graft_compression_ratio(repeat('ab ', 200)) AS ratio,
        |  graft_hilbert_index_2d(1L, 0L, 1) AS hil
        |FROM range(1)""".stripMargin).head()
    assert(r2.getString(0) == "Café", "combining acute composes")
    assert(r2.getDouble(1) < 0.2)
    assert(r2.getLong(2) == 3L)
    val r3 = spark.sql(
      """SELECT graft_strided_resize(CAST('abcdefgh' AS BINARY), 4) AS strided,
        |  graft_resize_image(CAST('not an image' AS BINARY), 4) AS img
        |FROM range(1)""".stripMargin).head()
    assert(r3.getAs[Array[Byte]](0).length == 4, "8 bytes strided down to 4")
    assert(new String(r3.getAs[Array[Byte]](1)) == "not an image",
      "non-image payloads pass through unchanged")
    val r4 = spark.sql(
      """SELECT graft_gear_chunks(CAST(repeat('payload bytes ', 100) AS BINARY), 64, 8, 1024) AS chunks,
        |  graft_vector_minmax(v).mins[0] AS mn, graft_vector_minmax(v).maxs[0] AS mx
        |FROM (SELECT array(CAST(id AS DOUBLE)) AS v FROM range(5))""".stripMargin).head()
    val chunkLens = r4.getSeq[org.apache.spark.sql.Row](0).map(_.getLong(1))
    assert(chunkLens.sum == 1400L, "chunks tile the payload from SQL too")
    assert(r4.getDouble(1) == 0.0 && r4.getDouble(2) == 4.0)
  }

  test("non-literal size argument is rejected with a clear error") {
    val e = intercept[Exception] {
      spark.sql("SELECT graft_shingle_hashes('abc', id + 1) FROM range(1)").collect()
    }
    assert(e.getMessage.contains("integer literal") ||
      e.getMessage.contains("graft_shingle_hashes"))
  }

  test("wrong-typed arguments fail at analysis, not in a running task") {
    // one per InputCheck shape: string, binary, bigint, float/double array
    val badCalls = Seq(
      "SELECT graft_lang_id(42) FROM range(1)",
      "SELECT graft_text_stats(array(1)) FROM range(1)",
      "SELECT graft_gear_chunks('not binary', 64, 8, 1024) FROM range(1)",
      "SELECT graft_hilbert_index_2d(1, 2.5, 4) FROM range(1)",
      "SELECT graft_hyperplane_buckets(array('x'), 8, 2, 1) FROM range(1)",
      "SELECT graft_vector_mean(text) FROM (SELECT 'a' AS text)",
      "SELECT graft_misra_gries(id, 4) FROM range(3)")
    badCalls.foreach { q =>
      val e = intercept[org.apache.spark.sql.AnalysisException](spark.sql(q).collect())
      assert(e.getMessage.toLowerCase(java.util.Locale.ROOT).contains("expects"),
        s"expected a typed analysis error for: $q — got ${e.getMessage.take(200)}")
    }
  }

  test("a bare NULL literal stays NULL — never an analysis error") {
    // every guarded expression is null-safe; NullType must pass the check
    val r = spark.sql(
      """SELECT graft_lang_id(NULL) AS a, graft_text_stats(NULL) AS b,
        |  graft_gear_chunks(NULL, 64, 8, 1024) AS c,
        |  graft_hilbert_index_2d(NULL, 2L, 4) AS d,
        |  graft_vector_mean(NULL) AS e
        |FROM range(1)""".stripMargin).head()
    (0 until 5).foreach(i => assert(r.isNullAt(i), s"column $i must be NULL"))
    // a NON-foldable always-NULL input (every CASE branch NULL) is rejected
    // at analysis: it would otherwise survive to codegen with an
    // Object-typed slot, fail Janino compilation, and silently disable
    // whole-stage codegen for the stage
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT graft_lang_id(CASE WHEN id > 0 THEN NULL END) FROM range(3)")
        .collect()
    }
    assert(e.getMessage.contains("non-literal always-NULL"), e.getMessage.take(200))
  }

  test("extension class injects the same function set") {
    // unit-level: the injector enumerates every name register() provides
    assert(GraftExtensions.functions.map(_._1).distinct.size ==
      GraftExtensions.functions.size)
    assert(GraftExtensions.functions.map(_._1).forall(_.startsWith("graft_")))
  }
}
