package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class JsonShapeSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("meta", StructType(Seq(StructField("src", StringType)))),
    StructField("items", ArrayType(StructType(Seq(
      StructField("id", LongType), StructField("v", DoubleType)))))))

  private def df = Seq(
    """{"meta":{"src":"a"},"items":[{"id":1,"v":0.5},{"id":2,"v":1.5}]}""",
    """{"meta":{"src":"b"},"items":[{"id":3,"v":2.5}]}"""
  ).toDF("json")

  test("pointer conversion handles /, $., and empty forms") {
    assert(JsonShape.pointerToPath("/a/b") == "a.b")
    assert(JsonShape.pointerToPath("$.a.b") == "a.b")
    assert(JsonShape.pointerToPath("") == "")
  }

  test("selectPointer projects the nested root") {
    val out = JsonShape.selectPointer(df, $"json", schema, "/meta")
    assert(out.select($"doc.src").as[String].collect().toSet == Set("a", "b"))
  }

  test("explodeArray emits one row per element with rename") {
    val parsed = JsonShape.selectPointer(df, $"json", schema)
    val exploded = JsonShape.explodeArray(parsed, $"doc", "/items", "item")
    assert(exploded.count() == 3)
    assert(exploded.select($"item.id").as[Long].collect().sorted.toSeq == Seq(1L, 2L, 3L))
    // parent fields retained alongside exploded elements
    assert(exploded.select($"doc.meta.src").as[String].collect().count(_ == "a") == 2)
  }

  test("extractString pulls scalar pointers without schema") {
    val out = df.select(JsonShape.extractString($"json", "/meta/src").as("s"))
    assert(out.as[String].collect().toSet == Set("a", "b"))
  }

  // heterogeneous payloads: object / array / scalar / missing / malformed —
  // the drift shapes that break a fixed from_json schema
  private def irregular = Seq(
    (1L, """{"id":1,"payload":{"kind":"obj","score":7}}"""),
    (2L, """{"id":2,"payload":[1,2,3]}"""),
    (3L, """{"id":3,"payload":"plain string"}"""),
    (4L, """{"id":4}"""),
    (5L, """not json at all""")
  ).toDF("k", "json")

  test("variant catch-all ingests heterogeneous payloads without drift failures") {
    val doc = irregular.select($"k", JsonShape.parseVariant($"json").as("doc"))
    assert(doc.schema("doc").dataType == VariantType)
    // malformed document -> NULL, everything else parses
    assert(doc.filter($"doc".isNull).select($"k").as[Long].collect().toSeq == Seq(5L))
    // typed extraction from the irregular subtree
    val scores = doc.select($"k",
      JsonShape.variantGet($"doc", "/payload/score", "bigint").as("score"))
    assert(scores.filter($"score".isNotNull).as[(Long, Long)].collect().toSeq == Seq((1L, 7L)))
    // round trip through to_json preserves each shape
    val shapes = doc.filter($"doc".isNotNull)
      .select($"k", to_json(JsonShape.variantGet($"doc", "/payload", "variant")).as("p"))
      .as[(Long, String)].collect().toMap
    assert(shapes(1L) == """{"kind":"obj","score":7}""")
    assert(shapes(2L) == """[1,2,3]""")
    assert(shapes(3L) == "\"plain string\"")
    assert(shapes(4L) == null)
  }

  test("schemaWithVariantFields keeps strict typing outside the declared subtree") {
    val strict = StructType(Seq(StructField("id", LongType),
      StructField("payload", StringType)))
    val hybrid = JsonShape.schemaWithVariantFields(strict, Set("payload"))
    assert(hybrid("id").dataType == LongType)
    assert(hybrid("payload").dataType == VariantType)
    val parsed = irregular.filter($"k" < 5)
      .select(from_json($"json", hybrid).as("doc"))
    assert(parsed.select($"doc.id").as[Long].collect().sorted.toSeq == Seq(1L, 2L, 3L, 4L))
    val kinds = parsed.select($"doc.id".as[Long],
      JsonShape.variantGet($"doc.payload", "/kind", "string").as[String]).collect().toMap
    assert(kinds(1L) == "obj" && kinds(2L) == null)
    // and a variant column round-trips through parquet (shredded storage)
    val tmp = java.nio.file.Files.createTempDirectory("variant-pq").toString
    parsed.write.mode("overwrite").parquet(s"$tmp/t")
    val back = spark.read.parquet(s"$tmp/t")
    assert(back.schema("doc").dataType.asInstanceOf[StructType]("payload").dataType == VariantType)
    assert(back.select(to_json($"doc.payload")).as[String].collect()
      .count(_ != null) == 3)
  }
}
