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
}
