package graft.sources

import graft.SparkSpec
import graft.sources.BlobListingSource.BlobSchema
import org.apache.spark.sql.types._

class AvroSchemaSpec extends SparkSpec {

  test("primitives, logical types, and null-unions map to Spark types") {
    val schema = BlobSchema.fromAvro(
      """{"type":"record","name":"Row","fields":[
        |  {"name":"id","type":"long"},
        |  {"name":"flag","type":"boolean"},
        |  {"name":"qty","type":"int"},
        |  {"name":"ratio","type":"float"},
        |  {"name":"score","type":"double"},
        |  {"name":"name","type":["null","string"]},
        |  {"name":"blob","type":["bytes","null"]},
        |  {"name":"color","type":{"type":"enum","name":"C","symbols":["R","G","B"]}},
        |  {"name":"price","type":{"type":"bytes","logicalType":"decimal","precision":12,"scale":2}},
        |  {"name":"day","type":{"type":"int","logicalType":"date"}},
        |  {"name":"at","type":{"type":"long","logicalType":"timestamp-micros"}},
        |  {"name":"local_at","type":{"type":"long","logicalType":"local-timestamp-millis"}},
        |  {"name":"uid","type":{"type":"string","logicalType":"uuid"}}
        |]}""".stripMargin)
    assert(schema === StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("flag", BooleanType, nullable = false),
      StructField("qty", IntegerType, nullable = false),
      StructField("ratio", FloatType, nullable = false),
      StructField("score", DoubleType, nullable = false),
      StructField("name", StringType, nullable = true),
      StructField("blob", BinaryType, nullable = true),
      StructField("color", StringType, nullable = false),
      StructField("price", DecimalType(12, 2), nullable = false),
      StructField("day", DateType, nullable = false),
      StructField("at", TimestampType, nullable = false),
      StructField("local_at", TimestampNTZType, nullable = false),
      StructField("uid", StringType, nullable = false))))
  }

  test("nested records, arrays, maps, widening and complex unions") {
    val schema = BlobSchema.fromAvro(
      """{"type":"record","name":"Outer","fields":[
        |  {"name":"tags","type":{"type":"array","items":["null","string"]}},
        |  {"name":"attrs","type":{"type":"map","values":"long"}},
        |  {"name":"inner","type":{"type":"record","name":"Inner","fields":[
        |    {"name":"a","type":"int"}]}},
        |  {"name":"wide_int","type":["int","long"]},
        |  {"name":"wide_float","type":["null","float","double"]},
        |  {"name":"poly","type":["string","long"]}
        |]}""".stripMargin)
    assert(schema("tags").dataType === ArrayType(StringType, containsNull = true))
    assert(schema("attrs").dataType === MapType(StringType, LongType, valueContainsNull = false))
    assert(schema("inner").dataType ===
      StructType(Seq(StructField("a", IntegerType, nullable = false))))
    assert(schema("wide_int").dataType === LongType)
    assert(!schema("wide_int").nullable)
    assert(schema("wide_float").dataType === DoubleType)
    assert(schema("wide_float").nullable)
    assert(schema("poly").dataType === StructType(Seq(
      StructField("member0", StringType, nullable = true),
      StructField("member1", LongType, nullable = true))))
  }

  test("recursive records are rejected; non-record top level is rejected") {
    val recursive =
      """{"type":"record","name":"Node","fields":[
        |  {"name":"v","type":"int"},
        |  {"name":"next","type":["null","Node"]}
        |]}""".stripMargin
    val e = intercept[IllegalArgumentException](BlobSchema.fromAvro(recursive))
    assert(e.getMessage.contains("recursive"))
    val e2 = intercept[IllegalArgumentException](
      BlobSchema.fromAvro("""{"type":"array","items":"int"}"""))
    assert(e2.getMessage.contains("record"))
  }

  test("an Avro-declared schema drives a real blob JSON read") {
    val dir = java.nio.file.Files.createTempDirectory("avro-blob").toString
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "part-0.json"),
      "{\"id\": 1, \"name\": \"a\"}\n{\"id\": 2, \"name\": null}\n".getBytes)
    val cfg = BlobSourceConfig(
      path = dir, format = "json", pkColumns = Seq("id"),
      sourceSchema = Some(BlobSchema.fromAvro(
        """{"type":"record","name":"R","fields":[
          |  {"name":"id","type":"long"},
          |  {"name":"name","type":["null","string"]}]}""".stripMargin)))
    val Some((df, _)) = BlobListingSource.nextBatch(spark, cfg, None)
    val rows = df.selectExpr("id", "name").collect().map(r => (r.getLong(0), r.isNullAt(1)))
    assert(rows.toSet === Set((1L, false), (2L, true)))
    assert(df.schema("id").dataType === LongType)
  }
}
