package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, StructType}

/** JSON shaping operators for blob JSON feeds — the Spark restatement of the
  * reference's JsonScanner (services/iceberg/interop/JsonScanner.scala:20-163):
  * JsonPointer root selection (:33-36), array-explode with field rename
  * (:38-64). The Avro-union null fixups (:66-107) are unnecessary — Spark's
  * JSON reader handles nullability natively.
  *
  * All operations are plain column expressions: schema-on-read stays inside
  * the scan, pointer selection is nested-field projection (pruned into the
  * reader), explode is the native generator.
  */
object JsonShape {

  /** '/a/b' or '$.a.b' → Spark nested-field path 'a.b'. */
  def pointerToPath(pointer: String): String =
    pointer.stripPrefix("$").stripPrefix(".").stripPrefix("/")
      .replace("/", ".")

  /** Parse a JSON string column with an explicit schema and select the
    * pointer root (whole document when pointer is empty/"/").
    */
  def selectPointer(df: DataFrame, jsonCol: Column, schema: DataType,
                    pointer: String = ""): DataFrame = {
    val parsed = df.withColumn("__doc", from_json(jsonCol, schema))
    val path = pointerToPath(pointer)
    if (path.isEmpty) parsed.withColumnRenamed("__doc", "doc")
    else parsed.withColumn("doc", col(s"__doc.$path")).drop("__doc")
  }

  /** Explode an array found at `arrayPointer` inside the parsed document,
    * renaming the element to `elementName` — one output row per element,
    * parent fields retained (reference jsonArrayPointers semantics).
    */
  def explodeArray(df: DataFrame, docCol: Column, arrayPointer: String,
                   elementName: String): DataFrame = {
    val path = pointerToPath(arrayPointer)
    df.withColumn(elementName, explode(docCol.getField(path)))
  }

  /** Scalar pointer extraction without a schema (string result) — the
    * lightweight path for probing semi-structured columns.
    */
  def extractString(jsonCol: Column, pointer: String): Column =
    get_json_object(jsonCol, "$." + pointerToPath(pointer))
}
