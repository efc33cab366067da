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
    // one getField per path SEGMENT: getField matches a single literal
    // field name, so a dotted path ("payload.items") passed whole would
    // look for a field literally named "payload.items" and fail analysis
    // on every nested pointer
    val arr = path.split('.').filter(_.nonEmpty)
      .foldLeft(docCol)((c, seg) => c.getField(seg))
    df.withColumn(elementName, explode(arr))
  }

  /** Scalar pointer extraction without a schema (string result) — the
    * lightweight path for probing semi-structured columns.
    */
  def extractString(jsonCol: Column, pointer: String): Column =
    get_json_object(jsonCol, "$." + pointerToPath(pointer))

  // ---- Variant catch-all (reference SchemaConversions.scala:50: unknown /
  // ObjectType nodes map to VariantType). Spark 4's VARIANT is the native
  // analog: a binary-encoded semi-structured value that tolerates
  // heterogeneous payloads (object here, array there, scalar elsewhere)
  // without schema drift failures, while staying queryable (variant_get
  // with a path + target type) and shreddable by the parquet writer. ----

  /** Parse a JSON string column as VARIANT — the schema-less catch-all for
    * irregular producers. Malformed documents become NULL (`try_parse_json`)
    * rather than failing the stream, matching the tolerance the reference
    * gains from its Variant mapping.
    */
  def parseVariant(jsonCol: Column): Column = try_parse_json(jsonCol)

  /** Typed extraction from a VARIANT document: pointer + Spark DDL type,
    * e.g. `variantGet(doc, "/a/b", "bigint")`. NULL when the path is absent
    * or the value can't cast (`try_variant_get`).
    */
  def variantGet(doc: Column, pointer: String, ddlType: String): Column = {
    val path = pointerToPath(pointer)
    try_variant_get(doc, if (path.isEmpty) "$" else "$." + path, ddlType)
  }

  /** Replace the named top-level fields of a from_json schema with
    * VariantType — declare exactly which subtrees are irregular and keep
    * strict typing everywhere else (the reference's per-node ObjectType →
    * Variant mapping, field-granular).
    */
  def schemaWithVariantFields(schema: StructType, variantFields: Set[String]): StructType = {
    val lower = variantFields.map(_.toLowerCase(java.util.Locale.ROOT))
    StructType(schema.fields.map { f =>
      if (lower.contains(f.name.toLowerCase(java.util.Locale.ROOT)))
        f.copy(dataType = org.apache.spark.sql.types.VariantType)
      else f
    })
  }
}
