package graft.operators

/** Spark SQL `MERGE INTO` statement builders for catalog targets (Iceberg /
  * Delta), re-expressing the reference's composable merge-query segments
  * (/root/reference/src/main/scala/models/queries/MergeQuery.scala:21-50,
  * MergeQuerySegment.scala:4-71) in Spark's MERGE dialect.
  *
  * These run when the target is a real v2 table: `spark.sql(build(...))`. The
  * DataFrame-level twin is [[CdcMerge]]; both share dialect semantics and are
  * cross-checked in tests. On Iceberg the ON-clause partition IN-lists enable
  * file pruning so a small change batch rewrites only the touched partitions —
  * the property that makes continuous CDC viable on a 100 TB target.
  */
object MergeSqlBuilder {

  private def q(id: String): String = s"`${id.replace("`", "``")}`"

  /** ON segment: key equality + optional partition-pruning IN lists + extra
    * match keys with NULL-tolerant equality (reference
    * MergeQuerySegment.scala:54-71).
    */
  def onClause(keyCol: String,
               partitionPruning: Seq[(String, Seq[String])] = Nil,
               extraMatchKeys: Seq[String] = Nil): String = {
    // fail at BUILD time, not as a server-side ParseException: an empty
    // value list would render `t.col IN ()` (invalid SQL), and it signals
    // a caller bug — a batch whose computed partition set is empty has
    // nothing to merge and should skip the statement entirely
    partitionPruning.foreach { case (col, values) =>
      require(values.nonEmpty,
        s"partition pruning for '$col' has an empty value list — " +
          "an empty batch should skip the MERGE, not render `IN ()`")
    }
    val base = s"t.${q(keyCol)} = s.${q(keyCol)}"
    val prune = partitionPruning.map { case (col, values) =>
      values.map(v => s"'${v.replace("'", "''")}'")
        .mkString(s"t.${q(col)} IN (", ", ", ")")
    }
    val extras = extraMatchKeys.map(k =>
      s"(t.${q(k)} = s.${q(k)} OR s.${q(k)} IS NULL)")
    (base +: (prune ++ extras)).mkString(" AND ")
  }

  private def updateSet(columns: Seq[String]): String =
    columns.map(c => s"t.${q(c)} = s.${q(c)}").mkString(", ")

  private def insertList(columns: Seq[String]): String = {
    val cols = columns.map(q).mkString("(", ", ", ")")
    val vals = columns.map(c => s"s.${q(c)}").mkString("(", ", ", ")")
    s"$cols VALUES $vals"
  }

  /** Hard-delete dialect (MSSQL CT), reference SqlServerChangeTracking.scala:17-58. */
  def mssqlCt(targetTable: String, sourceRef: String, columns: Seq[String],
              keyCol: String = "ARCANE_MERGE_KEY",
              partitionPruning: Seq[(String, Seq[String])] = Nil,
              extraMatchKeys: Seq[String] = Nil): String = {
    val dataCols = columns.filterNot(_ == MsSqlCtDialect.operationColumn)
    s"""MERGE INTO $targetTable t
       |USING $sourceRef s
       |ON ${onClause(keyCol, partitionPruning, extraMatchKeys)}
       |WHEN MATCHED AND s.`SYS_CHANGE_OPERATION` = 'D' THEN DELETE
       |WHEN MATCHED AND s.`SYS_CHANGE_OPERATION` != 'D' AND s.`SYS_CHANGE_VERSION` > t.`SYS_CHANGE_VERSION` THEN UPDATE SET ${updateSet(dataCols)}
       |WHEN NOT MATCHED AND s.`SYS_CHANGE_OPERATION` != 'D' THEN INSERT ${insertList(dataCols)}""".stripMargin
  }

  /** Soft-delete dialect (Synapse Link), reference SynapseLink.scala:17-58. */
  def synapseLink(targetTable: String, sourceRef: String, columns: Seq[String],
                  keyCol: String = "ARCANE_MERGE_KEY",
                  partitionPruning: Seq[(String, Seq[String])] = Nil,
                  extraMatchKeys: Seq[String] = Nil): String =
    s"""MERGE INTO $targetTable t
       |USING $sourceRef s
       |ON ${onClause(keyCol, partitionPruning, extraMatchKeys)}
       |WHEN MATCHED AND coalesce(s.`IsDelete`, false) = true THEN DELETE
       |WHEN MATCHED AND coalesce(s.`IsDelete`, false) = false AND s.`versionnumber` > t.`versionnumber` THEN UPDATE SET ${updateSet(columns)}
       |WHEN NOT MATCHED AND coalesce(s.`IsDelete`, false) = false THEN INSERT ${insertList(columns)}""".stripMargin

  /** Upsert dialect (blob sources), reference UpsertBlob.scala:17-48. */
  def upsertBlob(targetTable: String, sourceRef: String, columns: Seq[String],
                 keyCol: String = "ARCANE_MERGE_KEY",
                 partitionPruning: Seq[(String, Seq[String])] = Nil,
                 extraMatchKeys: Seq[String] = Nil): String =
    s"""MERGE INTO $targetTable t
       |USING $sourceRef s
       |ON ${onClause(keyCol, partitionPruning, extraMatchKeys)}
       |WHEN MATCHED AND s.`createdon` > t.`createdon` THEN UPDATE SET ${updateSet(columns)}
       |WHEN NOT MATCHED THEN INSERT ${insertList(columns)}""".stripMargin

  /** Dedup-latest staging subquery (reference reduceExpr): wraps the staged
    * source so the MERGE sees at most one row per key. `row_number` (not
    * WITH TIES) so MERGE can never see duplicate matches — SURVEY §7.4.
    */
  def dedupSubquery(stagingTable: String, keyCol: String, versionCol: String,
                    tieBreakers: Seq[String] = Nil): String = {
    val order = (versionCol +: tieBreakers).map(c => s"${q(c)} DESC").mkString(", ")
    s"""(SELECT * FROM (
       |  SELECT *, ROW_NUMBER() OVER (PARTITION BY ${q(keyCol)} ORDER BY $order) AS __rn
       |  FROM $stagingTable
       |) WHERE __rn = 1)""".stripMargin
  }

  /** `CREATE OR REPLACE TABLE ... AS` final swap of the backfill-overwrite
    * path (reference OverwriteReplaceQuery.scala:14-22).
    */
  def createOrReplace(targetTable: String, selectSql: String,
                      tableProperties: Map[String, String] = Map.empty): String = {
    val props = if (tableProperties.isEmpty) ""
      else tableProperties.map { case (k, v) => s"'$k' = '$v'" }
        .mkString(" TBLPROPERTIES (", ", ", ")")
    s"CREATE OR REPLACE TABLE $targetTable$props AS $selectSql"
  }
}
