package graft.operators

import graft.SparkSpec

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

/** Golden-file tests for the generated MERGE/overwrite SQL — the reference's
  * own test style (23 golden files under src/test/resources, asserted in the
  * consumer test suites; SURVEY §5.1), re-targeted at the Spark SQL dialect.
  * Regenerate with -Dgraft.golden.update=true after an intentional change;
  * the diff then reviews as text.
  */
class GoldenSqlSpec extends SparkSpec {

  private val dir = Paths.get("src/test/resources/golden")
  private val update = sys.props.get("graft.golden.update").contains("true")

  private def check(name: String, actual: String): Unit = {
    val p = dir.resolve(name)
    if (update || !Files.exists(p)) {
      Files.createDirectories(dir)
      Files.write(p, actual.getBytes(StandardCharsets.UTF_8))
    }
    val expected = new String(Files.readAllBytes(p), StandardCharsets.UTF_8)
    assert(actual == expected, s"golden mismatch for $name — " +
      "rerun with -Dgraft.golden.update=true if the change is intentional")
  }

  private val cols = Seq("ARCANE_MERGE_KEY", "colA", "colB")

  test("mssql-ct merge golden") {
    check("merge_mssql_ct.sql",
      MergeSqlBuilder.mssqlCt("test.table_a", "test.staged_a",
        cols :+ MsSqlCtDialect.operationColumn :+ MsSqlCtDialect.versionColumn))
  }

  test("synapse merge golden with partitions and extra keys") {
    check("merge_synapse_partitioned.sql",
      MergeSqlBuilder.synapseLink("test.table_a", "test.staged_a",
        cols ++ Seq("IsDelete", "versionnumber"),
        partitionPruning = Seq("colA" -> Seq("v1", "v2")),
        extraMatchKeys = Seq("colB")))
  }

  test("upsert-blob merge golden") {
    check("merge_upsert_blob.sql",
      MergeSqlBuilder.upsertBlob("test.table_a", "test.staged_a",
        cols :+ "createdon"))
  }

  test("dedup staging subquery golden") {
    check("dedup_subquery.sql",
      MergeSqlBuilder.dedupSubquery("test.staged_a", "ARCANE_MERGE_KEY",
        "versionnumber", Seq("_file_seq")))
  }

  test("create-or-replace overwrite golden") {
    check("create_or_replace.sql",
      MergeSqlBuilder.createOrReplace("test.table_a",
        "SELECT * FROM combined WHERE NOT coalesce(IsDelete, false)",
        Map("format" -> "PARQUET", "sorted_by" -> "ARCANE_MERGE_KEY")))
  }

  test("all goldens parse under Spark's SQL parser") {
    val files = Files.list(dir)
    try files.iterator().forEachRemaining { p =>
      if (p.toString.endsWith(".sql")) {
        val sql = new String(Files.readAllBytes(p), StandardCharsets.UTF_8)
        // dedup subquery is a fragment; wrap it as a query
        val stmt = if (p.getFileName.toString.startsWith("dedup"))
          s"SELECT * FROM $sql AS d" else sql
        spark.sessionState.sqlParser.parsePlan(stmt)
      }
    } finally files.close()
  }
}
