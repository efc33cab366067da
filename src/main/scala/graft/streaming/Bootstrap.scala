package graft.streaming

import graft.core.Naming
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types.StructType

/** Pre-stream bootstrap (reference T12,
  * services/bootstrap/DefaultStreamBootstrapper.scala:26-81): drop leftover
  * staging tables by prefix, drop outdated backfill tables, create the target
  * from the source-inferred schema. Here "tables" are directories under a
  * warehouse root; on an Iceberg/Delta catalog the same calls go through
  * `spark.catalog` — the naming discipline (graft.core.Naming) is what makes
  * prefix cleanup safe in both worlds.
  */
object Bootstrap {

  /** Delete leftover staging directories for this stream. Returns names
    * removed.
    */
  def cleanupStagingTables(spark: SparkSession, warehouseDir: String, streamId: String): Seq[String] =
    cleanupByPredicate(spark, warehouseDir, Naming.isStagingFor(streamId, _))

  /** Delete backfill directories not matching the current backfill id. */
  def cleanupOutdatedBackfills(spark: SparkSession, warehouseDir: String, streamId: String,
                               currentBackfillId: Option[String]): Seq[String] =
    cleanupByPredicate(spark, warehouseDir, name =>
      Naming.isBackfillFor(streamId, name) &&
        !currentBackfillId.exists(id => name.startsWith(Naming.backfillTable(streamId, id))))

  private def cleanupByPredicate(spark: SparkSession, warehouseDir: String,
                                 shouldDrop: String => Boolean): Seq[String] = {
    val root = new Path(warehouseDir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) return Nil
    val dropped = fs.listStatus(root).toSeq
      .filter(_.isDirectory)
      .map(_.getPath)
      .filter(p => shouldDrop(p.getName))
    dropped.foreach(p => fs.delete(p, true))
    dropped.map(_.getName)
  }

  /** Create the target (empty snapshot with the source schema) if missing —
    * the reference's createTargetTable from discovered source schema.
    */
  def createTargetIfMissing(spark: SparkSession, targetDir: String,
                            sourceSchema: StructType): ParquetTarget = {
    val t = new ParquetTarget(spark, targetDir)
    if (!t.exists) {
      t.commit(spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], sourceSchema))
    }
    t
  }
}
