package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project, SubqueryAlias}
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/** Map-parallelism floor for expensive per-row kernels.
  *
  * A fingerprint family like [[expressions.Md5Family]] costs an md5 per
  * gram — microseconds per row — so the map stage computing it must hold
  * every core. A small corpus (one parquet file under
  * `spark.sql.files.maxPartitionBytes`) plans as ONE input partition,
  * serializing the whole pass on a single thread; at warehouse scale the
  * scan already carries more partitions than cores and this is a no-op.
  *
  * The decision reads only the ANALYZED logical plan — free, no job and no
  * physical planning. (`df.rdd.getNumPartitions` would route through the
  * AQE executed plan, materializing upstream shuffle stages — eager jobs
  * for a composed input; even `sparkPlan` re-runs physical planning, which
  * is seconds of driver time on a deep pipeline plan.) Only a plain
  * projection/filter over a single file relation qualifies: that is the
  * under-parallelized shape, and composed inputs (joins, aggregates,
  * caches) already carry shuffle-width partitioning.
  */
private[graft] object FanOut {

  private def scanBytes(p: LogicalPlan): Option[Long] = p match {
    case Project(_, c)       => scanBytes(c)
    case Filter(_, c)        => scanBytes(c)
    case SubqueryAlias(_, c) => scanBytes(c)
    case lr: LogicalRelation =>
      lr.relation match {
        case fs: HadoopFsRelation => Some(fs.location.sizeInBytes)
        case _                    => None
      }
    case _ => None
  }

  def apply(df: DataFrame): DataFrame = {
    if (df.isStreaming) return df // source governs micro-batch parallelism
    val target = df.sparkSession.sparkContext.defaultParallelism
    val maxPart = df.sparkSession.sessionState.conf.filesMaxPartitionBytes
    scanBytes(df.queryExecution.analyzed) match {
      case Some(bytes) if bytes < target.toLong * maxPart => df.repartition(target)
      case _                                              => df
    }
  }
}
