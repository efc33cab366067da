package graft.core

import graft.SparkSpec
import org.apache.spark.sql.execution.LogicalRDD

class CheckpointsSpec extends SparkSpec {
  import spark.implicits._

  private def persisted: Set[Int] = spark.sparkContext.getPersistentRDDs.keySet.toSet

  test("localize returns identical rows as a driver-local relation and frees the blocks") {
    val before = persisted
    val df = Seq((1L, 2L), (3L, 4L), (5L, 6L)).toDF("a", "b")
    val local = Checkpoints.localize(df)
    assert(local.as[(Long, Long)].collect().toSet == Set((1L, 2L), (3L, 4L), (5L, 6L)))
    assert(persisted == before, "localize must not leave block-store state behind")
    assert(!local.queryExecution.analyzed.isInstanceOf[LogicalRDD],
      "small frames come back as a local relation, not a checkpoint")
  }

  test("localize falls back to a checkpoint above the driver-row bound") {
    val before = persisted
    val df = Seq((1L, 2L), (3L, 4L), (5L, 6L)).toDF("a", "b")
    val big = Checkpoints.localize(df, maxDriverRows = 1L)
    assert(big.as[(Long, Long)].collect().toSet == Set((1L, 2L), (3L, 4L), (5L, 6L)))
    assert((persisted -- before).size == 1, "above the bound the checkpoint is kept")
    Checkpoints.release(big)
    assert(persisted == before)
  }

  test("release is a no-op on frames that are not checkpoints") {
    val df = Seq(1, 2, 3).toDF("x")
    Checkpoints.release(df) // must not throw
    assert(df.count() == 3)
  }
}
