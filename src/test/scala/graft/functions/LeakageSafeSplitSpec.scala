package graft.functions

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.functions._

/** The invariant `doc_split_leakage_safe` exists for: hashing the cluster
  * representative (not the doc id) means NO near-dup cluster ever straddles
  * a split boundary — the split-contamination guard.
  */
class LeakageSafeSplitSpec extends SparkSpec {

  test("every near-dup cluster lands in exactly one split; per-doc hashing would not") {
    val df = SparkEntry.queries("doc_split_leakage_safe")(spark, sf).cache()
    try {
      val straddling = df.groupBy("cluster_rep")
        .agg(countDistinct(col("split")).as("n_splits"))
        .filter(col("n_splits") > 1).count()
      assert(straddling == 0, "a cluster crossing splits is exactly the leak")
      val multiDoc = df.groupBy("cluster_rep").count().filter(col("count") > 1).count()
      assert(multiDoc > 0, "fixture corpus must contain at least one real dup cluster")
      // negative control: per-doc hashing DOES split at least one cluster
      // (otherwise this spec would pass vacuously on this corpus)
      val perDoc = df.withColumn("naive",
        Sampling.assignSplit(col("doc_id"), Seq("test" -> 0.05, "val" -> 0.05)))
      val naiveStraddling = perDoc.groupBy("cluster_rep")
        .agg(countDistinct(col("naive")).as("n_splits"))
        .filter(col("n_splits") > 1).count()
      assert(naiveStraddling > 0,
        "per-doc hashing separates some cluster on this corpus — the trap is real here")
    } finally df.unpersist()
  }
}
