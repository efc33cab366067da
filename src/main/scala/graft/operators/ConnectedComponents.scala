package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over an undirected edge list — the cluster step
  * that turns pairwise near-dup detections into duplicate CLUSTERS, so the
  * survivor rule ("keep the cluster representative") is transitive-closed
  * instead of pair-local.
  *
  * Minimum-label propagation: every vertex starts labeled with itself; each
  * iteration every vertex takes the min of its own and its neighbors'
  * labels. One join + one aggregate (keys-only shuffles) per iteration;
  * labels are `localCheckpoint`ed each round to truncate the otherwise
  * exponentially growing lineage — the classic iterative-Spark failure
  * mode. Converges in O(component diameter) rounds: duplicate clusters are
  * shallow (most are stars around one original), so the default cap is
  * generous. For adversarial long-path graphs the large-star/small-star
  * variant gives O(log n) rounds from the same join primitives.
  */
object ConnectedComponents {

  /** (id, comp) for every vertex appearing in `edges`; `comp` is the
    * smallest vertex id in the component. Deterministic.
    */
  def minLabel(edges: DataFrame, idA: String = "id_a", idB: String = "id_b",
               maxIter: Int = 25): DataFrame = {
    val adj = edges.select(col(idA).as("src"), col(idB).as("dst"))
      .union(edges.select(col(idB).as("src"), col(idA).as("dst")))
      .localCheckpoint()
    var labels = adj.select(col("src").as("id")).distinct()
      .withColumn("comp", col("id"))
      .localCheckpoint()
    var iter = 0
    var done = false
    while (iter < maxIter && !done) {
      val neighborMin = adj
        .join(labels.select(col("id").as("dst"), col("comp").as("__dcomp")), Seq("dst"))
        .groupBy(col("src").as("id")).agg(min(col("__dcomp")).as("__ncomp"))
      val next = labels.join(neighborMin, Seq("id"), "left")
        .select(col("id"),
          least(col("comp"), coalesce(col("__ncomp"), col("comp"))).as("comp"))
        .localCheckpoint()
      // labels only ever decrease, so one strict comparison detects change
      done = next.as("n").join(labels.as("o"), "id")
        .filter(col("n.comp") < col("o.comp")).isEmpty
      labels = next
      iter += 1
    }
    labels
  }
}
