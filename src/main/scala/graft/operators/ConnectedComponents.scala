package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.core.Checkpoints

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
    *
    * Adaptive: an edge list at or under `driverMaxEdges` (16 MB of longs at
    * the default) is solved with path-compressed union-find on the driver —
    * near-dup pair sets are usually minuscule relative to the corpus that
    * produced them, and a handful of distributed iterations would cost more
    * in job scheduling than the whole graph costs locally. Larger graphs
    * take the distributed label-propagation path. Both paths produce
    * identical labels.
    *
    * Block lifecycle: every scratch checkpoint (edges, adjacency, each
    * superseded round's labels) is released before return; on the
    * distributed path only the RETURNED frame's final-label blocks remain,
    * and the caller may free those with [[graft.core.Checkpoints.release]]
    * once consumed. The driver path returns a plain local collection with
    * no block-store state.
    */
  def minLabel(edges: DataFrame, idA: String = "id_a", idB: String = "id_b",
               maxIter: Int = 25, driverMaxEdges: Long = 1L << 20): DataFrame = {
    val pairs = edges
      .select(col(idA).cast("long").as("a"), col(idB).cast("long").as("b"))
      // a NULL vertex id (null input, or a non-numeric id the cast nulls
      // out) names no vertex: without this filter the driver path would
      // NPE opaquely in getLong while the distributed path emitted a
      // phantom (null, null) label row — drop such edges identically on
      // both paths, map-side, before anything materializes
      .filter(col("a").isNotNull && col("b").isNotNull)
      .localCheckpoint()
    if (pairs.count() <= driverMaxEdges) {
      // union-find collects eagerly, so the edge blocks can go right away
      val out = try unionFindLocal(pairs) finally Checkpoints.release(pairs)
      return out
    }
    val adj = pairs.select(col("a").as("src"), col("b").as("dst"))
      .union(pairs.select(col("b").as("src"), col("a").as("dst")))
      .localCheckpoint()
    Checkpoints.release(pairs) // adj is materialized; the raw edges are done
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
      Checkpoints.release(labels) // superseded round — blocks freed each iter
      labels = next
      iter += 1
    }
    Checkpoints.release(adj)
    // exiting at the cap WITHOUT convergence would silently return wrong
    // (non-minimum) labels — one duplicate cluster reported as many — and
    // every downstream survivor rule would quietly under-deduplicate. A
    // graph whose diameter exceeds the cap must fail loudly; raise maxIter
    // (or use a star-contraction variant) rather than trusting fragments.
    if (!done) {
      Checkpoints.release(labels)
      throw new IllegalStateException(
        s"connected components did not converge in $maxIter iterations — " +
          "component diameter exceeds the cap; raise maxIter")
    }
    labels
  }

  /** Path-compressed, rank-free union-find toward the smaller root —
    * keeping the smaller id as root makes the final label the component
    * minimum with no second pass.
    */
  private def unionFindLocal(pairs: DataFrame): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    val parent = new java.util.HashMap[Long, Long]()
    def find(x: Long): Long = {
      var r = x
      while (parent.get(r) != r) r = parent.get(r)
      var c = x
      while (c != r) { val n = parent.get(c); parent.put(c, r); c = n }
      r
    }
    pairs.collect().foreach { row =>
      val (a, b) = (row.getLong(0), row.getLong(1))
      if (!parent.containsKey(a)) parent.put(a, a)
      if (!parent.containsKey(b)) parent.put(b, b)
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) { if (ra < rb) parent.put(rb, ra) else parent.put(ra, rb) }
    }
    val rows = new scala.collection.mutable.ArrayBuffer[Row](parent.size)
    parent.keySet.forEach(id => rows += Row(id.toLong, find(id)))
    pairs.sparkSession.createDataFrame(
      pairs.sparkSession.sparkContext.parallelize(rows.toSeq, 1),
      StructType(Seq(StructField("id", LongType, nullable = false),
        StructField("comp", LongType, nullable = false))))
  }
}
