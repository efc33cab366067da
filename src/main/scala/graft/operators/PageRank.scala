package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Fixed-iteration PageRank (Brin & Page 1998) as a DataFrame loop — the
  * page-importance signal web-corpus curation weighs sampling by (a
  * Common-Crawl-scale link graph is exactly the 100 TB case).
  *
  * Simple-variant semantics, chosen because every step is replayable in
  * ANSI SQL (the oracle unrolls the same iterations as CTEs):
  *
  *   rank₀(v) = 1;  rankₖ(v) = (1−d) + d · Σ_{(u,v)∈E} rankₖ₋₁(u) / outdeg(u)
  *
  * Dangling vertices redistribute nothing (their mass leaves the system,
  * the standard simplification); ranks are therefore unnormalized
  * importance scores, not a probability distribution.
  *
  * Scale shape: the loop's per-iteration work is ONE shuffle join
  * (ranks ⋈ links on src) + ONE aggregation shuffle (sum by dst). The
  * degree-weighted edge list is computed once and persisted
  * (MEMORY_AND_DISK — at web scale this is the big operand and it is
  * reused every iteration); ranks are vertex-sized, always the smaller
  * side. A fixed iteration count keeps the plan finite; for deep runs,
  * `localCheckpoint` the rank frame every ~10 iterations to truncate
  * lineage (not needed at the ≤5 iterations the query surface uses).
  */
object PageRank {

  /** Ranks plus the lifecycle handle for the frames the run persisted.
    * Call `release()` once every consumer of `ranks` has materialized:
    * it unpersists the edge/link/vertex caches so repeated graph runs in
    * one session don't accumulate block-store state. After release, any
    * NEW action on `ranks` recomputes from the raw edges (valid, just no
    * longer cache-accelerated) — release is "I'm done", not "destroy".
    */
  final case class Ranked(ranks: DataFrame, release: () => Unit)

  /** Returns (v, rank) for every vertex appearing as src or dst.
    * `edges` must be duplicate-free: parallel edges would double-count
    * contributions (dedupe upstream — degree math assumes simple edges).
    *
    * CACHE LIFETIME: with `persistLinks` (the default) the edge, link, and
    * vertex frames stay cached after the returned ranks are consumed —
    * they are what make the iterations cheap, and the result's lineage
    * references them, so they cannot be released here. One-shot callers
    * (one graph per session / the bench harness, which clears all state
    * between queries) can use this; callers running MANY graphs in one
    * session should use [[runManaged]] and release between runs.
    */
  def run(edges: DataFrame, src: String, dst: String,
          iterations: Int, damping: Double = 0.85,
          persistLinks: Boolean = true): DataFrame =
    runManaged(edges, src, dst, iterations, damping, persistLinks).ranks

  /** [[run]] with an explicit cache lifecycle: the returned handle's
    * `release()` unpersists every frame this call persisted (the same
    * consume-then-release contract `ConnectedComponents` keeps via
    * `Checkpoints.release`).
    */
  def runManaged(edges: DataFrame, src: String, dst: String,
                 iterations: Int, damping: Double = 0.85,
                 persistLinks: Boolean = true): Ranked = {
    require(iterations >= 0, "iterations must be non-negative")
    // the edge list is read twice to build links (degree aggregate + join
    // side) and Spark does not share non-exchange subplans, so an expensive
    // upstream edge pipeline would run twice — cache the canonical edge
    // frame first (the textbook posture for iterative graph jobs: the edge
    // list is THE reused operand, spill-safe under MEMORY_AND_DISK)
    val e0 = edges.select(col(src).as("src"), col(dst).as("dst"))
    val e = if (persistLinks) e0.persist(StorageLevel.MEMORY_AND_DISK) else e0
    // contribution weight folded into the edge list once: src → dst carries
    // rank(src) * w, w = 1/outdeg(src) — the degree attaches via a WINDOW
    // over the src partitioning, not an aggregate + self-join: one exchange
    // on src builds the weighted links instead of two sides meeting again
    val links0 = e
      .withColumn("deg", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("src"))))
      .select(col("src"), col("dst"), (lit(1.0) / col("deg")).as("w"))
    val links = if (persistLinks) links0.persist(StorageLevel.MEMORY_AND_DISK) else links0
    // links ≡ edges row-for-row (every src has an out-degree), so the vertex
    // set derives from the CACHED links — the upstream edge pipeline
    // (scans, joins, distinct) runs exactly once, not once per reuse. verts
    // is referenced every iteration and at the seed: persist it too
    // (vertex-sized, the small operand).
    val verts0 = links.select(col("src").as("v"))
      .union(links.select(col("dst").as("v"))).distinct()
    val verts = if (persistLinks) verts0.persist(StorageLevel.MEMORY_AND_DISK) else verts0

    var ranks = verts.withColumn("rank", lit(1.0))
    var i = 0
    while (i < iterations) {
      val contribs = links
        .join(ranks.withColumnRenamed("v", "src"), "src")
        .groupBy(col("dst").as("v"))
        .agg(sum(col("rank") * col("w")).as("c"))
      ranks = verts.join(contribs, Seq("v"), "left")
        .select(col("v"),
          (lit(1.0 - damping) + lit(damping) * coalesce(col("c"), lit(0.0))).as("rank"))
      i += 1
    }
    val cached = if (persistLinks) Seq(e, links, verts) else Nil
    Ranked(ranks, () => cached.foreach(_.unpersist(blocking = true)))
  }
}
