package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact n-gram Jaccard similarity via an inverted-index self-join.
  *
  * Never materializes the n² pair space: documents meet only through shared
  * grams (posting-list join), so cost is Σ df(gram)² over distinct grams —
  * with the document-frequency cap applied, near-linear in corpus size. This
  * is the exact-similarity complement to [[MinHashLsh]] (approximate) and the
  * verification kernel both share.
  */
object NgramJaccard {

  /** Pairs (id_a < id_b) with Jaccard(ngrams_a, ngrams_b) >= threshold.
    *
    * @param maxDocFreq drop grams occurring in more than this many documents
    *                   (stop-gram skew guard: a gram in half the corpus would
    *                   otherwise quadratically dominate the join — the
    *                   posting-list join costs Σ df(gram)², so one uncapped
    *                   stop-gram is the whole bill). Capped runs are still
    *                   exact for pairs whose similarity is carried by rarer
    *                   grams — the standard trade-off. Defaults to auto:
    *                   max(1000, 1% of corpus documents), so the guard is on
    *                   at any corpus size without tuning. Pass 0 to disable
    *                   (exact-verification kernel use only — never at scale).
    */
  def pairs(df: DataFrame, idCol: String, ngrams: Column,
            threshold: Double, maxDocFreq: Long = -1L): DataFrame = {
    val g = cappedGrams(df, idCol, ngrams, maxDocFreq)
    val cnt = g.groupBy(col("__id")).agg(count("*").as("__n"))
    val inter = g.as("a").join(g.as("b"),
        col("a.__gram") === col("b.__gram") && col("a.__id") < col("b.__id"))
      .groupBy(col("a.__id").as("id_a"), col("b.__id").as("id_b"))
      .agg(count("*").as("__i"))
    inter
      .join(cnt.as("ca"), col("id_a") === col("ca.__id"))
      .join(cnt.as("cb"), col("id_b") === col("cb.__id"))
      .withColumn("jaccard",
        round(col("__i") / (col("ca.__n") + col("cb.__n") - col("__i")), 4))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  /** ASYMMETRIC containment pairs (Broder 1997's containment, the
    * quote/subset-duplicate detector): (id_a, id_b, containment) with
    * containment(A→B) = |grams(A) ∩ grams(B)| / |grams(A)| >= `threshold`,
    * id_a ≠ id_b, BOTH orientations emitted. A short document pasted
    * inside a much longer one scores near 1 here while its symmetric
    * Jaccard (which [[pairs]] thresholds) stays near |A|/|B| — the case
    * every quote-heavy web corpus hits. Same posting-list funnel and
    * stop-gram cap as [[pairs]]; only the verification arithmetic and the
    * pair orientation differ (the a ≠ b join emits each candidate pair
    * twice, still candidate-proportional).
    */
  def containmentPairs(df: DataFrame, idCol: String, ngrams: Column,
                       threshold: Double, maxDocFreq: Long = -1L): DataFrame = {
    val g = cappedGrams(df, idCol, ngrams, maxDocFreq)
    val cnt = g.groupBy(col("__id")).agg(count("*").as("__n"))
    // each unordered pair joins and aggregates ONCE (the `<` predicate,
    // same as [[pairs]] — an a ≠ b join would double the posting-list
    // join and the pair aggregation, measured 3.5× the jaccard funnel);
    // both orientations then derive arithmetically from the one
    // intersection count via a 2-element explode
    val inter = g.as("a").join(g.as("b"),
        col("a.__gram") === col("b.__gram") && col("a.__id") < col("b.__id"))
      .groupBy(col("a.__id").as("__ida"), col("b.__id").as("__idb"))
      .agg(count("*").as("__i"))
    inter
      .join(cnt.as("ca"), col("__ida") === col("ca.__id"))
      .join(cnt.as("cb"), col("__idb") === col("cb.__id"))
      .select(explode(array(
        struct(col("__ida").as("id_a"), col("__idb").as("id_b"),
          round(col("__i") / col("ca.__n"), 4).as("containment")),
        struct(col("__idb").as("id_a"), col("__ida").as("id_b"),
          round(col("__i") / col("cb.__n"), 4).as("containment")))).as("__p"))
      .select(col("__p.id_a").as("id_a"), col("__p.id_b").as("id_b"),
        col("__p.containment").as("containment"))
      .filter(col("containment") >= threshold)
  }

  /** The shared (id, gram) stream with the stop-gram cap applied.
    *
    * FanOut: parallelism floor for the gram-hashing map stage (no-op at
    * scale); repartition: ONE exchange on the join key shared by the stop
    * agg, per-doc counts, and both self-join sides — without it each branch
    * plans its own exchange and re-runs the gram computation.
    *
    * The cap anti-joins against the stop grams (few by construction: only
    * grams above the cap), not an inner join against all rare grams — the
    * rare set is ∝ distinct grams and could never broadcast at corpus
    * scale, while the stop set stays small enough for AQE to broadcast.
    * The auto cap (max(1000, 1% of corpus)) derives the corpus size INSIDE
    * the plan — a one-row broadcast from an id-only scan — so building the
    * query launches no eager count job (callers compose this lazily; an
    * extra full-input job per call was the round-3 finding). Explicit caps
    * skip that branch entirely.
    */
  private def cappedGrams(df: DataFrame, idCol: String, ngrams: Column,
                          maxDocFreq: Long): DataFrame = {
    val g0 = FanOut(df).select(col(idCol).as("__id"), explode(ngrams).as("__gram"))
      .repartition(col("__gram"))
    if (maxDocFreq == 0) g0
    else {
      val capCol =
        if (maxDocFreq > 0) lit(maxDocFreq)
        else col("__cap")
      val stop0 = g0.groupBy("__gram").agg(count("*").as("__df"))
      val stop =
        (if (maxDocFreq > 0) stop0
         else stop0.crossJoin(broadcast(df.select(
           greatest(lit(1000L), approx_count_distinct(col(idCol)) / 100)
             .cast("long").as("__cap")))))
          .filter(col("__df") > capCol).select("__gram")
      g0.join(stop, Seq("__gram"), "left_anti")
    }
  }

  /** Bipartite variant: (id_left, id_right) pairs ACROSS two corpora with
    * Jaccard >= `threshold` — cross-corpus near-dup detection and benchmark
    * decontamination (drop training docs overlapping a held-out set). Same
    * funnel as [[pairs]]: stop-gram cap (document frequency computed over
    * both inputs), posting-list equi-join — left and right docs meet only
    * through shared grams, never n² — then exact verify on candidate
    * intersections. The inputs are assumed document-disjoint (a doc in both
    * would double-count toward the df cap).
    */
  def bipartitePairs(left: DataFrame, right: DataFrame, idCol: String,
                     ngrams: Column, threshold: Double,
                     maxDocFreq: Long = -1L,
                     pinExchange: Boolean = true): DataFrame = {
    // pinned per-side gram exchange (default): each side's (id, gram)
    // stream feeds three branches (the stop-agg union, the per-doc count,
    // the inter join), and ReuseExchange computes the repartition subtree
    // once — so the n-gram hashing kernel runs 1× per side instead of 3×.
    // That wins when callers feed MATERIALIZED slim inputs (checkpoint /
    // persisted), the doc_decontaminate shape. When the inputs are cached
    // upstream of a cheap projection — CorpusPipeline's case — every branch
    // already reads the cache and the extra exchange only re-shuffles full
    // gram streams: round 8 measured +35% for pinning there. Callers with
    // cached inputs pass pinExchange = false.
    def pin(df: DataFrame): DataFrame =
      if (pinExchange) df.repartition(col("__gram")) else df
    val gl0 = pin(FanOut(left).select(col(idCol).as("__lid"), explode(ngrams).as("__gram")))
    val gr0 = pin(FanOut(right).select(col(idCol).as("__rid"), explode(ngrams).as("__gram")))
    val (gl, gr) =
      if (maxDocFreq == 0) (gl0, gr0)
      else {
        val all = gl0.select(col("__gram"))
          .unionByName(gr0.select(col("__gram")))
        // same lazy in-plan auto cap as [[pairs]]: corpus size from id-only
        // scans of both inputs, broadcast as one row — no eager count jobs
        val capCol = if (maxDocFreq > 0) lit(maxDocFreq) else col("__cap")
        val stop0 = all.groupBy("__gram").agg(count("*").as("__df"))
        val stop =
          (if (maxDocFreq > 0) stop0
           else {
             val ids = left.select(col(idCol).as("__docid"))
               .unionByName(right.select(col(idCol).as("__docid")))
             stop0.crossJoin(broadcast(ids.select(
               greatest(lit(1000L), approx_count_distinct(col("__docid")) / 100)
                 .cast("long").as("__cap"))))
           })
            .filter(col("__df") > capCol).select("__gram")
        (gl0.join(stop, Seq("__gram"), "left_anti"),
          gr0.join(stop, Seq("__gram"), "left_anti"))
      }
    val cl = gl.groupBy(col("__lid")).agg(count("*").as("__nl"))
    val cr = gr.groupBy(col("__rid")).agg(count("*").as("__nr"))
    val inter = gl.join(gr, "__gram")
      .groupBy(col("__lid"), col("__rid")).agg(count("*").as("__i"))
    inter
      .join(cl, "__lid").join(cr, "__rid")
      .withColumn("jaccard",
        round(col("__i") / (col("__nl") + col("__nr") - col("__i")), 4))
      .filter(col("jaccard") >= threshold)
      .select(col("__lid").as("id_left"), col("__rid").as("id_right"),
        col("jaccard"))
  }

  /** Left-side ids sharing ANY gram with the right side — GPT-3-style exact
    * n-gram decontamination (any 13-gram collision with a benchmark
    * document marks the training document contaminated; Brown et al. 2020
    * appendix C — public paper). A posting-list semi-join: left explodes to
    * (id, gram), right reduces to a distinct gram set, contaminated ids =
    * semi-join on gram. Cost is linear in gram counts plus one equi-join
    * shuffle — no pair space and no similarity math, which is the point:
    * ANY overlap disqualifies, however dissimilar the documents otherwise
    * are. [[bipartitePairs]] is the complementary near-duplicate form.
    * Callers anti-join the result against the training side.
    */
  def exactOverlapIds(left: DataFrame, right: DataFrame, idCol: String,
                      ngrams: Column): DataFrame = {
    // each side is consumed once, so the semi-join's own exchanges suffice —
    // only the parallelism floor is needed here
    val lg = FanOut(left).select(col(idCol), explode(array_distinct(ngrams)).as("__gram"))
    val rg = FanOut(right).select(explode(array_distinct(ngrams)).as("__gram")).distinct()
    lg.join(rg, Seq("__gram"), "left_semi").select(idCol).distinct()
  }
}
