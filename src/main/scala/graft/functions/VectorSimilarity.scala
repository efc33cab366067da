package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Vector similarity search over an embedding column (`array<float>`).
  *
  * Baseline: brute-force cosine top-k (exact, one broadcast join — right
  * answer for query batches against any corpus size, since the corpus side
  * streams). Scale paths: IVF coarse quantization (search only the nearest
  * partitions) and random-hyperplane LSH (bucket equi-join), both built from
  * the same deterministic hash primitives as the dedup operators.
  *
  * Dot products use `zip_with` + `aggregate` (native higher-order functions)
  * in double precision — no UDF, no driver-side math.
  */
object VectorSimilarity {

  import org.apache.spark.sql.graft.{ColumnBridge => ExpressionUtils}

  /** Dot product of two numeric array columns, in double precision — fused
    * single-pass codegen expression ([[expressions.DotProductExpr]]).
    */
  def dot(a: Column, b: Column): Column =
    ExpressionUtils.column(expressions.DotProductExpr(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  /** L2 norm. */
  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Element-wise mean of an embedding column ([[expressions.VectorMeanAgg]]):
    * mean-pooling / centroid aggregate with ONE dim-length double buffer of
    * state per group, built map-side and merged pairwise — no posexplode
    * row×dimension shuffle. `array<double>`; null for an all-null group.
    */
  def vectorMean(embedding: Column): Column =
    ExpressionUtils.column(
      expressions.VectorMeanAgg(ExpressionUtils.expression(embedding))
        .toAggregateExpression())

  /** Cosine similarity; 0 when either vector has zero norm. Single fused
    * codegen pass ([[expressions.CosineSimilarityExpr]]) — ~10× the
    * interpreted `aggregate(zip_with(...))` route on 64-dim floats.
    */
  def cosine(a: Column, b: Column): Column =
    ExpressionUtils.column(expressions.CosineSimilarityExpr(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  /** Interpreted built-ins-only cosine (reference semantics cross-check). */
  private[graft] def cosineHof(a: Column, b: Column): Column = {
    def dotH(x: Column, y: Column): Column =
      aggregate(zip_with(x, y, (p, q) => p.cast("double") * q.cast("double")),
        lit(0.0), (acc, v) => acc + v)
    val d = dotH(a, b)
    val nn = sqrt(dotH(a, a)) * sqrt(dotH(b, b))
    when(nn === 0, lit(0.0)).otherwise(d / nn)
  }

  /** Exact top-k nearest corpus vectors per query vector, by cosine.
    * The query side is broadcast (query batches are small by construction);
    * the corpus side streams through without a shuffle, then one key exchange
    * ranks per query — at 1000 executors the corpus scan is embarrassingly
    * parallel.
    *
    * Ties broken by corpus id for deterministic output.
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int,
                     idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val c = corpus.select(col(idCol).as("corpus_id"), col(vecCol).as("__cv"))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("__qv"))
    val scored = c.join(broadcast(q), col("corpus_id") =!= col("query_id"))
      .withColumn("cosine", round(cosine(col("__cv"), col("__qv")), 6))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("corpus_id").asc)
    scored.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .select(col("query_id"), col("corpus_id"), col("cosine"), col("__rn").as("rank"))
  }

  // ---------------- scalar (int8) quantization — SQ8 ----------------

  /** Per-dimension (min, max) calibration for scalar quantization: one
    * mergeable aggregation ([[expressions.VectorMinMaxAgg]], two dim-length
    * buffers of state, map-side partials) and 2·dim doubles to the driver —
    * never corpus rows.
    */
  def sq8Ranges(corpus: DataFrame, vecCol: String): (Seq[Double], Seq[Double]) = {
    val row = corpus.agg(ExpressionUtils.column(
      expressions.VectorMinMaxAgg(ExpressionUtils.expression(col(vecCol)))
        .toAggregateExpression()).as("mm")).head()
    val s = row.getStruct(0)
    (s.getSeq[Double](0), s.getSeq[Double](1))
  }

  /** Uniform int8 encode against fixed per-dim ranges: code_d =
    * round((v − mn_d) / (mx_d − mn_d) · 255), 0 for a degenerate dimension.
    * Pure builtin `transform` — map-side, codegen'd; 255-level codes cut a
    * float vector 4×. At rest, store as `array<smallint>` or pack into
    * `binary` — NOT `array<tinyint>`: codes span 0..255 and signed tinyint
    * tops out at 127, so a tinyint cast would corrupt the upper half of
    * the range (offset-encode to [−128,127] first if tinyint is required).
    */
  def sq8Encode(vec: Column, mins: Seq[Double], maxs: Seq[Double]): Column =
    transform(vec, (v, i) => {
      val mn = element_at(typedLit(mins), i + 1)
      val mx = element_at(typedLit(maxs), i + 1)
      when(mx === mn, lit(0L))
        .otherwise(round((v.cast("double") - mn) / (mx - mn) * 255).cast("long"))
    })

  /** Decode int8 codes back to the quantization lattice:
    * v̂_d = mn_d + code_d · (mx_d − mn_d) / 255.
    */
  def sq8Decode(codes: Column, mins: Seq[Double], maxs: Seq[Double]): Column =
    transform(codes, (c, i) => {
      val mn = element_at(typedLit(mins), i + 1)
      val mx = element_at(typedLit(maxs), i + 1)
      mn + c.cast("double") * (mx - mn) / lit(255.0)
    })

  /** Scalar-quantized ANN top-k by inner product (asymmetric: full-precision
    * query against the dequantized corpus — the standard SQ search). Unlike
    * IVF/LSH/PQ, the whole path is DETERMINISTIC arithmetic (calibrate →
    * encode → decode → dot → rank), so it carries a full hash-matching SQL
    * oracle — the quantization loss is exactly reproducible, not just
    * bounded. Corpus side streams map-side (encode+decode fused into the
    * scan projection); one key exchange ranks per query.
    */
  def sq8TopK(corpus: DataFrame, queries: DataFrame, k: Int,
              idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val (mins, maxs) = sq8Ranges(corpus, vecCol)
    val deq = sq8Decode(sq8Encode(col(vecCol), mins, maxs), mins, maxs)
    val c = corpus.select(col(idCol).as("corpus_id"), deq.as("__cv"))
    val q = queries.select(col(idCol).as("query_id"),
      col(vecCol).cast("array<double>").as("__qv"))
    val scored = c.join(broadcast(q), col("corpus_id") =!= col("query_id"))
      .withColumn("score", round(dot(col("__cv"), col("__qv")), 6) + lit(0.0))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("corpus_id"))
    scored.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .select(col("query_id"), col("corpus_id"), col("score"),
        col("__rn").cast("long").as("rnk"))
  }

  /** Exact cosine threshold join: all (a, b) pairs with similarity >=
    * `minCosine`, a.id < b.id. The self-join is a broadcast of ids+vectors
    * against the streaming corpus side when one side is small, else a
    * cartesian handled by Spark's block-nested join — use the LSH variant
    * ([[lshTopK]] buckets) to prefilter at corpus scale; this exact form is
    * the verification kernel and the small-side path.
    */
  def thresholdJoin(df: DataFrame, minCosine: Double,
                    idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val a = df.select(col(idCol).as("id_a"), col(vecCol).as("__va"))
    val b = df.select(col(idCol).as("id_b"), col(vecCol).as("__vb"))
    a.join(b, col("id_a") < col("id_b"))
      .withColumn("cosine", round(cosine(col("__va"), col("__vb")), 6))
      .filter(col("cosine") >= minCosine)
      .select(col("id_a"), col("id_b"), col("cosine"))
  }

  /** LSH-prefiltered cosine threshold self-join — the corpus-scale variant
    * of [[thresholdJoin]]: candidate pairs come from a multi-table
    * hyperplane-bucket equi-join (keys only: id + table + bucket shuffle,
    * vectors join back by id afterwards), then the exact cosine filter
    * verifies. No cartesian/nested-loop node anywhere in the plan.
    *
    * Recall: a pair with cosine >= `minCosine` collides in one table with
    * probability p^nbits where p = 1 - arccos(minCosine)/π, so the miss
    * probability is (1 - p^nbits)^tables — at the defaults (2 bits,
    * 32 tables) a pair at cosine 0.4 is missed with probability ~9e-8, and
    * anything more similar even less often. Fewer bits = more recall but
    * bigger buckets; more tables buys recall at linear candidate cost. The
    * defaults favor exactness at moderate thresholds; raise `nbits` for
    * high-threshold near-dup workloads at corpus scale.
    */
  def thresholdJoinLsh(df: DataFrame, minCosine: Double, dim: Int,
                       nbits: Int = 2, tables: Int = 32,
                       idCol: String = "vec_id", vecCol: String = "embedding",
                       maxBucketSize: Long = 65536L): DataFrame = {
    val base = df.select(col(idCol).as("__id"), col(vecCol).as("__v"))
    val banded0 = base.select(col("__id"),
      posexplode(hyperplaneBuckets(col("__v"), nbits, dim, tables))
        .as(Seq("__table", "__bucket")))
    // Hot-bucket guard (same rationale as MinHashLsh): a bucket of B vectors
    // emits B²/2 candidate rows, so a dense embedding cluster — or
    // under-sized `nbits` (see [[recommendedBits]]) — degrades toward the
    // cartesian this variant exists to avoid. Table redundancy keeps recall:
    // a qualifying pair collides in ~p^nbits · tables independent tables, so
    // excluding one table's hot bucket leaves the others. 0 disables.
    val banded =
      if (maxBucketSize <= 0L) banded0
      else {
        val hot = banded0.groupBy(col("__table"), col("__bucket"))
          .agg(count(lit(1)).as("__bsz"))
          .filter(col("__bsz") > maxBucketSize)
          .select(col("__table"), col("__bucket"))
        banded0.join(hot, Seq("__table", "__bucket"), "left_anti")
      }
    val cand = banded.as("a").join(banded.as("b"),
        col("a.__table") === col("b.__table") &&
        col("a.__bucket") === col("b.__bucket") &&
        col("a.__id") < col("b.__id"))
      .select(col("a.__id").as("id_a"), col("b.__id").as("id_b"))
      .dropDuplicates("id_a", "id_b")
    cand
      .join(base.select(col("__id").as("id_a"), col("__v").as("__va")), "id_a")
      .join(base.select(col("__id").as("id_b"), col("__v").as("__vb")), "id_b")
      .withColumn("cosine", round(cosine(col("__va"), col("__vb")), 6))
      .filter(col("cosine") >= minCosine)
      .select(col("id_a"), col("id_b"), col("cosine"))
  }

  /** Embedding-cosine near-duplicate dedup: drop every vector that has a
    * neighbor with cosine >= `minCosine` and a smaller id (keep-first
    * survivor rule, same contract as [[MinHashLsh.dedupKeepFirst]] on text).
    * Candidates come from [[thresholdJoinLsh]]'s bucket equi-join, so the
    * pipeline is corpus-scale: no cartesian node, shuffles move ids +
    * buckets, and the exact cosine verify touches candidate pairs only.
    */
  def dedupByEmbedding(df: DataFrame, minCosine: Double, dim: Int,
                       nbits: Int = 2, tables: Int = 32,
                       idCol: String = "vec_id", vecCol: String = "embedding",
                       maxBucketSize: Long = 65536L): DataFrame = {
    val dupIds = thresholdJoinLsh(df, minCosine, dim, nbits, tables, idCol,
        vecCol, maxBucketSize)
      .select(col("id_b").as(idCol)).distinct()
    df.join(dupIds, Seq(idCol), "left_anti")
  }

  /** LSH-prefiltered cosine threshold join ACROSS two frames —
    * (id_left, id_right, cosine) for every cross pair at cosine >=
    * `minCosine`. The bipartite analog of [[thresholdJoinLsh]] (same
    * hyperplane tables, same recall arithmetic), and the embedding-space
    * analog of [[MinHashLsh.bipartitePairsHashed]]: candidates come only
    * from cross-side bucket collisions, so neither side is ever paired
    * with itself — a new crawl checked against a frozen reference set does
    * not re-pair the reference set quadratically.
    *
    * The hot-bucket cap excludes a (table, bucket) cell when EITHER side
    * exceeds it — a bucket hot on one side alone already multiplies the
    * join — and table redundancy keeps recall, exactly as in the
    * self-join variant. Shuffles move (id, table, bucket) keys; vectors
    * join back by id for the exact verify only on candidate pairs.
    */
  def bipartiteThresholdLsh(left: DataFrame, right: DataFrame,
                            minCosine: Double, dim: Int,
                            nbits: Int = 2, tables: Int = 32,
                            idCol: String = "vec_id", vecCol: String = "embedding",
                            maxBucketSize: Long = 65536L): DataFrame = {
    def baseOf(df: DataFrame): DataFrame =
      df.select(col(idCol).as("__id"), col(vecCol).as("__v"))
    def bandedOf(df: DataFrame): DataFrame = baseOf(df).select(col("__id"),
      posexplode(hyperplaneBuckets(col("__v"), nbits, dim, tables))
        .as(Seq("__table", "__bucket")))
    val (bl0, br0) = (bandedOf(left), bandedOf(right))
    val (bl, br) =
      if (maxBucketSize <= 0L) (bl0, br0)
      else {
        def hotOf(b: DataFrame): DataFrame = b.groupBy(col("__table"), col("__bucket"))
          .agg(count(lit(1)).as("__bsz"))
          .filter(col("__bsz") > maxBucketSize)
          .select(col("__table"), col("__bucket"))
        val hot = hotOf(bl0).union(hotOf(br0)).distinct()
        (bl0.join(hot, Seq("__table", "__bucket"), "left_anti"),
         br0.join(hot, Seq("__table", "__bucket"), "left_anti"))
      }
    val cand = bl.as("l").join(br.as("r"),
        col("l.__table") === col("r.__table") &&
        col("l.__bucket") === col("r.__bucket"))
      .select(col("l.__id").as("id_left"), col("r.__id").as("id_right"))
      .dropDuplicates("id_left", "id_right")
    cand
      .join(baseOf(left).select(col("__id").as("id_left"), col("__v").as("__vl")), "id_left")
      .join(baseOf(right).select(col("__id").as("id_right"), col("__v").as("__vr")), "id_right")
      .withColumn("cosine", round(cosine(col("__vl"), col("__vr")), 6))
      .filter(col("cosine") >= minCosine)
      .select(col("id_left"), col("id_right"), col("cosine"))
  }

  /** Semantic decontamination: keep only the `corpus` rows with NO
    * embedding-space neighbor in `reference` at cosine >= `minCosine` —
    * the embedding analog of n-gram benchmark decontamination
    * ([[NgramJaccard.bipartitePairs]] composed as an anti-join), catching
    * paraphrased or reformatted test material that shares no 13-gram with
    * its source. Candidates from [[bipartiteThresholdLsh]], so the
    * reference set is never self-paired and no cartesian node appears.
    */
  def decontaminateByEmbedding(corpus: DataFrame, reference: DataFrame,
                               minCosine: Double, dim: Int,
                               nbits: Int = 2, tables: Int = 32,
                               idCol: String = "vec_id", vecCol: String = "embedding",
                               maxBucketSize: Long = 65536L): DataFrame = {
    val contaminated = bipartiteThresholdLsh(corpus, reference, minCosine, dim,
        nbits, tables, idCol, vecCol, maxBucketSize)
      .select(col("id_left").as(idCol)).distinct()
    corpus.join(contaminated, Seq(idCol), "left_anti")
  }

  /** Frozen-reference form of [[decontaminateByEmbedding]] — the STREAMING
    * deployment, same device as [[Dsir.frozenTable]]: a benchmark reference
    * set is driver-small by nature (thousands of documents), so it freezes
    * into one in-plan literal and the neighbor test becomes a stateless
    * per-row `exists` fold — no join, no shuffle, no state store,
    * append-mode-safe under Structured Streaming, and row-identical to the
    * batch anti-join (same rounded-cosine predicate). Use the LSH bipartite
    * path when the reference side is itself corpus-scale.
    *
    * The eager bounded collect (`maxReferenceRows` guard, default 65536 —
    * 16 MB of 64-dim floats) is the same documented trade as the DSIR
    * frozen table and the IVF codebook: bounded driver state in exchange
    * for a fully map-side scale path.
    */
  def decontaminateByEmbeddingFrozen(corpus: DataFrame, reference: DataFrame,
                                     minCosine: Double,
                                     idCol: String = "vec_id",
                                     vecCol: String = "embedding",
                                     maxReferenceRows: Int = 65536): DataFrame = {
    // null reference embeddings are dropped at collection: one null in the
    // literal array would make `exists` three-valued for every corpus row
    // with no true match (no true + some null → null), and filter(!null)
    // would drop the ENTIRE non-contaminated corpus silently
    val refRows = reference.select(col(vecCol).cast("array<float>"))
      .collect().map(r => if (r.isNullAt(0)) null else r.getSeq[Float](0))
      .filter(_ != null)
    require(refRows.length <= maxReferenceRows,
      s"frozen reference has ${refRows.length} rows (max $maxReferenceRows); " +
        "use decontaminateByEmbedding's LSH bipartite path for corpus-scale references")
    val refLit = typedlit(refRows.toSeq)
    corpus.filter(!exists(refLit,
      r => round(cosine(col(vecCol), r), 6) >= lit(minCosine)))
  }

  /** Semantic cluster assignment for [[semDedup]] — SemDeDup (Abbas et al.
    * 2023, arXiv:2303.09540) clusters the embedding space and then
    * deduplicates WITHIN clusters only, turning the quadratic all-pairs
    * problem into k independent cluster-local ones. The paper uses k-means;
    * here the centroids are k SEED DOCUMENTS chosen by smallest
    * `md5(id)` — a deterministic uniform pseudo-random sample (the same
    * device as [[Sampling]]) that any engine reproduces, which is what
    * makes the full funnel oracle-checkable ([[refineCodebook]] remains
    * the quality upgrade when cross-engine replay is not required).
    *
    * Scale shape: the seed side is `LIMIT k` (TakeOrdered — no full sort),
    * broadcast against the streaming corpus; the nearest-seed argmax is a
    * map-side partial `max_by` (the k candidate rows for a vector never
    * leave its partition), so one exchange of ~1 row per vector. Ties on
    * the rounded cosine break toward the smaller seed id. Choose k ≈
    * corpus / target-cluster-size: parallelism downstream is per-cluster.
    */
  def semanticClusters(df: DataFrame, k: Int,
                       idCol: String = "vec_id",
                       vecCol: String = "embedding"): DataFrame = {
    require(k >= 1, "need at least one seed cluster")
    val e = df.select(col(idCol).as("__id"), col(vecCol).as("__v"))
    val seeds = e.orderBy(md5(col("__id").cast("string")), col("__id")).limit(k)
      .select(col("__id").as("__sid"), col("__v").as("__sv"))
    e.join(broadcast(seeds))
      .withColumn("__cosc", round(cosine(col("__v"), col("__sv")), 6))
      .groupBy(col("__id"))
      // min_by over (-cosine, seed id): maximizes the cosine, then breaks
      // ties toward the SMALLEST seed id with the id compared natively —
      // works for any orderable id type (the previous negate(sid) tiebreak
      // silently required numeric ids)
      .agg(min_by(struct(col("__sid"), col("__cosc"), col("__v")),
        struct(negate(col("__cosc")), col("__sid"))).as("__best"))
      .select(col("__id").as(idCol), col("__best.__sid").as("cluster_id"),
        col("__best.__cosc").as("centroid_cosine"), col("__best.__v").as(vecCol))
  }

  /** SemDeDup semantic deduplication: within each [[semanticClusters]]
    * cluster, rank members most-atypical-first (ascending cosine to the
    * centroid, the paper's keep-low-centroid-similarity rule, id tiebreak)
    * and drop every member that has an earlier-ranked cluster-mate within
    * `window` ranks with cosine >= `minCosine`. Returns survivors as
    * (id, cluster_id, centroid_cosine).
    *
    * `window` is the scale bound the paper leaves to "size k with the
    * corpus": with k fixed, an unwindowed in-cluster stage is O((n/k)²)
    * pairs — 100× the corpus means 10,000× the pairs, the exact shape the
    * engine's hot-bucket caps exist to prevent. The centroid-cosine
    * ordering places near-duplicates at adjacent ranks (duplicates have
    * near-identical centroid cosines), so comparing each member only to
    * its `window` nearest-ranked predecessors keeps the dedup signal
    * while capping work at O(n · window) REGARDLESS of cluster skew: the
    * pairing is a block-banded equi-join on (cluster, ⌊rank/window⌋) —
    * each row meets only its own and the previous rank block, never the
    * whole cluster — not a range predicate bolted onto a per-cluster
    * join, whose sort-merge scan would still be quadratic in the skewed
    * cluster. A member more than `window` ranks after a qualifying
    * near-dup is NOT dropped (the documented trade; clusters smaller
    * than `window` — every cluster, when k is sized per the paper —
    * behave exactly as the unwindowed form). Exact cosines verify every
    * candidate pair; what SemDeDup trades away structurally is pairs
    * that straddle a cluster boundary (the paper's own approximation).
    *
    * The default `Int.MaxValue` is the UNWINDOWED paper form — existing
    * results never change silently. The scale bound is opt-in: pass a
    * finite window (256 is the engine's own setting at benchmark scale)
    * wherever cluster sizes can exceed what an O((n/k)²) stage absorbs.
    */
  def semDedup(df: DataFrame, k: Int, minCosine: Double,
               idCol: String = "vec_id",
               vecCol: String = "embedding",
               window: Int = Int.MaxValue): DataFrame = {
    require(window >= 1, "rank window must be positive")
    val ranked = semanticClusters(df, k, idCol, vecCol)
      .withColumn("__rank", row_number().over(
        Window.partitionBy(col("cluster_id"))
          .orderBy(col("centroid_cosine").asc, col(idCol).asc)))
    val dropped = rankWindowPairs(ranked, window, idCol, vecCol)
      .filter(round(cosine(col("__va"), col("__vb")), 6) >= minCosine)
      .select(col("__idb").as(idCol)).distinct()
    ranked.join(dropped, Seq(idCol), "left_anti")
      .select(col(idCol), col("cluster_id"), col("centroid_cosine"))
  }

  /** Candidate (earlier, later) pairs for [[semDedup]]'s verify stage:
    * cluster-mates with `0 < rank_b − rank_a <= window`, produced by the
    * block-banded equi-join described there. Join keys are
    * (cluster, block) with the earlier side exploded into its own and the
    * following block, so a pair at distance <= `window` meets in exactly
    * one block group (no dedup needed) and every join group holds at most
    * 2·`window` rows — the group scan is O(window²) however skewed the
    * cluster, O(n · window) in total.
    */
  private[graft] def rankWindowPairs(ranked: DataFrame, window: Int,
                                     idCol: String, vecCol: String): DataFrame =
    if (window == Int.MaxValue) {
      // unwindowed: every rank lands in block 0, so the banded explode
      // below would only duplicate the left side into a dead block-1
      // copy — join cluster-mates directly
      val a = ranked.select(col("cluster_id").as("__ca"), col("__rank").as("__ra"),
        col(vecCol).as("__va"))
      val b = ranked.select(col("cluster_id").as("__cb"), col("__rank").as("__rb"),
        col(idCol).as("__idb"), col(vecCol).as("__vb"))
      a.join(b, col("__ca") === col("__cb") && col("__ra") < col("__rb"))
        .select(col("__ra"), col("__rb"), col("__idb"), col("__va"), col("__vb"))
    } else {
      val blk = floor((col("__rank") - 1) / window).cast("long")
      val a = ranked.select(col("cluster_id").as("__ca"), col("__rank").as("__ra"),
        col(vecCol).as("__va"), explode(array(blk, blk + 1)).as("__ba"))
      val b = ranked.select(col("cluster_id").as("__cb"), col("__rank").as("__rb"),
        col(idCol).as("__idb"), col(vecCol).as("__vb"), blk.as("__bb"))
      a.join(b, col("__ca") === col("__cb") && col("__ba") === col("__bb") &&
          col("__ra") < col("__rb") && col("__rb") - col("__ra") <= window)
        .select(col("__ra"), col("__rb"), col("__idb"), col("__va"), col("__vb"))
    }

  /** Hyperplane-bucket width that keeps EXPECTED bucket occupancy near
    * `targetBucketSize` for a corpus of `corpusRows`: random hyperplanes
    * split roughly evenly, so occupancy ≈ rows / 2^nbits. Candidate volume
    * per table is then ~rows · targetBucketSize / 2 instead of quadratic.
    * Size `tables` for recall afterwards (collision probability per table is
    * p^nbits, p = 1 - arccos(minCosine)/π — more bits need more tables).
    * The `maxBucketSize` cap on [[thresholdJoinLsh]] handles residual skew
    * (dense clusters) that expected-case sizing cannot.
    */
  def recommendedBits(corpusRows: Long, targetBucketSize: Long = 4096L): Int = {
    require(corpusRows > 0 && targetBucketSize > 0)
    math.max(1, math.ceil(
      math.log(corpusRows.toDouble / targetBucketSize) / math.log(2.0)).toInt)
  }

  /** Random-hyperplane LSH bucket id: `nbits` sign bits of dot products with
    * deterministic pseudo-random hyperplanes. Component j of plane p is
    * derived from xxhash64(p, j), scaled to [-1, 1] — fully reproducible
    * across runs and executors with zero driver state.
    */
  def hyperplaneBucket(vec: Column, nbits: Int, dim: Int): Column =
    (0 until nbits).map { p =>
      val proj = aggregate(
        zip_with(vec, sequence(lit(0), lit(dim - 1)), (x, j) =>
          x.cast("double") *
            (xxhash64(lit(p), j).cast("double") / lit(Long.MaxValue.toDouble))),
        lit(0.0), (acc, v) => acc + v)
      when(proj > 0, shiftleft(lit(1L), p)).otherwise(lit(0L))
    }.reduce((a, b) => a.bitwiseOR(b))

  /** Bucket ids for `tables` independent hash tables — fused expression
    * ([[expressions.HyperplaneBucketsExpr]]): one pass over the vector for
    * all tables × planes, plane components precomputed per executor.
    */
  def hyperplaneBuckets(vec: Column, nbits: Int, dim: Int, tables: Int): Column =
    ExpressionUtils.column(expressions.HyperplaneBucketsExpr(
      ExpressionUtils.expression(vec), nbits, dim, tables))

  /** Approximate top-k: candidates are the union of the queries' buckets
    * across `tables` independent hash tables, then exact cosine rank. One
    * equi-join shuffle on (table, bucket). Recall rises with `tables`
    * (union of independent chances) and falls with `nbits` (finer buckets):
    * measured on 64-dim unclustered embeddings, 1 table × 4 bits ≈ 0.14
    * recall@5 vs 8 tables × 4 bits ≈ 0.8 — multi-table is not optional.
    *
    * `probeHamming` is the MULTIPROBE knob (Lv et al. 2007): each query
    * additionally probes every bucket within that Hamming distance of its
    * own code, per table — a near-miss on h hyperplane signs still meets
    * its neighbor. QUERY-side rows multiply by Σ C(nbits, i), i ≤ h (the
    * query batch is the small side by construction); the corpus index is
    * untouched, which is the whole point — recall rises without
    * re-indexing or extra tables. At `probeHamming = nbits` every bucket
    * of every table is probed, so the funnel DEGENERATES TO EXACT top-k by
    * construction — the oracle-twin setting that hash-checks this
    * operator's full join/dedup/rank plumbing.
    */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int, nbits: Int, dim: Int,
              idCol: String = "vec_id", vecCol: String = "embedding",
              tables: Int = 8, probeHamming: Int = 0): DataFrame = {
    require(probeHamming >= 0 && probeHamming <= nbits,
      "probeHamming is a Hamming radius over the nbits-bit bucket code")
    def banded(df: DataFrame, id: String, vec: String): DataFrame =
      df.select(col(idCol).as(id), col(vecCol).as(vec))
        .select(col(id), col(vec),
          posexplode(hyperplaneBuckets(col(vec), nbits, dim, tables))
            .as(Seq("__table", "__bucket")))
    val c = banded(corpus, "corpus_id", "__cv")
    val q0 = banded(queries, "query_id", "__qv")
    // Hamming ball as XOR masks over the query's own code — a driver-side
    // literal of Σ C(nbits, i) longs, never a corpus-side expansion
    val q =
      if (probeHamming == 0) q0
      else {
        // enumerate the Hamming ball by CHOOSING bit positions — Σ C(nbits, i)
        // masks generated directly, never a 2^nbits scan (nbits up to 63 stays
        // driver-cheap as long as the ball itself is small); the ball size is
        // the query-side multiplier, so an oversized one is refused instead of
        // silently exploding the probe join
        val masks: Seq[Long] = (0 to probeHamming).flatMap {
          case 0 => Seq(0L)
          case i => (0 until nbits).combinations(i)
            .map(_.foldLeft(0L)((m, b) => m | (1L << b))).toSeq
        }
        require(masks.size <= (1 << 20),
          s"multiprobe ball of ${masks.size} buckets per table is not a probe, it's a scan")
        q0.select(col("query_id"), col("__qv"), col("__table"),
          explode(transform(typedLit(masks),
            m => col("__bucket").bitwiseXOR(m))).as("__bucket"))
      }
    val cand = c.join(q, Seq("__table", "__bucket"))
      .filter(col("corpus_id") =!= col("query_id"))
      .select(col("query_id"), col("corpus_id"), col("__cv"), col("__qv"))
      .dropDuplicates("query_id", "corpus_id")
    val scored = cand
      .withColumn("cosine", round(cosine(col("__cv"), col("__qv")), 6))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("corpus_id").asc)
    scored.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .select(col("query_id"), col("corpus_id"), col("cosine"), col("__rn").as("rank"))
  }

  /** Deterministic fixed-size coarse codebook: up to `maxCentroids` corpus
    * vectors selected by smallest `xxhash64(id)` — a uniform pseudo-random
    * sample whose SIZE is independent of corpus cardinality (the previous
    * every-`stride`-th-vector codebook grew linearly with the corpus, so at
    * 100× scale the "broadcast" side was gigabytes). TakeOrdered keeps the
    * selection at O(maxCentroids) memory per partition; the collected
    * codebook is ~1 MB at the 4096 × 64-dim default. Returned in id order
    * for a reproducible centroid indexing.
    */
  /** Public coarse-codebook trainer: the sampled + Lloyd-refined codebook
    * [[ivfTopK]] builds internally, for callers that need the codebook
    * itself (IVF-PQ routing, cell diagnostics). Deterministic; ≤
    * `maxCentroids` centroids at any corpus size.
    */
  def trainCoarseCodebook(corpus: DataFrame, maxCentroids: Int,
                          idCol: String = "vec_id", vecCol: String = "embedding",
                          refineIters: Int = 3,
                          refineSampleRows: Int = 32768): Array[Array[Float]] =
    refineCodebook(corpus, sampleCodebook(corpus, maxCentroids, idCol, vecCol),
      refineIters, refineSampleRows, idCol, vecCol)

  private[functions] def sampleCodebook(corpus: DataFrame, maxCentroids: Int,
                                        idCol: String, vecCol: String): Array[Array[Float]] = {
    val rows = corpus
      .select(col(idCol).as("__id"), col(vecCol).cast("array<float>").as("__v"))
      .orderBy(xxhash64(col("__id")), col("__id"))
      .limit(maxCentroids)      // TakeOrdered: per-partition top-k, no full sort shuffle
      .collect()
    // id order for reproducible centroid indexing — 64 rows, driver-side.
    // Numeric ids keep the established numeric order (the codebooks every
    // existing recall floor was pinned against); any other id type sorts
    // by its string form instead of ClassCastException-ing the trainer
    val sorted = rows.headOption.map(_.get(0)) match {
      case Some(_: java.lang.Long) => rows.sortBy(_.getLong(0))
      case Some(_: java.lang.Integer) => rows.sortBy(_.getInt(0).toLong)
      case _ => rows.sortBy(r => String.valueOf(r.get(0)))
    }
    sorted.map(_.getSeq[Float](1).toArray)
  }

  /** Lloyd (spherical k-means) refinement of a sampled codebook: a few
    * assignment/recentering rounds over a BOUNDED deterministic sample,
    * driver-side. Raw sampled centroids inherit the corpus density —
    * crowded regions get redundant cells while sparse regions share one,
    * which is exactly what hurts recall at a fixed nprobe; a handful of
    * Lloyd rounds spreads the cells toward the k-means optimum and
    * balances cell populations.
    *
    * Deterministic by construction: the sample is the hash-ordered prefix
    * (same device as [[sampleCodebook]]), assignment is parallel but
    * output-indexed, accumulation runs in sample order, and empty cells
    * keep their previous centroid. Cost is
    * O(iters × sample × centroids × dim) spread across driver cores —
    * bounded by the parameters, independent of corpus size; the 100 TB
    * corpus contributes only the sample scan.
    */
  private[functions] def refineCodebook(corpus: DataFrame,
                                        codebook: Array[Array[Float]],
                                        iters: Int, sampleRows: Int,
                                        idCol: String, vecCol: String): Array[Array[Float]] = {
    if (iters <= 0 || codebook.isEmpty) return codebook
    def unit(v: Array[Float]): Array[Float] = {
      var s = 0.0; var i = 0
      while (i < v.length) { s += v(i).toDouble * v(i); i += 1 }
      val n = math.sqrt(s)
      if (n == 0.0) v else v.map(x => (x / n).toFloat)
    }
    val data = corpus
      .select(col(idCol).as("__id"), col(vecCol).cast("array<float>").as("__v"))
      .orderBy(xxhash64(col("__id")), col("__id"))
      .limit(sampleRows)
      .collect().map(r => unit(r.getSeq[Float](1).toArray))
    if (data.isEmpty) return codebook
    val dim = codebook(0).length
    var cents = codebook.map(unit)
    var it = 0
    while (it < iters) {
      val assign = new Array[Int](data.length)
      java.util.stream.IntStream.range(0, data.length).parallel().forEach { i =>
        val v = data(i)
        var best = 0; var bestDot = Double.NegativeInfinity
        var c = 0
        while (c < cents.length) {
          val cent = cents(c)
          var dot = 0.0; var j = 0
          val d = math.min(dim, v.length)
          while (j < d) { dot += v(j).toDouble * cent(j); j += 1 }
          if (dot > bestDot) { bestDot = dot; best = c }
          c += 1
        }
        assign(i) = best
      }
      val sums = Array.ofDim[Double](cents.length, dim)
      val counts = new Array[Int](cents.length)
      var i = 0
      while (i < data.length) {
        val c = assign(i); val v = data(i)
        counts(c) += 1
        var j = 0
        val d = math.min(dim, v.length)
        while (j < d) { sums(c)(j) += v(j); j += 1 }
        i += 1
      }
      cents = cents.zipWithIndex.map { case (old, c) =>
        if (counts(c) == 0) old
        else unit(sums(c).map(_.toFloat))
      }
      it += 1
    }
    cents
  }

  /** IVF-style coarse search: a fixed-size sampled codebook (≤ `maxCentroids`
    * centroids regardless of corpus size), Lloyd-refined over a bounded
    * sample ([[refineCodebook]], `refineIters = 0` restores raw sampling);
    * vectors are assigned to their
    * nearest centroid MAP-SIDE via [[expressions.NearestCentroidsExpr]] (the
    * codebook ships inside the expression — no crossJoin blow-up, no per-id
    * window shuffle); queries probe the `nprobe` nearest cells only. One
    * equi-join shuffle on the cell id, then an exact cosine rank. Corpus-side
    * work per query drops by ~|cells|/nprobe versus brute force.
    *
    * Recall knobs, in order of effectiveness (measured on the near-uniform
    * synthetic embeddings at sf0.1, 64 cells: recall@5 0.16 at nprobe=1,
    * 0.56 at 8, 0.78 at 16, 0.94 at 32): widen `nprobe` first — probe rows
    * are per-QUERY, so the candidate count grows without touching the
    * index. `assign` > 1 additionally writes each corpus vector into its
    * top-`assign` cells (the spill trick for clustered corpora whose true
    * neighbors straddle a cell boundary); it multiplies index rows, and at
    * equal candidate budget measured BELOW wide probing here (assign=2 ×
    * nprobe=16 → 0.82 vs assign=1 × nprobe=32 → 0.94) — worth it only
    * when the query side, not the corpus side, is the bottleneck.
    */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, k: Int, nprobe: Int,
              maxCentroids: Int = 4096,
              idCol: String = "vec_id", vecCol: String = "embedding",
              refineIters: Int = 3, refineSampleRows: Int = 32768,
              assign: Int = 1): DataFrame = {
    require(maxCentroids >= 1 && maxCentroids <= 65536,
      "codebook must be small enough to ship to executors")
    require(assign >= 1, "corpus vectors need at least one cell")
    val codebook = refineCodebook(corpus,
      sampleCodebook(corpus, maxCentroids, idCol, vecCol),
      refineIters, refineSampleRows, idCol, vecCol)
    def cells(vec: Column, n: Int): Column =
      ExpressionUtils.column(expressions.NearestCentroidsExpr(
        ExpressionUtils.expression(vec), codebook, n))
    val corpusBase = corpus.select(col(idCol).as("corpus_id"), col(vecCol).as("__cv"))
    val assigned =
      if (assign <= 1) corpusBase.withColumn("cell", element_at(cells(col("__cv"), 1), 1))
      else corpusBase.withColumn("cell", explode(cells(col("__cv"), assign)))
    val probes = queries.select(col(idCol).as("query_id"), col(vecCol).as("__qv"))
      .withColumn("cell", explode(cells(col("__qv"), nprobe)))
    val met = assigned.join(probes, Seq("cell"))
      .filter(col("corpus_id") =!= col("query_id"))
    // multi-assigned pairs can meet in up to min(assign, nprobe) cells —
    // dedup before ranking so a pair scores once (single-assign pairs meet
    // at most once, so the extra shuffle is skipped there)
    val candidates =
      if (assign > 1 && nprobe > 1) met.dropDuplicates("query_id", "corpus_id") else met
    val scored = candidates
      .withColumn("cosine", round(cosine(col("__cv"), col("__qv")), 6))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("corpus_id").asc)
    scored.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .select(col("query_id"), col("corpus_id"), col("cosine"), col("__rn").as("rank"))
  }
}
