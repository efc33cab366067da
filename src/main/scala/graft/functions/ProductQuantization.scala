package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.{ColumnBridge => ExpressionUtils}

import graft.functions.expressions.{PqAdcScoresExpr, PqEncodeExpr}

/** Product quantization (Jégou et al. 2011, IEEE TPAMI — "Product
  * quantization for nearest neighbor search") — the MEMORY-scale ANN path:
  * a 64-float embedding (256 B) compresses to m = 8 one-byte sub-centroid
  * codes, a 32× reduction, so the candidate scan that IVF/LSH bound in
  * TIME is also bounded in FOOTPRINT (100 TB of raw vectors → ~3 TB of
  * codes; a 1000-executor cluster holds the whole coded corpus in memory).
  * Scoring is asymmetric (ADC): the query stays exact, each code costs m
  * table lookups instead of dim multiplies.
  *
  * Everything is deterministic by construction, same devices as the IVF
  * codebook: hash-ordered bounded sample, sequential accumulation,
  * ties → lowest index, empty cells keep their centroid. Training is
  * driver-side over ≤ `sampleRows` vectors (the 100 TB corpus contributes
  * one bounded sample scan); codebooks ride INSIDE the expressions
  * (~64 KB), no broadcast plumbing.
  *
  * Approximate BY CONTRACT (like IVF/LSH top-k): recall floors live in
  * `AnnRecallSpec`; the exact re-rank in [[topK]] restores exact ordering
  * within the ADC shortlist.
  */
object ProductQuantization {

  /** m per-subspace codebooks, flattened (mi · k · subDim + code · subDim + j). */
  final case class PqModel(m: Int, k: Int, subDim: Int, flat: Array[Float]) {
    def dim: Int = m * subDim
  }

  private def unit(v: Array[Float]): Array[Float] = {
    var s = 0.0; var i = 0
    while (i < v.length) { s += v(i).toDouble * v(i); i += 1 }
    val n = math.sqrt(s)
    if (n == 0.0) v else v.map(x => (x / n).toFloat)
  }

  /** Train per-subspace Lloyd k-means (plain L2 on sub-vectors of the
    * UNIT-normalized sample — dot ≈ cosine downstream). Deterministic:
    * init = first k sample sub-vectors in hash order, sequential
    * accumulation, empty cells keep their centroid.
    */
  def train(df: DataFrame, idCol: String, vecCol: String, dim: Int,
            m: Int = 8, k: Int = 256, sampleRows: Int = 4096,
            iters: Int = 8): PqModel = {
    require(dim % m == 0, s"dim=$dim must split evenly into m=$m subspaces")
    val subDim = dim / m
    val sample = df
      .select(col(idCol).as("__id"), col(vecCol).cast("array<float>").as("__v"))
      .orderBy(xxhash64(col("__id")), col("__id"))
      .limit(sampleRows)
      .collect().map(r => unit(r.getSeq[Float](1).toArray.padTo(dim, 0.0f)))
    require(sample.nonEmpty, "PQ training needs a non-empty corpus")
    val flat = new Array[Float](m * k * subDim)
    var mi = 0
    while (mi < m) {
      val off = mi * subDim
      val sub = sample.map(v => java.util.Arrays.copyOfRange(v, off, off + subDim))
      // init: first k sub-vectors (cycled if the sample is smaller)
      var cents = Array.tabulate(k)(c => sub(c % sub.length).clone())
      var it = 0
      while (it < iters) {
        val sums = Array.ofDim[Double](k, subDim)
        val counts = new Array[Int](k)
        var i = 0
        while (i < sub.length) {
          val v = sub(i)
          var best = 0; var bestD = Double.MaxValue
          var c = 0
          while (c < k) {
            var d = 0.0; var j = 0
            while (j < subDim) { val t = v(j) - cents(c)(j); d += t.toDouble * t; j += 1 }
            if (d < bestD) { bestD = d; best = c }
            c += 1
          }
          counts(best) += 1
          var j = 0
          while (j < subDim) { sums(best)(j) += v(j); j += 1 }
          i += 1
        }
        cents = cents.zipWithIndex.map { case (old, c) =>
          if (counts(c) == 0) old
          else { val out = new Array[Float](subDim); var j = 0
            while (j < subDim) { out(j) = (sums(c)(j) / counts(c)).toFloat; j += 1 }; out }
        }
        it += 1
      }
      var c = 0
      while (c < k) {
        System.arraycopy(cents(c), 0, flat, (mi * k + c) * subDim, subDim)
        c += 1
      }
      mi += 1
    }
    PqModel(m, k, subDim, flat)
  }

  /** Map-side PQ encoding of a unit-normalized vector column → m bytes. */
  def encode(model: PqModel, vec: Column): Column =
    ExpressionUtils.column(PqEncodeExpr(ExpressionUtils.expression(vec),
      model.flat, model.m, model.k, model.subDim))

  /** ADC scores of a code column against a query batch: per-query distance
    * tables precomputed here ONCE (q·m·k floats in-plan), scoring is q·m
    * lookups per row. Returns array<double> aligned with `queries`.
    */
  def adcScores(model: PqModel, queries: Array[Array[Float]], codes: Column): Column = {
    val q = queries.length
    require(q > 0, "need at least one query")
    val tables = new Array[Float](q * model.m * model.k)
    var qi = 0
    while (qi < q) {
      val qv = unit(queries(qi).padTo(model.dim, 0.0f))
      var mi = 0
      while (mi < model.m) {
        var c = 0
        while (c < model.k) {
          var s = 0.0
          var j = 0
          while (j < model.subDim) {
            s += qv(mi * model.subDim + j).toDouble *
              model.flat((mi * model.k + c) * model.subDim + j)
            j += 1
          }
          tables((qi * model.m + mi) * model.k + c) = s.toFloat
          c += 1
        }
        mi += 1
      }
      qi += 1
    }
    ExpressionUtils.column(PqAdcScoresExpr(ExpressionUtils.expression(codes),
      tables, q, model.m, model.k))
  }

  /** IVF-PQ: the production ANN combination — the IVF coarse codebook
    * routes each query to `nprobe` cells (bounding the SCAN), the PQ codes
    * score the met candidates via ADC (bounding the FOOTPRINT: cells hold
    * 8-byte codes, not vectors), then the exact cosine re-rank runs only
    * on the per-query shortlist. Against plain [[topK]] the full-corpus
    * ADC pass becomes a cells-only pass; against `ivfTopK` the per-
    * candidate cost drops from dim multiplies to m lookups and the state
    * that must live near the scan shrinks 32×.
    */
  def ivfPqTopK(corpus: DataFrame, queries: Array[(Long, Array[Float])],
                k: Int, model: PqModel, coarseCodebook: Array[Array[Float]],
                nprobe: Int, idCol: String, vecCol: String,
                shortlist: Int = 64): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.graft.{ColumnBridge => EU}
    require(queries.nonEmpty, "need at least one query")
    def cells(vec: Column, n: Int): Column =
      EU.column(graft.functions.expressions.NearestCentroidsExpr(
        EU.expression(vec), coarseCodebook, n))
    val coded = corpus.select(col(idCol).as("corpus_id"),
      col(vecCol).cast("array<float>").as("__v"))
      .withColumn("cell", element_at(cells(col("__v"), 1), 1))
      .withColumn("__codes", encode(model, col("__v")))
    // queries are driver-side: route them to cells driver-side too (the
    // coarse codebook is already here), ship (qi, cell) as a literal frame
    val probeRows = queries.zipWithIndex.flatMap { case ((_, v), qi) =>
      nearestCells(coarseCodebook, unit(v.padTo(model.dim, 0.0f)), nprobe)
        .map(c => (qi, c))
    }.toSeq
    val spark = corpus.sparkSession
    import spark.implicits._
    val probes = probeRows.toDF("__qi", "cell")
    val met = coded.join(broadcast(probes), Seq("cell"))
    val scored = met
      .withColumn("__adcAll", adcScores(model, queries.map(_._2), col("__codes")))
      .withColumn("__s", element_at(col("__adcAll"), col("__qi") + 1))
    val w = Window.partitionBy(col("__qi")).orderBy(col("__s").desc, col("corpus_id"))
    val short = scored.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= shortlist)
    // RAW query vectors in the exact re-rank (cosine is normalization-
    // invariant): the arithmetic is then bit-identical to bruteForceTopK's,
    // so an exhaustive-probe configuration hash-matches the exact oracle
    val qDf = queries.zipWithIndex.map { case ((qid, v), i) =>
      (i, qid, v.padTo(model.dim, 0.0f)) }.toSeq
    val qCol = map(qDf.flatMap { case (i, _, v) => Seq(lit(i), typedLit(v.toSeq)) }: _*)
    val qIds = map(qDf.flatMap { case (i, qid, _) => Seq(lit(i), lit(qid)) }: _*)
    val exact = short
      .withColumn("__qv", element_at(qCol, col("__qi")))
      .withColumn("query_id", element_at(qIds, col("__qi")))
      .filter(col("corpus_id") =!= col("query_id"))
      .withColumn("cosine", round(VectorSimilarity.cosine(col("__qv"), col("__v")), 6))
    val w2 = Window.partitionBy(col("query_id")).orderBy(col("cosine").desc, col("corpus_id"))
    exact.withColumn("rank", row_number().over(w2))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank").cast("long").as("rank"),
        col("corpus_id"), col("cosine"))
  }

  /** Driver-side mirror of the NearestCentroids routing (dot-product order,
    * ties → lower index) for the already-collected query batch.
    */
  private def nearestCells(codebook: Array[Array[Float]], q: Array[Float],
                           n: Int): Seq[Int] = {
    // COSINE, exactly like NearestCentroidsExpr assigns the corpus: raw
    // dot ranks long centroids first, so with a non-unit-norm codebook
    // (the raw-sampling refineIters=0 path returns raw corpus vectors)
    // queries would probe cells their true neighbors were never assigned
    // to and recall would collapse silently
    var qn = 0.0
    var k = 0
    while (k < q.length) { qn += q(k).toDouble * q(k); k += 1 }
    qn = math.sqrt(qn)
    codebook.zipWithIndex.map { case (c, i) =>
      var s = 0.0; var cn = 0.0; var j = 0
      val d = math.min(c.length, q.length)
      while (j < d) { s += q(j).toDouble * c(j); j += 1 }
      var m = 0
      while (m < c.length) { cn += c(m).toDouble * c(m); m += 1 }
      val denom = qn * math.sqrt(cn)
      val sim = if (denom == 0.0) 0.0 else s / denom
      (-sim, i)
    }.sorted.take(n).map(_._2).toSeq
  }

  /** PQ top-k: encode the corpus once (map-side), ADC-score every code
    * against the query batch, take an ADC shortlist of `shortlist` per
    * query, then EXACT-re-rank the shortlist by true cosine (one small
    * join back to the corpus vectors — |q|·shortlist rows). Approximate
    * only in what the shortlist misses; ordering within it is exact.
    */
  def topK(corpus: DataFrame, queries: Array[(Long, Array[Float])], k: Int,
           model: PqModel, idCol: String, vecCol: String,
           shortlist: Int = 64): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val coded = corpus.select(col(idCol).as("corpus_id"),
      col(vecCol).cast("array<float>").as("__v"))
      .withColumn("__codes", encode(model, col("__v")))
    val scored = coded
      .withColumn("__adc", adcScores(model, queries.map(_._2), col("__codes")))
      .select(col("corpus_id"), col("__v"), posexplode(col("__adc")).as(Seq("__qi", "__s")))
    val w = Window.partitionBy(col("__qi")).orderBy(col("__s").desc, col("corpus_id"))
    val short = scored.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= shortlist)
    // raw query vectors, same reason as in ivfPqTopK: exact-oracle parity
    val qDf = queries.zipWithIndex.map { case ((qid, v), i) => (i, qid, v.padTo(model.dim, 0.0f)) }
      .toSeq
    val qCol = map(qDf.flatMap { case (i, _, v) =>
      Seq(lit(i), typedLit(v.toSeq))
    }: _*)
    val qIds = map(qDf.flatMap { case (i, qid, _) => Seq(lit(i), lit(qid)) }: _*)
    val exact = short
      .withColumn("__qv", element_at(qCol, col("__qi")))
      .withColumn("query_id", element_at(qIds, col("__qi")))
      // self-matches are excluded, matching bruteForceTopK's contract (the
      // shortlist keeps one spare slot for the self hit it may contain)
      .filter(col("corpus_id") =!= col("query_id"))
      .withColumn("cosine", round(VectorSimilarity.cosine(col("__qv"), col("__v")), 6))
    val w2 = Window.partitionBy(col("query_id")).orderBy(col("cosine").desc, col("corpus_id"))
    exact.withColumn("rank", row_number().over(w2))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank").cast("long").as("rank"),
        col("corpus_id"), col("cosine"))
  }
}
