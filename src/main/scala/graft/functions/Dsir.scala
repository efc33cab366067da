package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** DSIR — Data Selection with Importance Resampling (Xie et al. 2023,
  * arXiv:2302.03169 — public paper): score every raw document by how
  * target-like its HASHED n-gram distribution is, then resample toward
  * the target domain. The signature move is hashing features into a
  * fixed bucket table, which bounds the estimator state at any corpus
  * size — the two distributions are `buckets`-row histograms no matter
  * whether the corpus is 60 k or 100 TB.
  *
  * Scale shape: two map-side tokenize+hash passes over the corpus (one
  * feeding the bucket histograms — partial-aggregated to ≤ `buckets`
  * rows before the exchange — one feeding per-document scoring against
  * the broadcast log-ratio table), one slim exchange of ~1 row per
  * document for the score average. No driver-side state: the histogram
  * totals attach in-plan via a one-row broadcast (the same scalar-attach
  * idiom as [[NgramJaccard]]'s auto-cap).
  *
  * Every step is the md5Hash60 family ([[expressions.Md5Family]]), so a
  * SQL engine replays the funnel bit-for-bit: bucket =
  * `md5Hash60(word) % buckets`, Laplace-smoothed log2 ratio, mean over
  * the document's tokens rounded to 4 dp (the [[UnigramLm]] parity
  * device, including the IEEE -0.0 normalization).
  */
object Dsir {

  import org.apache.spark.sql.graft.{ColumnBridge => ExpressionUtils}

  /** Hashed-unigram feature buckets of a text: md5Hash60 of each
    * whitespace-split word n-gram (RE2 `\s`, empties dropped — the fused
    * [[expressions.Md5WordNgramHashesExpr]] kernel), folded into
    * `buckets` buckets. The paper uses unigrams + bigrams; order is the
    * `ngram` knob (the recorded queries run n = 1, the oracles replay any
    * order via the same space-joined md5 family as `dedup_simhash`).
    */
  def tokenBuckets(text: Column, buckets: Int, ngram: Int = 1): Column = {
    require(buckets >= 1, "need at least one bucket")
    require(ngram >= 1, "need a positive n-gram order")
    transform(
      ExpressionUtils.column(expressions.Md5WordNgramHashesExpr(
        ExpressionUtils.expression(text), ngram)),
      h => h % buckets)
  }

  /** Per-document DSIR importance score: the paper's log importance
    * weight — SUM over the document's tokens of log2 p_target(bucket) −
    * log2 p_raw(bucket), both Laplace-smoothed (+1 / +buckets)
    * hashed-unigram histograms — target = rows matching `isTarget`, raw
    * = all of `df`. The sum (not a per-token mean) is what makes the
    * weights dominate the Gumbel noise in [[resample]], exactly as in
    * the paper. Because raw contains the target here, scores are
    * calibrated RELATIVELY: more-target-like documents score higher, but
    * the absolute sign carries no meaning. Documents with no tokens
    * score 0 with n_tokens 0. Output: idCol, `n_tokens`,
    * `dsir_logratio` (rounded to 4 dp).
    */
  def score(df: DataFrame, idCol: String, text: Column, isTarget: Column,
            buckets: Int = 4096, ngram: Int = 1): DataFrame = {
    val toks = df.select(col(idCol).as("__id"), isTarget.as("__t"),
      explode(tokenBuckets(text, buckets, ngram)).as("__b"))
    val hist = toks.groupBy(col("__b")).agg(
      count(lit(1)).cast("double").as("__cr"),
      sum(when(col("__t"), lit(1L)).otherwise(lit(0L))).cast("double").as("__ct"))
    val totals = hist.agg(sum(col("__cr")).as("__nr"), sum(col("__ct")).as("__nt"))
    val bD = lit(buckets.toDouble)
    val lam = hist.join(broadcast(totals))
      .select(col("__b"),
        (log2((col("__ct") + 1.0) / (col("__nt") + bD)) -
         log2((col("__cr") + 1.0) / (col("__nr") + bD))).as("__lam"))
    val scored = toks.join(broadcast(lam), "__b")
      .groupBy(col("__id"))
      .agg(count(lit(1)).as("__n"), sum(col("__lam")).as("__w"))
    df.select(col(idCol))
      .join(scored.withColumnRenamed("__id", idCol), Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("__n"), lit(0L)).as("n_tokens"),
        (round(coalesce(col("__w"), lit(0.0)), 4) + lit(0.0)).as("dsir_logratio"))
  }

  /** The per-bucket log2 ratios as a dense array indexed by bucket id —
    * a BOUNDED driver collect (`buckets` rows, 32 KB at the 4096
    * default). This is the deployment shape DSIR actually uses: estimate
    * the histograms over the historical corpus ONCE, then score any
    * stream statelessly against the frozen table ([[scoreColumn]]).
    * Buckets unseen in the raw corpus get the pure-smoothing ratio.
    */
  def frozenTable(df: DataFrame, text: Column, isTarget: Column,
                  buckets: Int = 4096, ngram: Int = 1): Array[Double] = {
    val toks = df.select(isTarget.as("__t"),
      explode(tokenBuckets(text, buckets, ngram)).as("__b"))
    val hist = toks.groupBy(col("__b")).agg(
      count(lit(1)).cast("double").as("__cr"),
      sum(when(col("__t"), lit(1L)).otherwise(lit(0L))).cast("double").as("__ct"))
    val totals = hist.agg(
      coalesce(sum(col("__cr")), lit(0.0)).as("__nr"),
      coalesce(sum(col("__ct")), lit(0.0)).as("__nt"))
    val bD = lit(buckets.toDouble)
    val rows = hist.join(broadcast(totals))
      .select(col("__b"),
        (log2((col("__ct") + 1.0) / (col("__nt") + bD)) -
         log2((col("__cr") + 1.0) / (col("__nr") + bD))).as("__lam"),
        col("__nr"), col("__nt"))
      .collect()
    // buckets no token hashed into: the pure-smoothing ratio (they can
    // only be hit by FUTURE stream tokens, which the batch funnel never
    // scores, so any rounding difference here has no parity surface)
    val (nr, nt) = rows.headOption
      .map(r => (r.getDouble(2), r.getDouble(3))).getOrElse((0.0, 0.0))
    val empty = math.log((1.0 / (nt + buckets)) / (1.0 / (nr + buckets))) / math.log(2.0)
    val table = Array.fill(buckets)(empty)
    rows.foreach(r => table(r.getLong(0).toInt) = r.getDouble(1))
    table
  }

  /** Stateless per-row DSIR score against a frozen [[frozenTable]]: a fold
    * over the document's hashed buckets through the table shipped as an
    * array literal (O(1) `element_at`) — no explode, no join, no shuffle,
    * no state store, so the identical Column runs unchanged inside a
    * Structured Streaming query. The fold adds in token order, the same
    * order [[score]]'s per-partition partial sum sees, so the two paths
    * agree at the shared 4-dp rounding on the pinned parity fixtures.
    * (Double addition is non-associative, so a partitioning that reorders
    * [[score]]'s partial sums can produce an ulp-different total; if that
    * ulp lands exactly on a 4-dp rounding boundary the last digit may
    * differ — exact equality is a fixture-level guarantee, not an
    * any-partitioning invariant.)
    */
  def scoreColumn(text: Column, table: Array[Double], ngram: Int = 1): Column = {
    val arr = lit(table)
    val folded = aggregate(tokenBuckets(text, table.length, ngram), lit(0.0),
      (acc, b) => acc + element_at(arr, (b + 1).cast("int")))
    round(coalesce(folded, lit(0.0)), 4) + lit(0.0)
  }

  /** Token count on the same hashed-bucket tokenization as [[scoreColumn]]. */
  def tokenCountColumn(text: Column, buckets: Int = 4096, ngram: Int = 1): Column =
    coalesce(size(tokenBuckets(text, buckets, ngram)).cast("long"), lit(0L))

  /** DSIR's selection step: Gumbel-top-k importance resampling — rank by
    * score + Gumbel noise and keep the top `k`, which samples without
    * replacement with probability ∝ exp(score) (the paper's resampling
    * rule). The Gumbel variate is DETERMINISTIC: u = (md5 16-bit bucket
    * of the id + 0.5) / 65536 ∈ (0,1), g = −ln(−ln u) — reproducible
    * across runs, partitionings, and engines, unlike `rand()`. The sort
    * key is rounded to 6 dp with an id tiebreak so cross-engine ulp
    * drift cannot reorder the selection.
    *
    * The top-k itself is a TakeOrdered (per-partition heads, no global
    * sort); only the `k` selected rows pass through the final
    * rank-assigning window, so keep `k` driver-bounded (a selection
    * size, not a corpus fraction — for fraction-scale selection filter
    * on a score threshold instead).
    */
  def resample(df: DataFrame, idCol: String, text: Column, isTarget: Column,
               k: Int, buckets: Int = 4096, ngram: Int = 1): DataFrame = {
    require(k >= 1, "need a positive selection size")
    val s = score(df, idCol, text, isTarget, buckets, ngram)
    val u = (conv(substring(md5(col(idCol).cast("string")), 1, 4), 16, 10)
      .cast("double") + lit(0.5)) / lit(65536.0)
    val keyed = s.withColumn("__key", round(col("dsir_logratio") + -log(-log(u)), 6))
    keyed.orderBy(col("__key").desc, col(idCol).asc).limit(k)
      .withColumn("rank", row_number().over(
        Window.orderBy(col("__key").desc, col(idCol).asc)).cast("long"))
      .select(col(idCol), col("n_tokens"), col("dsir_logratio"), col("rank"))
  }
}
