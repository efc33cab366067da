package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Mean per-token log2 probability under the corpus's OWN unigram
  * distribution — the poor man's LM-perplexity quality signal (CCNet
  * filters on LM perplexity, Wenzek et al. 2020 — public paper; the
  * unigram proxy needs no trained model). Documents full of rare/garbled
  * tokens score far below prose in the same corpus, which is exactly the
  * band a quality gate cuts on.
  *
  * Two passes, both bounded at any corpus size:
  *   1. token histogram, kept to the top `vocabSize` tokens by
  *      (count desc, token) — a deterministic cutoff, broadcast as at most
  *      `vocabSize` rows; everything rarer scores the OOV floor
  *      p = 0.5 / N (N = total corpus tokens);
  *   2. map-side broadcast join + per-document mean.
  *
  * The token definition matches `text_token_histogram` (lower, trim, split
  * on the pinned whitespace class `[ \t\n\f\r]+` — RE2 \s, no \x0B — the
  * same class the md5-family kernels pin), so the histogram pass is the
  * same shuffle that query already pins and DuckDB's regexp_split_to_array
  * replays both passes exactly, \x0B-bearing text included.
  */
object UnigramLm {

  /** (idCol, n_tokens, logprob) per document; documents with no tokens get
    * logprob 0.0 and n_tokens 0. `logprob` is the mean log2 token
    * probability (always negative for non-empty documents).
    */
  def score(docs: DataFrame, idCol: String, text: Column,
            vocabSize: Int = 65536): DataFrame = {
    val toks = docs
      .select(col(idCol), explode(split(trim(lower(text)), "[ \\t\\n\\f\\r]+")).as("__tok"))
      .filter(col("__tok") =!= "")
    val total = toks.agg(count(lit(1)).as("__n"))
    val vocab = toks.groupBy(col("__tok")).agg(count(lit(1)).as("__cnt"))
      .orderBy(col("__cnt").desc, col("__tok")).limit(vocabSize)
    val scored = toks
      .join(broadcast(vocab), Seq("__tok"), "left")
      .crossJoin(broadcast(total))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"),
        avg(log(2.0, coalesce(col("__cnt"), lit(0.5)) / col("__n"))).as("__lp"))
    docs.select(col(idCol))
      .join(scored, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_tokens"), lit(0L)).cast("long").as("n_tokens"),
        // + 0.0 normalizes IEEE -0.0 (a tiny negative mean rounding to
        // zero) to +0.0, mirroring the oracle's `+ 0.0` and
        // CharEntropyExpr.compute — without it the two engines' parquet
        // hashes diverge on the -0.0 class
        (round(coalesce(col("__lp"), lit(0.0)), 4) + lit(0.0)).as("logprob"))
  }

  /** Mean log2 probability under an INTERPOLATED BIGRAM model of the
    * corpus — one step closer to CCNet's KenLM than the unigram proxy,
    * and sensitive to word ORDER (a bag-of-words shuffle keeps its
    * unigram score but collapses here). Per bigram position i >= 2:
    *
    *   p(w_i | w_{i-1}) = λ · cnt(w_{i-1} w_i)/cnt(w_{i-1}) +
    *                      (1−λ) · p_uni(w_i)
    *
    * with the bigram term 0 when the pair is outside the top-`vocabSize`
    * bigram table (or its left word outside the unigram vocab), and
    * `p_uni` carrying the same OOV floor as [[score]]. Both tables are
    * deterministic-cutoff top-k (count desc, key asc) — bounded
    * broadcasts at any corpus size; the bigram pairs come from an
    * array-level zip of each document with its own shift, so no window
    * shuffle. λ defaults to 0.75 (binary-exact, so a SQL oracle's
    * literal multiplies identically). Documents with fewer than two
    * tokens score 0 with n_bigrams 0.
    */
  def scoreBigram(docs: DataFrame, idCol: String, text: Column,
                  vocabSize: Int = 65536,
                  materialize: Boolean = true): DataFrame = {
    // The token stream feeds FOUR plan branches (total, unigram vocab,
    // bigram table, scoring) — materialize ONE already-exploded
    // (id, tok, next-tok) frame so tokenize AND explode run once; every
    // branch then reads flat rows. (An (id, tokens-array) checkpoint still
    // made the unigram branches and the bigram branches each re-explode.)
    // `materialize = false` skips the eager localCheckpoint for callers
    // that manage persistence themselves — localCheckpoint blocks live
    // only in executor storage, which is the wrong durability with
    // dynamic allocation at cluster scale.
    val arr = filter(split(trim(lower(text)), "[ \\t\\n\\f\\r]+"), w => w =!= "")
    val frame0 = docs.select(col(idCol),
        explode(zip_with(
          arr,
          // arr shifted left by one, null-padded: token i pairs with its
          // successor; the last token pairs with null (unigram-only row)
          concat(slice(arr, lit(2), greatest(size(arr) - 1, lit(0))),
            array(lit(null).cast("string"))),
          (a, b) => struct(a.as("t"), b.as("n")))).as("__p"))
      .select(col(idCol), col("__p.t").as("__tok"), col("__p.n").as("__next"))
    // zip_with pads to the LONGER side: an empty token array zips against
    // [null] into one (null, null) row — KEEP it: it is the only trace of a
    // zero-token document, and the id universe below must come from the
    // materialized frame (one snapshot, no source rescan), not from a
    // second action over `docs` whose upstream plan could be expensive or,
    // for non-deterministic sources, return a different id set.
    val frame = if (materialize) frame0.localCheckpoint() else frame0
    // count(col) skips the null-token marker rows
    val total = frame.agg(count(col("__tok")).as("__n"))
    val vocab = frame.filter(col("__tok").isNotNull)
      .groupBy(col("__tok")).agg(count(lit(1)).as("__cnt"))
      .orderBy(col("__cnt").desc, col("__tok")).limit(vocabSize)
    val bi = frame.filter(col("__next").isNotNull)
      .select(col(idCol), col("__tok").as("__w1"), col("__next").as("__w2"))
    val btab = bi.groupBy(col("__w1"), col("__w2")).agg(count(lit(1)).as("__bcnt"))
      .orderBy(col("__bcnt").desc, col("__w1"), col("__w2")).limit(vocabSize)
    val scored = bi
      .join(broadcast(btab), Seq("__w1", "__w2"), "left")
      .join(broadcast(vocab.select(col("__tok").as("__w1"), col("__cnt").as("__c1"))),
        Seq("__w1"), "left")
      .join(broadcast(vocab.select(col("__tok").as("__w2"), col("__cnt").as("__c2"))),
        Seq("__w2"), "left")
      .crossJoin(broadcast(total))
      .withColumn("__pbi",
        when(col("__bcnt").isNotNull && col("__c1").isNotNull,
          col("__bcnt").cast("double") / col("__c1")).otherwise(lit(0.0)))
      .withColumn("__puni", coalesce(col("__c2"), lit(0.5)) / col("__n"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"),
        avg(log(2.0, lit(0.75) * col("__pbi") + lit(0.25) * col("__puni"))).as("__lp"))
    // the id universe (zero-token documents still score (0, 0.0) via the
    // left join): when materialized, a map-side-partial distinct over the
    // frame — every doc has >= 1 row there via its marker — reads the
    // checkpoint, one snapshot, no source rescan. Unmaterialized, the frame
    // lineage would re-run tokenize+explode just to list ids, so read the
    // id column off `docs` directly (the caller owns its persistence).
    val universe =
      if (materialize) frame.select(col(idCol)).distinct()
      else docs.select(col(idCol))
    universe.join(scored, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_bigrams"), lit(0L)).cast("long").as("n_bigrams"),
        (round(coalesce(col("__lp"), lit(0.0)), 4) + lit(0.0)).as("bigram_logprob"))
  }

  /** CCNet-style quality buckets (Wenzek et al. 2020 §4.3 — public
    * paper): equal-count tiers of the corpus by LM score — `head` =
    * best-scoring third (lowest perplexity, highest [[score]] logprob),
    * then `middle`, `tail`. Downstream pipelines train on head+middle or
    * re-weight by tier.
    *
    * Ranking is over the ROUNDED score plus the document id, so tier
    * assignment is deterministic and engine-independent (an unrounded
    * order could flip ulp-close neighbors between Spark and an oracle).
    * The ntile ranks (id, score) pairs only — 16-byte rows through one
    * global sort, fine into the tens of millions of documents; beyond
    * that, derive tier THRESHOLDS from quantiles of [[score]] and assign
    * map-side (the thresholds are three numbers; exact equal-count
    * splitting is what requires the global rank).
    */
  def buckets(docs: DataFrame, idCol: String, text: Column,
              nBuckets: Int = 3, vocabSize: Int = 65536): DataFrame = {
    require(nBuckets >= 2, "bucketing needs at least two tiers")
    val scored = score(docs, idCol, text, vocabSize)
    val w = Window.orderBy(col("logprob").desc, col(idCol).asc)
    val tier = ntile(nBuckets).over(w)
    val label =
      if (nBuckets == 3)
        when(tier === 1, "head").when(tier === 2, "middle").otherwise("tail")
      else concat(lit("q"), tier.cast("string"))
    scored.select(col(idCol), col("n_tokens"), col("logprob"),
      label.as("bucket"))
  }

  /** The corpus-scale path for [[buckets]]: tier THRESHOLDS from
    * `approx_percentile` over the rounded score (one small aggregation —
    * the sketch state is bounded by its accuracy parameter, not the
    * corpus), then a map-side threshold comparison — no global sort, no
    * single-partition window, so the assignment distributes at any
    * corpus size. Tier populations are equal only up to quantile-sketch
    * error and score ties (every document at a threshold value lands in
    * the same tier, where the exact ntile would split them by id) —
    * which is why [[buckets]] remains the oracle query and this is the
    * documented trade at scale.
    */
  def bucketsByThreshold(docs: DataFrame, idCol: String, text: Column,
                         nBuckets: Int = 3, vocabSize: Int = 65536,
                         accuracy: Int = 10000): DataFrame = {
    require(nBuckets >= 2, "bucketing needs at least two tiers")
    val scored = score(docs, idCol, text, vocabSize)
    val qs = (1 until nBuckets).map(i => lit(i.toDouble / nBuckets))
    // descending-score tiers from ascending quantiles: tier i's lower
    // bound is the (1 - i/n) quantile of the score
    val cuts = scored.agg(percentile_approx(col("logprob"),
      array(qs.reverse: _*), lit(accuracy)).as("__cuts"))
    // best tier's condition must be checked FIRST (a head score also
    // clears every lower threshold), so chain the whens from tier 1 down
    val first = when(col("logprob") >= element_at(col("__cuts"), 1), lit(1))
    val tier = (2 until nBuckets)
      .foldLeft(first)((acc, i) =>
        acc.when(col("logprob") >= element_at(col("__cuts"), i), lit(i)))
      .otherwise(lit(nBuckets))
    val label =
      if (nBuckets == 3)
        when(tier === 1, "head").when(tier === 2, "middle").otherwise("tail")
      else concat(lit("q"), tier.cast("string"))
    scored.join(broadcast(cuts))
      .select(col(idCol), col("n_tokens"), col("logprob"), label.as("bucket"))
  }
}
