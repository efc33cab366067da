package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Hashed-feature multinomial Naive Bayes — the fastText-style linear text
  * classifier (Joulin et al. 2016's hashing trick over a count-based model)
  * that corpus pipelines use as the cheap quality / domain / language
  * scorer (e.g. the GPT-3 WebText-vs-crawl quality filter, public paper).
  *
  * The signature move is the same as [[Dsir]]: hash words into a FIXED
  * bucket table, so the trained state is `buckets × |labels|` counts no
  * matter the corpus size. Training is ONE bounded aggregation; scoring is
  * a map-side join against the broadcast log-probability table (batch) or
  * a stateless fold over an in-plan literal table (frozen/streaming).
  *
  * score(d, ℓ) = log2 P(ℓ) + Σ_tokens log2 P(bucket | ℓ), both Laplace-
  * smoothed; predict = argmax (ties → label ascending). Everything is the
  * md5Hash60 family + log2 + 4-dp rounding, so DuckDB replays the funnel
  * bit-for-bit: bucket histogram → smoothed log-probs → per-doc sum →
  * argmax.
  */
object NbClassifier {

  /** Train on `docs` and score EVERY document against every label
    * (self-train — the corpus-audit shape: "which source does this doc
    * read like?"). Output: (idCol, `predicted`, `score`) with score the
    * winning label's log2 posterior rounded to 4 dp; tokenless documents
    * predict the max-prior label (prior-only posterior). Deterministic on
    * any partitioning.
    *
    * Scale: one tokenize+hash explode feeding (a) the bounded
    * `buckets × |labels|` count table and (b) per-doc bucket counts; the
    * model table broadcasts (≤ buckets·|labels| rows); the per-doc×label
    * score fan-out is |labels|-bounded. Labels are a CATEGORY column
    * (sources, languages, tiers) — cardinality is assumed small; the
    * label frame rides broadcast joins.
    */
  def trainScore(docs: DataFrame, idCol: String, text: Column, label: Column,
                 buckets: Int = 4096, ngram: Int = 1): DataFrame = {
    require(buckets >= 1, "need at least one bucket")
    val id = col(idCol)

    // the label alphabet, collected once — a parameter-bounded driver
    // materialization (|labels| rows for a category column, the same class
    // of collect as Sampling.mixtureWeights), which lets the per-doc×label
    // fan-out below be a map-side explode over a LITERAL array instead of
    // a cross join (no BNLJ node anywhere in the plan)
    val labels: Seq[String] = docs.select(label.cast("string").as("__l"))
      .distinct().orderBy(col("__l")).collect().map(_.getString(0)).toSeq
    val labelArr = array(labels.map(lit): _*)

    // one explode pass: (doc, label, bucket); partial agg collapses repeats
    val toks = docs.select(id.as("__id"), label.cast("string").as("__l"),
      explode(Dsir.tokenBuckets(text, buckets, ngram)).as("__b"))

    // bounded model state: counts per (bucket, label), label token totals,
    // label priors
    val counts = toks.groupBy(col("__b"), col("__l")).agg(count(lit(1)).as("__c"))
    val labelTotals = counts.groupBy(col("__l")).agg(sum(col("__c")).as("__tot"))
    val nDocs = docs.select(count(lit(1)).as("__nd"))
    val priors = docs.select(label.cast("string").as("__l")).groupBy(col("__l"))
      .agg(count(lit(1)).as("__dl"))
      .crossJoin(broadcast(nDocs)) // 1-row corpus scalar
      .select(col("__l"), log2(col("__dl").cast("double") / col("__nd")).as("__prior"))

    // per-doc bucket counts × every label: the |labels|-bounded map-side
    // fan-out, then the smoothed log-prob attaches by (bucket, label) —
    // absent (bucket, label) pairs fall to the pure-smoothing floor via
    // coalesce
    val docBuckets = toks.groupBy(col("__id"), col("__b")).agg(count(lit(1)).as("__n"))
    val bD = lit(buckets.toDouble)
    val scored = docBuckets
      .withColumn("__l", explode(labelArr))
      .join(broadcast(labelTotals.select(col("__l"), col("__tot"))), "__l")
      .join(broadcast(counts), Seq("__b", "__l"), "left")
      .select(col("__id"), col("__l"),
        (col("__n") * log2((coalesce(col("__c"), lit(0L)) + 1.0) /
          (col("__tot") + bD))).as("__s"))
      .groupBy(col("__id"), col("__l")).agg(sum(col("__s")).as("__sum"))

    // posterior per (doc, label) — prior-only for tokenless docs — then
    // argmax with the min_by-over-(−score, label) tie device, comparing at
    // the shared 4-dp rounding so cross-engine ulp drift cannot flip a tie
    val posts = docs.select(id.as("__id")).withColumn("__l", explode(labelArr))
      .join(broadcast(priors), "__l")
      .join(scored, Seq("__id", "__l"), "left")
      .select(col("__id"), col("__l"),
        (round(col("__prior") + coalesce(col("__sum"), lit(0.0)), 4) + lit(0.0)).as("__p"))
    posts.groupBy(col("__id"))
      .agg(
        min_by(col("__l"), struct((-col("__p")).as("s"), col("__l").as("l"))).as("predicted"),
        (max(col("__p")) + lit(0.0)).as("score"))
      .withColumnRenamed("__id", idCol)
  }

  /** Frozen model: per-label prior plus the dense `buckets`-row log2
    * P(bucket|label) table per label — the [[Dsir.frozenTable]] deployment
    * shape (train on the standing corpus once, score arrivals statelessly).
    * Labels sorted ascending; `table(i)` aligns with `labels(i)`.
    */
  final case class Model(labels: Seq[String], logPrior: Array[Double],
                         table: Array[Array[Double]], buckets: Int, ngram: Int)

  /** Collect the bounded model (≤ buckets × |labels| + |labels| rows).
    * The label is cast to string like [[trainScore]] does, so non-string
    * label columns (int source ids) train instead of ClassCastException-ing
    * at collection.
    */
  def train(docs: DataFrame, text: Column, label: Column,
            buckets: Int = 4096, ngram: Int = 1): Model = {
    val toks = docs.select(label.cast("string").as("__l"),
      explode(Dsir.tokenBuckets(text, buckets, ngram)).as("__b"))
    val counts = toks.groupBy(col("__b"), col("__l")).agg(count(lit(1)).as("__c"))
      .collect().map(r => (r.getLong(0).toInt, r.getString(1)) -> r.getLong(2)).toMap
    val priorRows = docs.select(label.cast("string").as("__l")).groupBy(col("__l"))
      .agg(count(lit(1)).as("__dl")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val labels = priorRows.keys.toSeq.sorted
    val nDocs = priorRows.values.sum.toDouble
    val log2v = math.log(2.0)
    val logPrior = labels.map(l => math.log(priorRows(l) / nDocs) / log2v).toArray
    val totals = labels.map(l =>
      counts.collect { case ((_, ll), c) if ll == l => c }.sum.toDouble)
    val table = labels.indices.map { i =>
      val tot = totals(i) + buckets
      Array.tabulate(buckets)(b =>
        math.log((counts.getOrElse((b, labels(i)), 0L) + 1.0) / tot) / log2v)
    }.toArray
    Model(labels, logPrior, table, buckets, ngram)
  }

  /** Stateless posterior for one label against a frozen [[Model]]: a fold
    * over the hashed buckets through the label's table shipped as an array
    * literal — no explode, no join, no state, so the identical Column runs
    * under Structured Streaming. Same 4-dp rounding as [[trainScore]].
    */
  def scoreColumn(text: Column, model: Model, label: String): Column = {
    val i = model.labels.indexOf(label)
    require(i >= 0, s"unknown label $label")
    val arr = lit(model.table(i))
    val folded = aggregate(Dsir.tokenBuckets(text, model.buckets, model.ngram),
      lit(0.0), (acc, b) => acc + element_at(arr, (b + 1).cast("int")))
    round(lit(model.logPrior(i)) + coalesce(folded, lit(0.0)), 4) + lit(0.0)
  }

  /** Stateless argmax prediction against a frozen [[Model]] (ties → label
    * ascending, matching [[trainScore]]).
    */
  def predictColumn(text: Column, model: Model): Column = {
    val scored = model.labels.map(l =>
      struct((-scoreColumn(text, model, l)).as("s"), lit(l).as("l")))
    array_min(array(scored: _*)).getField("l")
  }
}
