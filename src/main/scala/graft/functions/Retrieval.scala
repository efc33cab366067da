package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-level retrieval scoring: TF-IDF term profiles and BM25 ranking
  * (Robertson & Spärck Jones; the BM25 form with the +1 idf floor used by
  * Lucene — public literature). The training-data angle: TF-IDF top terms
  * are the standard topic-profile features for cluster labeling and mixture
  * audits, and BM25 is the retrieval half of retrieval-augmented dedup and
  * decontamination funnels.
  *
  * Scale shape:
  *   - one explode pass builds per-(doc, term) counts — shuffled on the
  *     composite key, so partial aggregation collapses repeats map-side;
  *   - document frequency is a term-keyed aggregate of the (doc, term)
  *     pairs — vocabulary-sized, joined back on the term key (equi-join,
  *     never broadcast: a 100 TB corpus's vocabulary is unbounded);
  *   - corpus scalars (N docs, mean doc length) ride a 1-row broadcast;
  *   - BM25 filters the exploded stream to the query's terms BEFORE any
  *     shuffle — the per-query cost is ∝ query-term postings, not corpus
  *     size; doc length comes from the fused map-side token counter, not a
  *     second explode.
  *
  * Tokenizer = the engine-wide whitespace dialect (`trim` + split on
  * `\s+`), identical to the histogram/LM family so oracles replay it.
  */
object Retrieval {

  private def tokens(docs: DataFrame, idCol: String, text: Column): DataFrame =
    docs.select(col(idCol), explode(split(trim(lower(text)), "[ \\t\\n\\f\\r]+")).as("term"))
      .filter(col("term") =!= "")

  /** Per-document top-`k` terms by tf·idf, idf = ln(N / df). Ties break on
    * term ascending, so the result is deterministic and SQL-replayable.
    * Output: (idCol, term, tf, df, score) — score rounded to 4 decimals.
    */
  def tfidfTopTerms(docs: DataFrame, idCol: String, text: Column, k: Int): DataFrame = {
    val tf = tokens(docs, idCol, text)
      .groupBy(col(idCol), col("term")).agg(count(lit(1)).as("tf"))
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val nDocs = docs.select(countDistinct(col(idCol)).as("n_docs"))
    val scored = tf.join(df, "term")
      .crossJoin(broadcast(nDocs)) // 1-row corpus scalar
      .withColumn("score", (round(col("tf") * log(col("n_docs") / col("df")), 4) + lit(0.0)))
    scored
      .withColumn("rk", row_number().over(
        Window.partitionBy(col(idCol)).orderBy(col("score").desc, col("term"))))
      .filter(col("rk") <= k)
      .select(col(idCol), col("term"), col("tf").cast("long"), col("df").cast("long"), col("score"))
  }

  /** BM25 document ranking for a fixed bag of query terms.
    *
    * score(d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·|d|/avgdl)),
    * idf(t) = ln(1 + (N − df + 0.5)/(df + 0.5))  (always positive).
    *
    * Output: (idCol, score) for documents matching ≥1 term, score rounded
    * to 4 decimals, ordered score desc then idCol, limited to `topK`.
    */
  def bm25Rank(docs: DataFrame, idCol: String, text: Column, queryTerms: Seq[String],
               k1: Double = 1.2, b: Double = 0.75, topK: Int = 20): DataFrame = {
    require(queryTerms.nonEmpty, "bm25Rank needs at least one query term")
    val q = queryTerms.map(_.toLowerCase(java.util.Locale.ROOT)).distinct
    // map-side funnel: only query-term postings survive the explode
    val hits = tokens(docs, idCol, text).filter(col("term").isin(q: _*))
    val tf = hits.groupBy(col(idCol), col("term")).agg(count(lit(1)).as("tf"))
    val dfT = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    // doc length via the fused counter — no second explode over the corpus
    val lens = docs.select(col(idCol),
      TextFunctions.tokenCount(lower(text)).cast("double").as("dl"))
    val scalars = lens.agg(count(lit(1)).cast("double").as("n_docs"),
      avg(col("dl")).as("avgdl"))
    val idf = log(lit(1.0) + (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
    val tfNorm = (col("tf") * (lit(k1) + 1.0)) /
      (col("tf") + lit(k1) * (lit(1.0) - lit(b) + lit(b) * col("dl") / col("avgdl")))
    tf.join(dfT, "term")
      .join(lens, idCol)
      .crossJoin(broadcast(scalars)) // 1-row corpus scalars
      .groupBy(col(idCol))
      .agg((round(sum(idf * tfNorm), 4) + lit(0.0)).as("score"))
      .orderBy(col("score").desc, col(idCol))
      .limit(topK)
  }

  /** Materialized inverted index: the index-once/query-many production
    * shape. One corpus pass builds three relations —
    *
    *   postings (term, idCol, tf)   — bucket/sort by `term` at write time
    *   lengths  (idCol, dl)
    *   scalars  (n_docs, avgdl)     — one row
    *
    * and [[bm25FromIndex]] then answers a query from the index ALONE: the
    * postings scan is an equi-filter on `term` (partition-prunable when the
    * index is written term-bucketed), document frequency is a ≤|terms|-row
    * agg over the already-filtered sliver, and the corpus text is never
    * touched again. Pinned output-identical to [[bm25Rank]].
    */
  final case class Bm25Index(postings: DataFrame, lengths: DataFrame,
                             scalars: DataFrame)

  def buildIndex(docs: DataFrame, idCol: String, text: Column): Bm25Index = {
    val postings = tokens(docs, idCol, text)
      .groupBy(col("term"), col(idCol)).agg(count(lit(1)).as("tf"))
    val lengths = docs.select(col(idCol),
      TextFunctions.tokenCount(lower(text)).cast("double").as("dl"))
    val scalars = lengths.agg(count(lit(1)).cast("double").as("n_docs"),
      avg(col("dl")).as("avgdl"))
    Bm25Index(postings, lengths, scalars)
  }

  /** BM25 from the materialized index — same scores, no corpus scan. */
  def bm25FromIndex(index: Bm25Index, idCol: String, queryTerms: Seq[String],
                    k1: Double = 1.2, b: Double = 0.75, topK: Int = 20): DataFrame = {
    require(queryTerms.nonEmpty, "bm25FromIndex needs at least one query term")
    val q = queryTerms.map(_.toLowerCase(java.util.Locale.ROOT)).distinct
    val tf = index.postings.filter(col("term").isin(q: _*))
    val dfT = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val idf = log(lit(1.0) + (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
    val tfNorm = (col("tf") * (lit(k1) + 1.0)) /
      (col("tf") + lit(k1) * (lit(1.0) - lit(b) + lit(b) * col("dl") / col("avgdl")))
    tf.join(dfT, "term")
      .join(index.lengths, idCol)
      .crossJoin(broadcast(index.scalars)) // 1-row corpus scalars
      .groupBy(col(idCol))
      .agg((round(sum(idf * tfNorm), 4) + lit(0.0)).as("score"))
      .orderBy(col("score").desc, col(idCol))
      .limit(topK)
  }

  /** Frozen BM25 corpus statistics: per-query-term document frequency plus
    * the two corpus scalars. |queryTerms| + 2 numbers — the same
    * frozen-model device as the DSIR/PQ streaming twins: train on the
    * standing corpus once, score arrivals with a STATELESS column.
    */
  final case class Bm25Model(nDocs: Double, avgdl: Double, df: Map[String, Long],
                             k1: Double, b: Double)

  /** Collect the frozen statistics (≤|queryTerms| df rows + 2 scalars —
    * driver-bounded by the query size, never the corpus).
    */
  def freezeBm25(docs: DataFrame, idCol: String, text: Column, queryTerms: Seq[String],
                 k1: Double = 1.2, b: Double = 0.75): Bm25Model = {
    val q = queryTerms.map(_.toLowerCase(java.util.Locale.ROOT)).distinct
    val hits = tokens(docs, idCol, text).filter(col("term").isin(q: _*))
    val dfRows = hits.groupBy(col(idCol), col("term")).agg(count(lit(1)).as("tf"))
      .groupBy(col("term")).agg(count(lit(1)).as("df"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val sc = docs.agg(count(lit(1)).cast("double"),
      avg(TextFunctions.tokenCount(lower(text)).cast("double"))).head()
    Bm25Model(sc.getDouble(0), sc.getDouble(1), dfRows, k1, b)
  }

  /** Stateless BM25 score of one document against the frozen model — a
    * pure Column (one tokenize, |queryTerms| filtered counts), so the SAME
    * expression scores a batch frame and a Structured Streaming arrival
    * row-by-row with no state store. Terms absent from the frozen corpus
    * contribute 0 (tf multiplies the whole term). Rounded to 4 decimals,
    * matching [[bm25Rank]]'s output exactly on the training corpus.
    */
  def bm25ScoreColumn(text: Column, model: Bm25Model): Column = {
    val toks = split(trim(lower(text)), "[ \\t\\n\\f\\r]+")
    val dl = TextFunctions.tokenCount(lower(text)).cast("double")
    val norm = lit(model.k1) * (lit(1.0) - lit(model.b) + lit(model.b) * dl / lit(model.avgdl))
    val terms = model.df.toSeq.sortBy(_._1).map { case (term, df) =>
      val idf = math.log(1.0 + (model.nDocs - df + 0.5) / (df + 0.5))
      val tf = size(filter(toks, t => t === lit(term))).cast("double")
      lit(idf) * (tf * (model.k1 + 1.0)) / (tf + norm)
    }
    val total = terms.reduceOption(_ + _).getOrElse(lit(0.0))
    round(total, 4) + lit(0.0)
  }

  /** Ranking-quality evaluation against a gold relevance set: MRR,
    * precision@k, and binary-relevance NDCG@k in ONE row —
    *
    *   mrr    = 1 / rank of the first gold hit (0 when none ranked)
    *   p@k    = |gold ∩ top-k| / k
    *   ndcg@k = Σ_{gold hits i ≤ k} 1/log2(rank_i + 1)
    *            / Σ_{i=1..min(|gold|, k)} 1/log2(i + 1)
    *
    * `ranked` is a retriever's output with (`idCol`, `rankCol`, 1-based,
    * bounded by the retriever's top-N); `gold` may be corpus-scale — it
    * joins the bounded ranking by key and contributes one COUNT, so the
    * evaluation costs one broadcast join + two 1-row aggregations no
    * matter the corpus. NDCG's ideal-DCG series is computed in-plan from
    * |gold| (`sequence` + `aggregate`, no driver round-trip).
    */
  def evalMetrics(ranked: DataFrame, gold: DataFrame, idCol: String,
                  rankCol: String = "rank", k: Int = 10): DataFrame = {
    val goldIds = gold.select(col(idCol)).distinct()
    val goldN = goldIds.agg(count(lit(1)).as("gold_n"))
    val hits = ranked.select(col(idCol), col(rankCol).cast("long").as("__rank"))
      .join(goldIds, Seq(idCol), "left_semi")
    val agg = hits.agg(
      coalesce(lit(1.0) / min(col("__rank")), lit(0.0)).as("mrr"),
      (sum(when(col("__rank") <= k, 1).otherwise(0)) / lit(k.toDouble)).as("p_at_k"),
      sum(when(col("__rank") <= k,
        lit(1.0) / log2(col("__rank") + 1)).otherwise(lit(0.0))).as("__dcg"))
    val idcg = aggregate(
      sequence(lit(1), least(col("gold_n"), lit(k)).cast("int")),
      lit(0.0), (acc, i) => acc + lit(1.0) / log2(i.cast("double") + 1))
    agg.crossJoin(broadcast(goldN)) // 1-row scalar
      .select(
        (round(coalesce(col("mrr"), lit(0.0)), 6) + lit(0.0)).as("mrr"),
        (round(coalesce(col("p_at_k"), lit(0.0)), 6) + lit(0.0)).as("p_at_k"),
        (round(
          when(col("gold_n") === 0, lit(0.0))
            .otherwise(coalesce(col("__dcg"), lit(0.0)) / idcg), 6) + lit(0.0))
          .as("ndcg_at_k"),
        col("gold_n").cast("long").as("gold_n"))
  }

  /** Reciprocal-rank fusion (Cormack/Clarke/Buettcher 2009) of N scored
    * candidate lists — the standard way to combine a lexical (BM25) and a
    * semantic (embedding-cosine) retriever without score calibration:
    *
    *   rrf(d) = Σ_lists 1 / (k0 + rank_list(d)),   k0 = 60 by convention.
    *
    * Each input frame is one retriever's candidate list with (`idCol`,
    * `scoreCol`); ranks are assigned here (score desc, id asc — the same
    * deterministic tiebreak the rankers themselves use) so callers fuse raw
    * scored lists without pre-ranking.
    *
    * Scale: inputs are POST-shortlist candidate lists (top-N per retriever,
    * bounded by construction) — the single-partition rank window and the
    * fusion agg run over ≤ N·lists rows regardless of corpus size; all the
    * heavy lifting stays in the upstream retrievers, which scan the corpus
    * with their own distributed plans.
    */
  def rrfFuse(lists: Seq[DataFrame], idCol: String, scoreCol: String = "score",
              k0: Int = 60, topK: Int = 20): DataFrame = {
    require(lists.nonEmpty, "rrfFuse needs at least one candidate list")
    val ranked = lists.map { df =>
      df.select(col(idCol), row_number().over(
        Window.orderBy(col(scoreCol).desc, col(idCol))).as("__rank"))
    }
    ranked.reduce(_ unionByName _)
      .groupBy(col(idCol))
      .agg((round(sum(lit(1.0) / (lit(k0) + col("__rank"))), 6) + lit(0.0)).as("rrf_score"),
        count(lit(1)).as("n_lists"))
      .orderBy(col("rrf_score").desc, col(idCol))
      .limit(topK)
  }
}
