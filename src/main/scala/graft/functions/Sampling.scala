package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic hash-based sampling for training-data pipelines:
  * reproducible train/val/test splits, fractional corpus sampling, and
  * per-source mixture weighting.
  *
  * The primitive is the first 4 hex chars of `md5(key)` compared
  * lexicographically against a threshold — hex strings sort numerically
  * (digits `0-9` precede `a-f` in ASCII), so `md5_prefix < "1999"` keeps
  * 0x1999/0x10000 ≈ 10% of keys. Every engine with md5 computes the same
  * buckets, which makes the sample membership itself oracle-checkable and,
  * more importantly, STABLE: re-running a pipeline, adding executors, or
  * re-partitioning the corpus never moves a document across splits (unlike
  * `rand()`-based `DataFrame.sample`, whose assignment depends on
  * partitioning and seed plumbing). Map-side only — no shuffle, no state.
  *
  * Resolution is 1/65536; thresholds are exact multiples of it. For
  * training-corpus work (percent-scale fractions) that granularity is the
  * point — per-key determinism beats ppm-precise fractions.
  */
object Sampling {

  /** 4-hex-char md5 prefix of a key column — the deterministic bucket id. */
  def hashKey(key: Column): Column = substring(md5(key.cast("string")), 1, 4)

  /** Threshold hex string for a fraction in [0, 1]. A full fraction maps to
    * "g", which sorts above every 4-hex-char bucket ("10000" would sort
    * BELOW "ffff" lexicographically and keep nothing).
    */
  def thresholdHex(frac: Double): String = {
    require(frac >= 0.0 && frac <= 1.0, s"fraction out of range: $frac")
    val v = math.round(frac * 65536.0)
    if (v >= 65536L) "g" else f"$v%04x"
  }

  /** Keep a deterministic `frac` of rows by hash of `key`. */
  def sampleByHash(df: DataFrame, key: Column, frac: Double): DataFrame =
    df.filter(hashKey(key) < lit(thresholdHex(frac)))

  /** Assign each row to a named split by cumulative hash ranges, e.g.
    * `Seq("test" -> 0.05, "val" -> 0.05)` puts 5% in test, the next 5% in
    * val, and everything else in `defaultSplit`. Assignment is per-key
    * deterministic: growing the corpus never reassigns an existing key.
    */
  def assignSplit(key: Column, splits: Seq[(String, Double)],
                  defaultSplit: String = "train"): Column = {
    val h = hashKey(key)
    val cum = splits.scanLeft(0.0) { case (acc, (_, f)) => acc + f }
    require(cum.last <= 1.0, "split fractions exceed 1.0")
    val bounds = splits.zip(cum.zip(cum.tail)).map {
      case ((name, _), (lo, hi)) => (name, thresholdHex(lo), thresholdHex(hi))
    }
    bounds.foldRight(lit(defaultSplit): Column) { case ((name, lo, hi), other) =>
      when(h >= lit(lo) && h < lit(hi), lit(name)).otherwise(other)
    }
  }

  /** Per-group sampling rates (training-mixture weighting): keep a row of
    * group `g` with probability `rates(g)` (deterministic by `key`), and
    * `defaultRate` for unlisted groups. The standard way to re-weight a
    * multi-source corpus toward a target mixture without materializing
    * per-source frames: one map-side filter over the union.
    */
  def mixtureSample(df: DataFrame, key: Column, group: Column,
                    rates: Map[String, Double],
                    defaultRate: Double = 1.0): DataFrame = {
    val threshold = rates.toSeq.sortBy(_._1)
      .foldRight(lit(thresholdHex(defaultRate)): Column) {
        case ((g, f), other) => when(group === lit(g), lit(thresholdHex(f))).otherwise(other)
      }
    df.filter(hashKey(key) < threshold)
  }

  /** Per-source keep rates that hit a TOKEN budget: rate(s) =
    * min(1, budget · weight(s) / tokens(s)). This is how real mixtures are
    * specified — "train on 500 B tokens, 50% web / 30% code / 20% books" —
    * rather than as hand-tuned per-source row rates. A source with no
    * measured tokens keeps everything (nothing to down-sample). Weights
    * need not sum to 1; each source's share is independent, and a source
    * whose corpus is smaller than its share keeps all of it (rate capped
    * at 1 — the budget is a ceiling per source, not redistributed).
    */
  def mixtureWeights(tokensBySource: Map[String, Long],
                     weights: Map[String, Double],
                     tokenBudget: Long): Map[String, Double] =
    weights.map { case (src, w) =>
      val toks = tokensBySource.getOrElse(src, 0L)
      val rate = if (toks <= 0L) 1.0 else math.min(1.0, tokenBudget * w / toks)
      src -> rate
    }

  /** Temperature-scaled mixture weights (the multilingual-training
    * sampling rule, Conneau & Lample 2019, §3.1 — public paper):
    * weight(s) ∝ (tokens(s) / N)^(1/T), normalized to sum 1. T = 1
    * reproduces the natural size distribution, T → ∞ approaches uniform,
    * T < 1 sharpens toward the biggest source — the standard way to lift
    * low-resource sources without hand-picking shares. Composes with
    * [[mixtureWeights]] to turn (temperature, token budget) into
    * per-source keep rates.
    *
    * T = 2 (the common choice) routes through `math.sqrt`, which IEEE
    * requires to be correctly rounded — so a SQL oracle's `sqrt`
    * reproduces the weights bit-for-bit. Generic exponents use
    * `math.pow`, which is NOT correctly rounded; cross-engine replay of
    * those can differ by an ulp (same caveat as generic budget weights).
    */
  def temperatureWeights(tokensBySource: Map[String, Long],
                         temperature: Double): Map[String, Double] = {
    require(temperature > 0.0, s"temperature must be positive: $temperature")
    val total = tokensBySource.values.map(_.toDouble).sum
    val invT = 1.0 / temperature
    val raw = tokensBySource.map { case (s, n) =>
      val p = if (n <= 0L || total <= 0.0) 0.0 else n.toDouble / total
      s -> (if (invT == 0.5) math.sqrt(p) else math.pow(p, invT))
    }
    // normalize with a SORTED-key summation: double addition is
    // non-associative and Map iteration order is arbitrary, so an
    // unordered sum could move z by an ulp between runs (and against an
    // oracle that adds in source order)
    val z = raw.toSeq.sortBy(_._1).foldLeft(0.0)(_ + _._2)
    if (z <= 0.0) raw else raw.map { case (s, w) => s -> w / z }
  }

  /** Deterministic corpus shuffle + shard assignment — the pre-training
    * layout step: order the corpus by `md5(key)` (a pseudorandom
    * permutation, so adjacent source documents land far apart) and split
    * the permuted stream into `shards` independent shard files, each
    * internally ordered. Adds `shard` (md5 bucket of the key, the same
    * 4-hex-digit device as [[Packing.packOffsets]]) and `pos` (1-based
    * position within the shard, ordered by the full md5 then the key for
    * total determinism).
    *
    * Scale shape: a single globally-ordered stream would need a one-
    * partition sort; sharding first makes the sort per-shard — one hash
    * exchange on `shard`, then `shards` independent in-partition sorts
    * (pick `shards` ≫ executor count at 100 TB so each sort fits). The
    * assignment is engine-portable (md5 prefix arithmetic), so a DuckDB
    * oracle — or any downstream system — reproduces the exact layout;
    * re-running, repartitioning, or growing the corpus never reorders
    * rows relative to each other within a shard.
    */
  def shuffleAssign(df: DataFrame, key: Column, shards: Int): DataFrame = {
    require(shards >= 1, "need at least one shard")
    val withHash = df.withColumn("__h", md5(key.cast("string")))
      .withColumn("shard",
        (conv(substring(col("__h"), 1, 4), 16, 10).cast("int") % shards).cast("long"))
    val w = Window.partitionBy(col("shard")).orderBy(col("__h"), key)
    withHash.withColumn("pos", row_number().over(w).cast("long")).drop("__h")
  }

  /** Weighted sampling WITHOUT replacement, deterministic
    * (Efraimidis–Spirakis 2006): every row draws u ∈ (0,1) from its key's md5
    * (no RNG state) and scores u^(1/w); the top-k scores are exactly a
    * weight-proportional sample. One map-side score + one top-k — at scale
    * the global top-k is the engine's TakeOrdered (per-partition heaps,
    * k rows to the driver side of the exchange), never a full sort.
    *
    * Scores are ROUNDED (6 dp) before ranking with the key as tiebreak,
    * so the selection boundary is engine-portable (the same md5→u→pow
    * arithmetic replays in SQL).
    */
  def weightedSampleKey(key: Column, weight: Column): Column = {
    // u from the md5 32-bit prefix, centered so u ∈ (0,1) exclusive
    val u = (conv(substring(md5(key.cast("string")), 1, 8), 16, 10)
      .cast("double") + lit(0.5)) / lit(4294967296.0)
    // w ≤ 0 has no draw (1/w flips the exponent sign and u^(1/w) > 1 —
    // garbage that would SILENTLY win the top-k): null key = excluded
    when(weight > lit(0.0), round(pow(u, lit(1.0) / weight), 6) + lit(0.0))
  }

  def weightedSample(df: DataFrame, key: Column, weight: Column, k: Int): DataFrame =
    df.withColumn("__wkey", weightedSampleKey(key, weight))
      .filter(col("__wkey").isNotNull) // w ≤ 0 rows carry no draw
      .orderBy(col("__wkey").desc, key)
      .limit(k)
      .drop("__wkey")

  /** Deterministic dense id assignment WITHOUT a global sort — the
    * distributed `zipWithIndex`: ids are 0..n−1, stable across reruns and
    * partitionings (they depend only on key md5, not on Spark's physical
    * layout, unlike `monotonically_increasing_id`).
    *
    * Shape: [[shuffleAssign]]'s per-shard positions (one key exchange,
    * per-shard window sorts) + an exclusive prefix sum over the ≤`shards`
    * bucket counts (a bounded frame — the only single-partition window) +
    * a broadcast offsets join. dense_id = offset(shard) + pos − 1 ≡
    * row_number over (shard, md5, key) − 1, which is what the oracle
    * replays. This is the indexing step [[negativePairs]]' dense-id
    * contract asks for.
    */
  def denseIds(df: DataFrame, key: Column, shards: Int): DataFrame = {
    val assigned = shuffleAssign(df, key, shards)
    val offsets = assigned.groupBy(col("shard")).agg(count(lit(1)).as("__cnt"))
      .withColumn("__offset",
        sum(col("__cnt")).over(Window.orderBy(col("shard"))) - col("__cnt"))
      .select(col("shard"), col("__offset"))
    assigned.join(broadcast(offsets), "shard")
      .withColumn("dense_id", col("__offset") + col("pos") - 1)
      .drop("__offset")
  }

  /** Deterministic pseudo-random NEGATIVE sampling for contrastive-pair
    * training data: `k` negatives per anchor row, drawn uniformly from the
    * other rows by md5 arithmetic — no RNG state, no shuffle to generate
    * (the expansion is a map-side explode), and the same (anchor, pair_idx)
    * always maps to the same negative, so pair sets are reproducible across
    * runs and engines (the md5-prefix device of [[shuffleAssign]]).
    *
    * Requires ids dense in [0, n): the draw is `h % (n-1)` with a +1 skip
    * over the anchor itself (uniform over the n-1 others). Non-dense
    * corpora index first (`row_number`/`zipWithIndex` at write time — the
    * shuffle-shard layout already provides exactly this).
    *
    * Output: (anchor_id, pair_idx, neg_id). Join `neg_id` back to the
    * corpus for the negative's payload — an 8-byte-key equi-join that
    * scales like any fact join (n·k rows against n).
    */
  def negativePairs(df: DataFrame, idCol: String, k: Int): DataFrame = {
    require(k >= 1, "need at least one negative per anchor")
    val n1 = df.agg(count(lit(1)).cast("long").as("__n"))
    val id = col(idCol).cast("long")
    df.crossJoin(broadcast(n1)) // 1-row corpus scalar
      .select(id.as("anchor_id"), col("__n"),
        explode(array((0 until k).map(j => lit(j.toLong)): _*)).as("pair_idx"))
      .withColumn("__h", conv(substring(md5(
        concat(col("anchor_id").cast("string"), lit("#"), col("pair_idx").cast("string"))),
        1, 8), 16, 10).cast("long"))
      // a 1-row corpus has no possible negative (__n − 1 = 0 → modulo by
      // zero, which non-ANSI SQL would null out SILENTLY and ANSI mode
      // would surface as an opaque DivideByZeroException): the divisor is
      // guarded to ≥1 so the modulo itself never faults in either mode,
      // and assert_true rides the same expression (null → +0 when the
      // corpus is big enough), so the check is codegen'd row-side, costs
      // no extra action, and fails loudly with a clear message instead of
      // emitting null neg_ids
      .withColumn("__neg0", col("__h") % greatest(col("__n") - 1, lit(1L)) +
        coalesce(assert_true(col("__n") >= 2,
          lit("negativePairs requires a corpus of at least 2 rows"))
          .cast("long"), lit(0L)))
      .withColumn("neg_id",
        when(col("__neg0") >= col("anchor_id"), col("__neg0") + 1).otherwise(col("__neg0")))
      .select(col("anchor_id"), col("pair_idx"), col("neg_id"))
  }

  /** Measured token totals per source — the one (bounded) action in the
    * budgeted-mixture path: |sources| rows reach the driver, never corpus
    * rows. `tokens` is any per-row count column, e.g. `Bpe.tokenCount`
    * with a trained vocab for real token budgets.
    */
  def tokensBySource(df: DataFrame, group: Column, tokens: Column): Map[String, Long] =
    // group cast to string (non-string source columns otherwise CCE at
    // collect, the NbClassifier.train convention); sum coalesced because a
    // source whose token column is all-null aggregates to NULL and getLong
    // would NPE — 0 measured tokens is the honest value and mixtureWeights
    // already treats it as "nothing to down-sample"
    df.groupBy(group.cast("string").as("__g"))
      .agg(coalesce(sum(tokens.cast("long")), lit(0L)).as("__t"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  /** Token-budgeted mixture sampling: measure per-source totals with
    * `tokens`, derive keep rates via [[mixtureWeights]], apply the
    * deterministic hash filter. Sources absent from `weights` are excluded
    * (a budgeted mixture enumerates its sources). Deterministic given the
    * input corpus; the measurement pass is one small aggregation.
    */
  def mixtureSampleByBudget(df: DataFrame, key: Column, group: Column,
                            tokens: Column, weights: Map[String, Double],
                            tokenBudget: Long): DataFrame = {
    val inMix = df.filter(group.isin(weights.keySet.toSeq: _*))
    val rates = mixtureWeights(tokensBySource(inMix, group, tokens),
      weights, tokenBudget)
    mixtureSample(inMix, key, group, rates, defaultRate = 0.0)
  }
}
