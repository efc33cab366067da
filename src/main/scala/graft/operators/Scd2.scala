package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension type-2 history: turn a CDC change stream into a
  * validity-interval table (one row per distinct state run, `valid_from` /
  * `valid_to` / `is_current`), and maintain it incrementally as new batches
  * arrive.
  *
  * The reference's merge consumers collapse each key to its LATEST state
  * (type-1 — /root/reference/src/main/scala/models/batches/SqlServerChangeTracking.scala:17-58
  * keeps only the newest version per ARCANE_MERGE_KEY); this operator is the
  * history-preserving companion: the same deduplicated change feed, but every
  * observed state transition is kept as an interval row. Downstream joins can
  * then reconstruct "what did the dimension look like when this fact
  * happened" (the `asOf` helper).
  *
  * Semantics, per key, ordering by the monotone version column:
  *   - a row opens a new interval iff it is the key's first row or its
  *     tracked-attribute tuple differs (null-safely) from the previous row's;
  *   - consecutive rows with identical tracked state collapse into one
  *     interval (re-delivered CDC rows don't fragment history);
  *   - `valid_to` = the version that superseded the interval (exclusive),
  *     NULL while current;
  *   - a delete row closes the current interval and opens nothing — a later
  *     re-insert opens a fresh interval.
  *
  * Scale: ONE hash exchange on the key; boundary detection, interval
  * assembly, and the delete filter are three window passes over the SAME
  * partitioning (Spark reuses the exchange — `.explain` shows a single
  * Exchange feeding chained Window nodes). No joins, no data expansion:
  * output rows ≤ input rows. At 100 TB the cost is the one shuffle any
  * per-key operator pays.
  */
object Scd2 {

  private val From = "valid_from"
  private val To = "valid_to"
  private val Cur = "is_current"

  // per-call uniquifier for the auto-width observation name (see
  // asOfJoinBucketedAuto) — process-scoped, never part of the data
  private val observationSeq = new java.util.concurrent.atomic.AtomicLong(0L)

  /** Build the full type-2 history from a change stream.
    *
    * @param changes    one row per observed (key, version) state; versions
    *                   must be totally ordered within a key (duplicate
    *                   versions are collapsed to one arbitrary-but-
    *                   deterministic row first, making replays idempotent)
    * @param keyCol     merge-key column name
    * @param versionCol monotone version column name (CDC version, LSN, ts)
    * @param tracked    columns whose (null-safe) change opens a new interval
    * @param isDelete   predicate marking a row as a tombstone
    */
  def buildHistory(changes: DataFrame, keyCol: String, versionCol: String,
                   tracked: Seq[String],
                   isDelete: Column = lit(false)): DataFrame = {
    val k = col(keyCol)
    val v = col(versionCol)
    val w = Window.partitionBy(k).orderBy(v)
    val state = struct(tracked.map(col): _*)

    // Replay idempotence: a re-delivered (key, version) row must not
    // fragment or duplicate intervals. The collapse is a lag over the SAME
    // key-only partitioning the interval windows use (a per-(key, version)
    // window would force a second hashpartitioning(k, v) exchange); the
    // (version, tracked, delete) sort makes the survivor deterministic and
    // its (k, v, ...) order already satisfies the later windows' (k, v)
    // prefix, so no re-sort either.
    val dedupOrd = v +: tracked.map(col) :+ col("__del")
    val wDedup = Window.partitionBy(k).orderBy(dedupOrd: _*)
    val unique = changes
      .withColumn("__del", isDelete)
      .withColumn("__pv", lag(v, 1).over(wDedup))
      .filter(!(col("__pv") <=> v))
      .drop("__pv")

    // Boundary: first row of the key, a tracked-state change, or crossing a
    // delete edge in either direction (delete rows participate as a state of
    // their own so a post-delete re-insert reopens).
    val prevState = lag(state, 1).over(w)
    val prevDel = lag(col("__del"), 1).over(w)
    val boundary = row_number().over(w) === 1 ||
      !(state <=> prevState) || !(col("__del") <=> prevDel)

    val runs = unique
      .withColumn("__b", boundary)
      .filter(col("__b"))
      .withColumn(From, v)
      .withColumn(To, lead(v, 1).over(w))

    runs
      .filter(!col("__del")) // tombstone intervals are closures, not rows
      .withColumn(Cur, col(To).isNull)
      .select((keyCol +: tracked).map(col) ++ Seq(col(From), col(To), col(Cur)): _*)
  }

  /** Reconstruct the change stream a history table encodes: one change per
    * interval open, plus a synthetic delete wherever an interval was closed
    * by something other than the next interval's open (i.e. by a tombstone).
    * Exact inverse of [[buildHistory]] up to collapsed duplicate states.
    */
  private def toChanges(history: DataFrame, keyCol: String, versionCol: String,
                        tracked: Seq[String]): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(From))
    val nextFrom = lead(col(From), 1).over(w)
    val opens = history
      .withColumn("__implicit_del",
        col(To).isNotNull && !(col(To) <=> nextFrom))
      .select(col(keyCol) +: tracked.map(col) :+
        col(From).as(versionCol) :+ lit(false).as("__was_del") :+
        col("__implicit_del") :+ col(To).as("__del_at"): _*)
    val dels = opens.filter(col("__implicit_del"))
      .select(col(keyCol) +: tracked.map(c => lit(null).cast(history.schema(c).dataType).as(c)) :+
        col("__del_at").as(versionCol) :+ lit(true).as("__was_del"): _*)
    opens.drop("__implicit_del", "__del_at").unionByName(dels)
  }

  /** Incrementally fold a new change batch into an existing history.
    *
    * Only the keys PRESENT in the batch are rebuilt (their stored intervals
    * are replayed as changes, unioned with the batch, and re-run through
    * [[buildHistory]]); untouched keys pass through with a key-partitioned
    * anti-join. With the CDC watermark guarantee (batch versions ≥ all stored
    * versions for the key — the same contract [[CdcMerge]] relies on),
    * `applyChanges(buildHistory(a), b) == buildHistory(a ∪ b)` — pinned as a
    * property test in `Scd2Spec`.
    *
    * Scale: the rebuild side is proportional to the CHANGED keys' history,
    * not the table — the day-2 cost profile of a MERGE, without a
    * transactional catalog.
    */
  def applyChanges(history: DataFrame, batch: DataFrame, keyCol: String,
                   versionCol: String, tracked: Seq[String],
                   isDelete: Column = lit(false)): DataFrame = {
    val touchedKeys = batch.select(col(keyCol)).distinct()
    val affected = history.join(touchedKeys, Seq(keyCol), "left_semi")
    val untouched = history.join(touchedKeys, Seq(keyCol), "left_anti")

    val replayed = toChanges(affected, keyCol, versionCol, tracked)
    val newRows = batch
      .withColumn("__was_del", isDelete)
      .select(col(keyCol) +: tracked.map(col) :+ col(versionCol) :+ col("__was_del"): _*)

    val rebuilt = buildHistory(
      replayed.unionByName(newRows), keyCol, versionCol, tracked,
      isDelete = col("__was_del"))

    untouched.unionByName(rebuilt)
  }

  /** Point-in-time lookup: the state of each key as of `version` (inclusive
    * of opens at `version`, exclusive of closes at it). Keys deleted or not
    * yet born at `version` are absent.
    */
  def asOf(history: DataFrame, version: Column): DataFrame =
    history.filter(col(From) <= version &&
      (col(To).isNull || col(To) > version))

  /** Temporal (as-of) join: each fact row enriched with the dimension state
    * its key held AT THE FACT'S OWN VERSION — the consumption side of the
    * history table ("what did the customer look like when this order was
    * placed"). Inner semantics: facts before the key's birth, inside a
    * deletion gap, or with no history row are dropped (pair with a
    * left_anti on the same condition to audit them).
    *
    * Scale: an EQUI-join on the key (never a range/BNLJ — plan-asserted
    * posture everywhere in this repo) followed by the interval filter;
    * candidates per fact = that key's history rows, which run-collapse
    * keeps proportional to real state changes. Both sides shuffle once on
    * the key.
    */
  def asOfJoin(facts: DataFrame, history: DataFrame, keyCol: String,
               factVersion: Column): DataFrame = {
    val h = history.as("h")
    val f = facts.as("f")
    f.join(h, col(s"f.`$keyCol`") === col(s"h.`$keyCol`"), "inner")
      .filter(col(s"h.$From") <= factVersion &&
        (col(s"h.$To").isNull || col(s"h.$To") > factVersion))
      .drop(col(s"h.`$keyCol`"))
  }

  /** [[asOfJoin]] with a hot-key candidate bound, for NUMERIC versions.
    *
    * The plain as-of join's candidate set per fact is ALL of its key's
    * history rows — run-collapse keeps that proportional to real state
    * changes, but a pathological hot key with thousands of intervals
    * inflates the pre-filter join output by that factor. The standard
    * refinement: carve the version axis into `bucketWidth`-wide buckets,
    * explode each history interval to the buckets it overlaps (open
    * intervals capped at the max fact version — buckets beyond every fact
    * can never match), and join facts on (key, bucket) BEFORE the interval
    * filter. Candidates per fact drop from |key's intervals| to |intervals
    * overlapping one bucket| ≈ bucketWidth / mean-interval-length + 1.
    *
    * Output is row-for-row identical to [[asOfJoin]] (intervals are
    * disjoint per key and a history row meets a fact only in the fact's
    * single bucket, so the explode introduces no duplicates); the trade is
    * history expansion by the buckets-per-interval factor, so pick
    * `bucketWidth` near the hot keys' median interval length. Measured in
    * `Scd2Spec` on a 200-interval hot key: pre-filter candidates fall 50×
    * (4000 → 79) at bucketWidth 4, bounded by per-bucket occupancy instead
    * of the key's full interval count.
    */
  def asOfJoinBucketed(facts: DataFrame, history: DataFrame, keyCol: String,
                       factVersion: Column, bucketWidth: Long): DataFrame = {
    require(bucketWidth >= 1, "bucketWidth must be positive")
    // a literal width folds into the bucket arithmetic — no extra plan node
    asOfJoinBucketedBy(facts, history, keyCol, factVersion,
      attach = identity, width = lit(bucketWidth))
  }

  /** [[asOfJoinBucketed]] with the bucket width DERIVED from the history's
    * own version distribution — usable without pre-knowledge of interval
    * lengths. The width is the approximate median CLOSED-interval length
    * ([[autoBucketWidthFrame]]): near it, history expansion stays ~2
    * buckets per typical interval while a hot key's per-fact candidates
    * are bounded by one bucket's occupancy — the operating point the
    * manual parameter's doc tells callers to aim for. The width travels
    * as a broadcast 1-row scalar (one tiny extra aggregation over the
    * history, no driver collect), so the whole plan stays lazy.
    */
  def asOfJoinBucketedAuto(facts: DataFrame, history: DataFrame,
                           keyCol: String, factVersion: Column): DataFrame = {
    // the sizing decision is OBSERVED, not collected: Dataset.observe
    // piggybacks on the width frame's own execution (zero extra jobs, the
    // plan stays lazy) and lands in GraftMetrics via
    // GraftObservationListener / the streaming listener — the reference
    // reports its sizing decisions the same way (DeclaredMetrics.scala).
    // The floor-dominated flag is the "candidate tightness degraded"
    // signal: on timestamp/LSN version domains the span/4096 floor beats
    // the median and per-fact candidates widen — dashboards should see it.
    // The observation name carries a per-call #suffix: Spark rejects two
    // observations with the same name in one query unless they are the
    // SAME Dataset, so a plan composing two auto joins would otherwise
    // fail analysis; GraftObservationListener gauges under the base name.
    // spark.graft.scd2.widthTelemetry=false drops the observation node
    // entirely (default on: the r16 same-day A/B measured it inside run
    // noise on the bench path — BENCH_VARIANCE_r16.md).
    val widthDf0 = autoBucketWidthFrame(history, facts, factVersion)
    val widthDf = (if (facts.sparkSession.conf
        .get("spark.graft.scd2.widthTelemetry", "true").toBoolean)
      widthDf0.observe(
        s"${graft.streaming.GraftMetrics.Scd2ObservationBase}#${Scd2.observationSeq.incrementAndGet()}",
        max(col("__w")).as("auto_bucket_width"),
        max(col("__floored").cast("long")).as("auto_width_floor_dominated"))
    else widthDf0)
      .select(col("__w"))
    asOfJoinBucketedBy(facts, history, keyCol, factVersion,
      attach = _.crossJoin(broadcast(widthDf)), // 1-row scalar attach
      width = col("__w"))
  }

  /** Hard cap on how many buckets one history interval may explode to
    * under the AUTO width: open (and sentinel-closed) intervals span from
    * their `valid_from` to the fact cap, so with a width chosen only from
    * interval LENGTHS a long-stable key consuming months of facts — or a
    * timestamp/LSN version domain — would explode (cap − from)/width
    * buckets, unboundedly many (past Spark's sequence() limit in the
    * extreme). The auto width therefore never drops below
    * (version span)/4096: worst-case history expansion stays ≤ ~4097 rows
    * per interval whatever the version domain, trading per-fact candidate
    * tightness on pathological distributions for a guaranteed bound.
    */
  private val MaxAutoBucketsPerInterval = 4096L

  /** 1-row (`__w`, `__floored`) frame for [[asOfJoinBucketedAuto]]: the
    * approx median (accuracy 10⁴) of the closed intervals' lengths — the
    * candidate-tightness target — floored by the
    * [[MaxAutoBucketsPerInterval]] span bound and clamped to ≥1. Histories
    * with no closed interval (every key still on its first state) fall
    * back to the observed `valid_from` span. The span runs to the max of
    * the fact cap and the last history open, so facts far beyond the last
    * state change can never inflate the explode. `__floored` is true when
    * the span floor BEAT the median-derived target — the width is then
    * coarser than the interval distribution wanted (typical on
    * timestamp/LSN version domains) and per-fact candidate tightness has
    * silently degraded; [[asOfJoinBucketedAuto]] surfaces it as a gauge.
    */
  def autoBucketWidthFrame(history: DataFrame, facts: DataFrame,
                           factVersion: Column): DataFrame = {
    val hStats = history.agg(
      percentile_approx(col(To).cast("long") - col(From).cast("long"),
        lit(0.5), lit(10000)).cast("long").as("__med"),
      min(col(From).cast("long")).as("__minF"),
      max(col(From).cast("long")).as("__maxF"))
    val fCap = facts.agg(max(factVersion.cast("long")).as("__cap"))
    // greatest() skips NULL operands: empty facts drop the cap term,
    // empty histories leave lit(1)
    hStats.crossJoin(broadcast(fCap)).select( // 1-row × 1-row scalar compose
        coalesce(col("__med"), col("__maxF") - col("__minF") + 1, lit(1L))
          .as("__target"),
        ceil((greatest(col("__cap"), col("__maxF")) - col("__minF") + 1)
          / lit(MaxAutoBucketsPerInterval)).cast("long").as("__floor"))
      .select(
        greatest(col("__target"), col("__floor"), lit(1L)).as("__w"),
        coalesce(col("__floor") > greatest(col("__target"), lit(1L)),
          lit(false)).as("__floored"))
  }

  /** Shared bucketed-join body. `width` is either a literal (manual path —
    * folds into the arithmetic) or a scalar column that `attach` glues onto
    * each side as a broadcast 1-row frame (auto path); the join itself is
    * identical either way.
    */
  private def asOfJoinBucketedBy(facts: DataFrame, history: DataFrame,
                                 keyCol: String, factVersion: Column,
                                 attach: DataFrame => DataFrame,
                                 width: Column): DataFrame = {
    val cap = facts.agg(max(factVersion.cast("long")).as("__cap"))
    val bFrom = floor(col(From).cast("long") / width)
    // exclusive `valid_to` → last covered version is To−1; BOTH open and
    // closed intervals clamp to the cap (buckets beyond every fact can never
    // match, and a closed interval carrying a far-future sentinel close —
    // e.g. Long.MaxValue instead of NULL — would otherwise explode
    // (To−From)/bucketWidth buckets via sequence(), past Spark's array
    // limit); greatest() guards an interval opening after every fact
    // (sequence would otherwise step DOWNWARD and fabricate buckets)
    val bTo = greatest(floor(
      least(coalesce(col(To).cast("long") - 1, col("__cap")), col("__cap"))
        / width), bFrom)
    val h = attach(history.crossJoin(broadcast(cap))) // 1-row scalar attach
      .withColumn("__b", explode(sequence(bFrom, bTo)))
      .drop("__cap", "__w")
      .as("h")
    val f = attach(facts)
      .withColumn("__b", floor(factVersion.cast("long") / width))
      .drop("__w")
      .as("f")
    f.join(h, col(s"f.`$keyCol`") === col(s"h.`$keyCol`") &&
        col("f.__b") === col("h.__b"), "inner")
      .filter(col(s"h.$From") <= factVersion &&
        (col(s"h.$To").isNull || col(s"h.$To") > factVersion))
      .drop(col(s"h.`$keyCol`"))
      .drop("__b")
  }
}
