package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge
import graft.functions.expressions.SimHash64Expr

/** 64-bit SimHash fingerprints + Hamming-distance near-dup detection.
  *
  * SimHash packs a document's token set into one long: near-duplicate
  * documents land within a few bits of each other, so dedup is a 64-bit
  * integer comparison instead of a set intersection. Candidate generation
  * uses the pigeonhole trick: split the 64 bits into `maxDist+1` chunks — two
  * fingerprints within `maxDist` bits must agree exactly on at least one
  * chunk — giving an equi-join on chunk values (one shuffle, no n²).
  *
  * Like [[MinHashLsh]], the corpus-scale fingerprint path is a NARROW
  * per-row projection ([[SimHash64Expr]]): a fingerprint is a closed-form
  * function of the token multiset, so no explode and no shuffle — the
  * earlier explode → 65-aggregate groupBy moved |corpus tokens| rows
  * through an exchange for values computable map-side.
  */
object SimHash {

  /** (id, __simhash) per document, map-side. Documents with null/empty token
    * arrays are dropped — identical to the exploded formulation, where they
    * produced no rows to aggregate.
    */
  def fingerprints(df: DataFrame, idCol: String, tokens: Column): DataFrame =
    fingerprintsHashed(df, idCol, transform(tokens, t => xxhash64(t)))

  /** [[fingerprints]] over PRE-HASHED tokens (array<bigint>) — the caller
    * picks the hash family. Used by the oracle-bearing `dedup_simhash`
    * query, whose md5-prefix hashes DuckDB recomputes bit-for-bit.
    */
  def fingerprintsHashed(df: DataFrame, idCol: String, hashes: Column): DataFrame =
    // materialize the hash array in its own projection so the emptiness
    // filter reads it instead of re-evaluating the (possibly expensive —
    // md5-family) token hashing a second time: Filter and Project are
    // separate codegen operators, so a shared expression TREE is not a
    // shared computation
    FanOut(df)
      .select(col(idCol).as("__id"), hashes.as("__h"))
      .filter(size(col("__h")) > 0)
      .select(col("__id"),
        ColumnBridge.column(SimHash64Expr(ColumnBridge.expression(col("__h"))))
          .as("__simhash"))

  /** Expression form for small arrays / tests (interpreted; prefer
    * [[fingerprints]] for corpus scans).
    */
  def simhash64(tokens: Column): Column = {
    val hashes = transform(tokens, t => xxhash64(t))
    val n = size(hashes)
    (0 until 64).map { i =>
      val ones = size(filter(hashes, h => shiftright(h, i).bitwiseAND(1) === 1))
      when(ones * 2 > n, shiftleft(lit(1L), i)).otherwise(lit(0L))
    }.reduce((a, b) => a.bitwiseOR(b))
  }

  /** Hamming distance between two 64-bit fingerprints. */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** Near-dup pairs (idA < idB) with Hamming distance <= maxDist, via
    * pigeonhole chunk join over `maxDist+1` 64/(maxDist+1)-bit chunks.
    *
    * `maxChunkDocs` is the hot-value guard: a chunk value shared by B
    * documents emits B²/2 candidate rows, so one boilerplate cluster can
    * dominate the join at corpus scale. Values above the cap are excluded
    * (anti-join against the small hot set); a genuine near-dup pair within
    * `maxDist` bits still agrees on at least one of the REMAINING chunks
    * unless every agreeing chunk is a mega-cluster value — boilerplate that
    * exact dedup upstream removes more cheaply. 0 disables.
    */
  def nearDupPairs(df: DataFrame, idCol: String, tokens: Column,
                   maxDist: Int = 3, maxChunkDocs: Long = 4096L): DataFrame =
    nearDupPairsHashed(df, idCol, transform(tokens, t => xxhash64(t)),
      maxDist, maxChunkDocs)

  /** [[nearDupPairs]] over PRE-HASHED tokens — see [[fingerprintsHashed]]. */
  def nearDupPairsHashed(df: DataFrame, idCol: String, hashes: Column,
                         maxDist: Int = 3, maxChunkDocs: Long = 4096L): DataFrame =
    pigeonholePairs(fingerprintsHashed(df, idCol, hashes)
      .select(col("__id"), col("__simhash").as("__sh")), maxDist, maxChunkDocs)

  /** Near-dup pairs over an ALREADY-COMPUTED 64-bit fingerprint column —
    * the same pigeonhole funnel for fingerprints that don't come from
    * token simhashing (image perceptual hashes, audio fingerprints, any
    * 64-bit locality-sensitive code). Null fingerprints are excluded (an
    * undecodable payload has no neighborhood).
    */
  def nearDupPairsByFingerprint(df: DataFrame, idCol: String, fingerprint: Column,
                                maxDist: Int = 3, maxChunkDocs: Long = 4096L): DataFrame =
    pigeonholePairs(df.select(col(idCol).as("__id"), fingerprint.as("__sh"))
      .filter(col("__sh").isNotNull), maxDist, maxChunkDocs)

  private def pigeonholePairs(base: DataFrame, maxDist: Int,
                              maxChunkDocs: Long): DataFrame = {
    // 64/(maxDist+1) must be ≥1 bit per chunk: beyond 63 every chunk value
    // degenerates to 0 and the funnel silently returns nothing (hot-pruned)
    // or the n² cartesian it exists to avoid (cap disabled)
    require(maxDist >= 0 && maxDist <= 63,
      s"maxDist must be in [0, 63] for 64-bit pigeonhole chunking, got $maxDist")
    val chunks = maxDist + 1
    val bitsPer = 64 / chunks
    // one exchange on the join key for every consumer below (hot-value agg,
    // anti-join, both self-join sides) — partitioned here, the groupBy and
    // join need no further exchange and the fingerprint pass runs once
    // instead of once per branch
    val chunked0 = base.select(col("__id"), col("__sh"),
      posexplode(array((0 until chunks).map { c =>
        shiftright(col("__sh"), c * bitsPer)
          .bitwiseAND((1L << bitsPer) - 1)
      }: _*)).as(Seq("__chunk", "__val")))
      .repartition(col("__chunk"), col("__val"))
    val chunked =
      if (maxChunkDocs <= 0L) chunked0
      else {
        val hot = chunked0.groupBy(col("__chunk"), col("__val"))
          .agg(count(lit(1)).as("__csz"))
          .filter(col("__csz") > maxChunkDocs)
          .select(col("__chunk"), col("__val"))
        chunked0.join(hot, Seq("__chunk", "__val"), "left_anti")
      }
    val l = chunked.as("l")
    val r = chunked.as("r")
    // hamming-filter BEFORE deduplicating: a pair surfacing from several
    // agreeing chunks carries the same hamming each time, so the filter is
    // dedup-invariant — and it shrinks the dropDuplicates exchange from
    // every candidate pair (Σ chunk-bucket²) to just the true near-dups
    l.join(r,
        col("l.__chunk") === col("r.__chunk") &&
        col("l.__val") === col("r.__val") &&
        col("l.__id") < col("r.__id"))
      .select(col("l.__id").as("id_a"), col("r.__id").as("id_b"),
        hamming(col("l.__sh"), col("r.__sh")).as("hamming"))
      .filter(col("hamming") <= maxDist)
      .dropDuplicates("id_a", "id_b")
  }
}
