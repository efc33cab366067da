package graft.core

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Merge-key column builders.
  *
  * The reference engine attaches a synthetic `ARCANE_MERGE_KEY` column to every
  * change row: a SHA-256 over the '#'-joined primary-key values. Two encodings
  * exist per source family (see /root/reference
  * src/main/resources/get_select_delta_query.sql:4 — lowercase hex for MSSQL —
  * and src/main/scala/models/batches/BlobBatchCommons.scala:21-36 — Base64 for
  * blob sources). Both are pure Catalyst built-ins here, so they stay inside
  * whole-stage codegen and are pushable into a JDBC source query when needed.
  */
object MergeKey {

  /** Canonical column name carried through staging and into the target table. */
  val MergeKeyColumn = "ARCANE_MERGE_KEY"

  /** '#'-joined string form of the PK tuple (reference QueryProvider.scala:215-218). */
  def concatKeys(pkCols: Seq[Column]): Column =
    concat_ws("#", pkCols.map(_.cast("string")): _*)

  /** Lowercase-hex SHA-256 merge key (MSSQL change-tracking dialect). */
  def mergeKeyHex(pkCols: Seq[Column]): Column =
    lower(sha2(concatKeys(pkCols), 256))

  /** Base64 SHA-256 merge key (blob-source dialect). Hashes the raw digest
    * bytes, matching SHA-256 → Base64 of the binary digest.
    */
  def mergeKeyBase64(pkCols: Seq[Column]): Column =
    base64(unhex(sha2(concatKeys(pkCols), 256)))

  /** Deterministic shard assignment for backfill reads: `pmod(hash(pk), n)`.
    * The reference materializes server-side shard tables with
    * `ABS(CHECKSUM(pk)) % N` (QueryProvider.scala:146-150); on Spark the same
    * partitioning is achieved lazily with per-partition predicates, no copies.
    */
  def shardId(pkCols: Seq[Column], numShards: Int): Column =
    pmod(hash(pkCols: _*), lit(numShards))

  /** JDBC `predicates` array for a sharded parallel read of an MSSQL table,
    * mirroring the reference's server-side `%N=i` filling predicates.
    */
  def mssqlShardPredicates(pkExpr: String, numShards: Int): Array[String] =
    Array.tabulate(numShards)(i =>
      s"ABS(CAST(CHECKSUM($pkExpr) AS BIGINT)) % $numShards = $i")
}
