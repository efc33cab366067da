package graft.core

import java.util.UUID

/** Deterministic staging/backfill table naming discipline, mirroring the
  * reference's DefaultNameGenerator
  * (/root/reference/src/main/scala/services/naming/DefaultNameGenerator.scala:22-63).
  * Prefix-scoped names let bootstrap clean up leftovers by prefix listing.
  */
object Naming {
  private def sanitize(s: String): String =
    s.toLowerCase(java.util.Locale.ROOT).replaceAll("[^a-z0-9_]", "_")

  def stagingPrefix(streamId: String): String =
    s"stream__${sanitize(streamId)}__stage"

  def stagingTable(streamId: String, uuid: UUID = UUID.randomUUID()): String =
    s"${stagingPrefix(streamId)}__${uuid.toString.replace("-", "_")}"

  def backfillPrefix(streamId: String): String =
    s"backfill__${sanitize(streamId)}"

  def backfillTable(streamId: String, backfillId: String): String =
    s"${backfillPrefix(streamId)}__${sanitize(backfillId)}"

  def shardTable(streamId: String, backfillId: String, shardId: Int): String =
    s"${backfillTable(streamId, backfillId)}__shard__$shardId"

  /** camelCase → snake_case (reference StringExtensions.scala:15-18), used
    * when mapping CDM/entity attribute names onto warehouse columns.
    */
  def camelCaseToSnakeCase(s: String): String =
    s.replaceAll("([a-z0-9])([A-Z])", "$1_$2").toLowerCase(java.util.Locale.ROOT)

  def isStagingFor(streamId: String, tableName: String): Boolean =
    tableName.startsWith(stagingPrefix(streamId))

  def isBackfillFor(streamId: String, tableName: String): Boolean =
    tableName.startsWith(backfillPrefix(streamId))
}
