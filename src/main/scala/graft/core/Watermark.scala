package graft.core

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.time.Instant

/** Source watermarks: the resume token a CDC stream commits after every
  * successfully merged micro-batch.
  *
  * The reference models these as `SourceWatermark[V <: String]` with JSON
  * serialization, persisted in the target Iceberg table's `comment` property
  * (/root/reference/src/main/scala/services/streaming/base/SourceWatermark.scala:12-59;
  * commit path WatermarkProcessingExtensions.scala:13-39). On Spark the same
  * contract is a small JSON payload committed *after* the merge — replays are
  * harmless because every merge dialect is version-guarded (idempotent).
  */
final case class Watermark(kind: String, version: String, timestampMillis: Long)
    extends Ordered[Watermark] {

  /** Versions compare lexicographically, as in the reference (versions are
    * zero-padded numerics or ISO timestamps, both order correctly as strings).
    */
  override def compare(that: Watermark): Int = version.compareTo(that.version)

  def ageMillis(nowMillis: Long): Long = math.max(0L, nowMillis - timestampMillis)

  def toJson: String = {
    def esc(s: String) = s.flatMap {
      case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
      case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString
    }
    s"""{"kind":"${esc(kind)}","version":"${esc(version)}","timestamp":$timestampMillis}"""
  }
}

object Watermark {
  /** Watermark kinds mirroring the reference's implementations. */
  val MsSql = "mssql-ct"        // change-tracking version (numeric string)
  val Synapse = "synapse-link"  // batch-folder timestamp yyyy-MM-ddTHH.mm.ssZ
  val Blob = "blob-source"      // max blob createdOn epoch millis
  val TimestampOnly = "timestamp-only"

  /** Parse a watermark payload. Uses [[MiniJson]] rather than a regex so
    * every string `toJson` can emit round-trips exactly (sequential
    * `String.replace` unescaping mangles a literal backslash-n into a
    * newline and cannot reverse the `\\uXXXX` escapes `toJson` produces for
    * control characters). Returns None for anything that is not a JSON
    * object carrying a string `kind`/`version` and numeric `timestamp`.
    */
  def fromJson(json: String): Option[Watermark] =
    try MiniJson.parse(json) match {
      case MiniJson.JObj(f) =>
        for {
          k <- f.get("kind").collect { case MiniJson.JStr(s) => s }
          v <- f.get("version").collect { case MiniJson.JStr(s) => s }
          // STRICT integral form only (the raw literal text must parse as a
          // Long): MiniJson.asLong's general fallback would silently
          // truncate 1.9 → 1 or clamp an out-of-range value — exactly the
          // corrupt-state acceptance the stores above are hardened to refuse
          ts <- f.get("timestamp").collect { case n: MiniJson.JNum => n.raw.toLongOption }.flatten
        } yield Watermark(k, v, ts)
      case _ => None
    } catch { case scala.util.control.NonFatal(_) => None }

  def mssql(version: Long, now: Instant = Instant.now()): Watermark =
    Watermark(MsSql, f"$version%020d", now.toEpochMilli)

  def blob(createdOnMillis: Long, now: Instant = Instant.now()): Watermark =
    Watermark(Blob, f"$createdOnMillis%020d", now.toEpochMilli)

  /** Blob watermark carrying the BOUNDARY SET: short hashes of the files
    * already read AT the max modification time. Blob stores stamp mod
    * times at coarse (often 1 s) granularity, so "new" files can share the
    * committed timestamp — an exclusive `>` skips them forever, an
    * inclusive `>=` alone re-reads the boundary every poll (a busy loop).
    * Carrying which boundary files were consumed gives inclusive semantics
    * without re-reads. The zero-padded millis stay the version's prefix,
    * so lexicographic watermark ordering is unchanged; the set is capped
    * ([[BlobBoundaryCap]]) — a boundary overflowing it degrades to the
    * exclusive comparison for that timestamp (hundreds of files sharing
    * one millisecond), never to unbounded state. Overflow is recorded as
    * the EXPLICIT marker [[BlobBoundaryOverflow]], never inferred from the
    * stored size: inferring from `size == cap` is ambiguous when exactly
    * cap files legitimately share the boundary timestamp — the reader
    * would degrade to exclusive semantics and permanently skip a
    * genuinely-late same-timestamp file, the loss mode the boundary set
    * exists to close. At most cap−1 real hashes are ever stored; once a
    * timestamp overflows, the marker is carried forward for as long as
    * that timestamp remains the boundary.
    */
  def blobWithBoundary(createdOnMillis: Long, boundaryHashes: Seq[String],
                       now: Instant = Instant.now()): Watermark = {
    val distinct = boundaryHashes.distinct
    val overflowed = distinct.contains(BlobBoundaryOverflow) ||
      distinct.size > BlobBoundaryCap - 1
    val stored =
      if (overflowed) Seq(BlobBoundaryOverflow)
      else distinct.sorted
    val suffix = if (stored.isEmpty) "" else stored.mkString("|", ",", "")
    Watermark(Blob, f"$createdOnMillis%020d$suffix", now.toEpochMilli)
  }

  /** Max boundary-set entries carried in a blob watermark (~4.5 KB at 8
    * hex chars + separator — fine for a table property or sidecar file).
    */
  val BlobBoundaryCap = 512

  /** Explicit boundary-overflow marker: stored INSTEAD of the hashes when
    * more than cap−1 files share the boundary timestamp. Cannot collide
    * with a real entry ([[blobFileHash]] emits hex only). A reader seeing
    * it treats the boundary timestamp as fully consumed (exclusive
    * comparison); legacy watermarks written at exactly the old cap keep
    * their old degrade semantics via the size check in the reader.
    */
  val BlobBoundaryOverflow = "!"

  /** Parse a blob watermark version into (maxModMillis, boundary hashes).
    * Accepts the plain legacy form (no boundary) and returns None for a
    * version whose millis prefix is unparseable — the caller must treat
    * that as corrupt state, NOT as a fresh start.
    */
  def blobParts(version: String): Option[(Long, Set[String])] = {
    val (head, tail) = version.span(_ != '|')
    head.toLongOption.map { millis =>
      val hashes =
        if (tail.isEmpty) Set.empty[String]
        else tail.drop(1).split(',').filter(_.nonEmpty).toSet
      (millis, hashes)
    }
  }

  /** Short stable file-identity hash for the blob boundary set. */
  def blobFileHash(path: String): String = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(path.getBytes(StandardCharsets.UTF_8))
    d.take(4).map(b => f"$b%02x").mkString
  }
}

/** Where watermarks live between runs. The reference uses the Iceberg table
  * `comment` property; locally a sidecar file next to the target directory
  * plays the same role, and a catalog-table-property impl slots in unchanged
  * on Iceberg/Delta deployments (ALTER TABLE ... SET TBLPROPERTIES).
  */
trait WatermarkStore {
  def get(target: String): Option[Watermark]
  def set(target: String, wm: Watermark): Unit
}

final class InMemoryWatermarkStore extends WatermarkStore {
  private val state = new java.util.concurrent.ConcurrentHashMap[String, Watermark]()
  override def get(target: String): Option[Watermark] = Option(state.get(target))
  override def set(target: String, wm: Watermark): Unit = state.put(target, wm)
}

/** Catalog-table-property store — the reference's actual mechanism (K7/T3:
  * watermark JSON in the Iceberg table `comment`/property,
  * IcebergTablePropertyManager.scala:40-61) via Spark SQL
  * `ALTER TABLE ... SET TBLPROPERTIES`. Works against any session-catalog or
  * Iceberg/Delta table; `target` is the catalog table name.
  */
final class TablePropertyWatermarkStore(spark: org.apache.spark.sql.SparkSession,
                                        propertyKey: String = "graft.watermark")
    extends WatermarkStore {

  override def get(target: String): Option[Watermark] = {
    val props = spark.sql(s"SHOW TBLPROPERTIES $target").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    props.get(propertyKey).map { raw =>
      Watermark.fromJson(raw).getOrElse(throw new IllegalStateException(
        s"corrupt watermark property '$propertyKey' on $target: $raw — " +
          "refusing to treat corrupt state as a fresh start"))
    }
  }

  override def set(target: String, wm: Watermark): Unit = {
    val json = wm.toJson.replace("'", "''")
    spark.sql(s"ALTER TABLE $target SET TBLPROPERTIES ('$propertyKey' = '$json')")
  }
}

/** Sidecar-file store: `<dir>/_graft_watermark.json`, written atomically
  * (tmp + move) so a crash mid-commit leaves the previous watermark intact —
  * the version-guarded merge makes the resulting replay a no-op.
  */
final class FileWatermarkStore(baseDir: String) extends WatermarkStore {
  private def pathFor(target: String): Path =
    Paths.get(baseDir, target.replaceAll("[^A-Za-z0-9_.-]", "_") + ".watermark.json")

  override def get(target: String): Option[Watermark] = {
    val p = pathFor(target)
    if (Files.exists(p)) {
      val raw = new String(Files.readAllBytes(p), StandardCharsets.UTF_8)
      Some(Watermark.fromJson(raw).getOrElse(throw new IllegalStateException(
        s"corrupt watermark file $p: $raw — refusing to treat corrupt state " +
          "as a fresh start (a fresh start would re-ingest or skip data)")))
    } else None
  }

  override def set(target: String, wm: Watermark): Unit = {
    val p = pathFor(target)
    Files.createDirectories(p.getParent)
    val tmp = p.resolveSibling(p.getFileName.toString + ".tmp")
    Files.write(tmp, wm.toJson.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, p, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }
}
