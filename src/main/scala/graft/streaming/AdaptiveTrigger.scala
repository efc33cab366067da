package graft.streaming

/** Adaptive rows-per-trigger sizing — the useful residue of the reference's
  * MemoryBoundShaper (services/streaming/throughput/MemoryBoundShaper.scala:
  * 29-265, docs/memory_bound_shaper.md) after Tungsten makes its GC-Poisson
  * model unnecessary (SURVEY §2.8 T6).
  *
  * What survives:
  *   - a per-row byte estimate from the target schema and observed string
  *     stats (the reference prices boxed cells; Tungsten rows are tighter,
  *     but the ratio-driven cap logic is the same);
  *   - chunk = (available memory × cutoff) / rowBytes, halved for copy
  *     headroom (reference MemoryBoundShaper.scala:180-208);
  *   - the partition-count clamp — touching fewer target partitions per
  *     commit keeps merge planning and commit metadata small
  *     (MemoryBoundShaper.scala:190-197).
  */
object AdaptiveTrigger {

  /** Rough Tungsten row size from a schema: 8 bytes per fixed-width field +
    * observed average length for variable fields (UnsafeRow layout: 8-byte
    * word per field + var-length region).
    */
  def estimateRowBytes(schema: org.apache.spark.sql.types.StructType,
                       avgStringLen: Int = 32): Long = {
    import org.apache.spark.sql.types._
    8L + schema.fields.map {
      case f if f.dataType == StringType || f.dataType == BinaryType =>
        8L + avgStringLen
      case f => f.dataType match {
        case ArrayType(_, _) | _: StructType | MapType(_, _, _) => 64L
        case _ => 8L
      }
    }.sum
  }

  /** Max rows per trigger so a micro-batch fits the memory budget with
    * headroom. cutoff ∈ (0,1] mirrors the reference's sigmoid output range
    * (0.5-0.8 typical).
    */
  def maxRowsPerTrigger(availableBytes: Long, rowBytes: Long,
                        cutoff: Double = 0.6): Long =
    math.max(1L, (availableBytes * cutoff).toLong / math.max(1L, rowBytes) / 2L)

  /** Partition clamp before a target commit: write at most
    * ceil(partitions/2) files per batch (reference insight: fewer touched
    * partitions per commit = cheaper merge + metadata).
    */
  def commitPartitions(targetPartitions: Int): Int =
    math.max(1, (targetPartitions + 1) / 2)
}
