package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
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
}
