package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing — the last step of a training-data pipeline: lay the
  * (pre-chunked) corpus out as one deterministic token stream and cut it
  * into fixed-size context windows ("bins"). This is GPT-style packing:
  * items are concatenated in order and a bin boundary falls every
  * `maxTokens` tokens, so an item's bin is simply which window its first
  * token lands in. Downstream writers group by (shard, bin) to emit one
  * training sequence per bin.
  *
  * Scale shape: a single global token stream would need one global
  * cumulative sum (a single-partition window). Instead the corpus is
  * split into `shards` independent streams by an md5 bucket of the shard
  * key, and each shard packs in parallel — same packing quality (bins are
  * full except each shard's last), deterministic, and the window runs
  * per-shard. The md5 bucket is the engine-portable device this repo's
  * sampling uses, so an external system (or the DuckDB oracle) reproduces
  * the exact same bins.
  */
object Packing {

  /** Adds `shard`, `bin`, `bin_offset` to `df`:
    *
    *   - `shard`   = md5-bucket of `shardKey` mod `shards`;
    *   - `bin`     = floor(tokens-before-this-item-in-shard / maxTokens);
    *   - `bin_offset` = tokens-before mod maxTokens (where in its window
    *     the item starts).
    *
    * `orderBy` must be a deterministic total order within a shard (e.g.
    * document id + chunk index). Items longer than `maxTokens` still get
    * the window their first token lands in (callers chunk upstream —
    * [[TextFunctions.tokenChunks]] — so item length is bounded).
    */
  def packOffsets(df: DataFrame, tokens: Column, maxTokens: Long,
                  orderBy: Seq[Column], shardKey: Column,
                  shards: Int = 1024): DataFrame = {
    require(maxTokens >= 1, "a bin must hold at least one token")
    require(shards >= 1, "need at least one shard")
    val shard = (conv(substring(md5(shardKey.cast("string")), 1, 4), 16, 10)
      .cast("int") % shards).as("shard")
    val w = Window.partitionBy(col("shard")).orderBy(orderBy: _*)
    val before = sum(tokens.cast("long")).over(w) - tokens.cast("long")
    df.withColumn("shard", shard)
      .withColumn("bin", floor(before / maxTokens))
      .withColumn("bin_offset", before % maxTokens)
  }
}
