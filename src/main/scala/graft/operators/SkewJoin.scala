package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted join for pathological key skew.
  *
  * AQE's skew-join splitting (`spark.sql.adaptive.skewJoin.enabled`) is the
  * first line of defense and needs no code; salting is the explicit fallback
  * when one side must be an aggregation input afterwards, or when a handful
  * of keys dominate so hard that even split partitions overwhelm a task.
  *
  * Mechanics: the skewed (big) side gets a random-but-deterministic salt in
  * [0, factor); the small side is replicated `factor` times with every salt
  * value; the join key becomes (key, salt) — each hot key fans out over
  * `factor` tasks. Replication multiplies the small side, so `factor` trades
  * skew relief against broadcast volume — the classic formulation.
  */
object SkewJoin {

  /** Deterministic salt from row content (no rand(): reproducible plans,
    * stable tests): hash of the whole row's key column + a disambiguator.
    */
  private def salt(c: Column, factor: Int, disambiguator: Column): Column =
    pmod(xxhash64(c, disambiguator), lit(factor))

  /** Inner-join `big` with `small` on `key`, salting the hot keyspace over
    * `factor` sub-keys. `rowId` must be a column of `big` that varies per
    * row (any unique-ish id) so salts distribute within a key.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String, rowId: String,
                 factor: Int): DataFrame = {
    require(factor >= 1)
    val salted = big.withColumn("__salt", salt(col(key), factor, col(rowId)))
    val replicated = small
      .withColumn("__salt", explode(array((0 until factor).map(lit): _*)))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }
}
