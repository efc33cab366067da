package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for all suites (one JVM-wide session). */
trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSpec.session
  lazy val sf: String = "/root/testdata/sf0.001"

  /** events with ts normalized to µs TIMESTAMP_NTZ regardless of how the
    * driver generated the parquet: INT64 TIMESTAMP(NANOS) reads as a long
    * under nanosAsLong (truncate ns→µs), TIMESTAMP(MICROS) reads as
    * timestamp_ntz already. Specs must not assume either encoding — the
    * generator has switched between rounds.
    */
  def eventsNtz(dir: String = sf): DataFrame = {
    val df = spark.read.parquet(s"$dir/events.parquet")
    if (df.schema("ts").dataType == LongType)
      df.withColumn("ts", timestamp_micros(expr("ts div 1000")).cast("timestamp_ntz"))
    else df.withColumn("ts", col("ts").cast("timestamp_ntz"))
  }

  /** events with ts as epoch MICROSECONDS (long) — the numeric-asof fixtures.
    * unix_micros only takes TIMESTAMP; the ntz→ltz cast is value-preserving
    * because the session timezone is pinned to UTC.
    */
  def eventsMicros(dir: String = sf): DataFrame =
    eventsNtz(dir).withColumn("ts", unix_micros(col("ts").cast("timestamp")))
}

object SparkSpec {
  lazy val session: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-tests")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
