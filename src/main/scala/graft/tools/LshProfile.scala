package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.{MinHashLsh, TextFunctions}

/** Stage-level profiler for the MinHash+LSH funnel: prints per-stage row
  * counts and wall times so perf work targets the measured bottleneck.
  */
object LshProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def timed[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      System.err.println(f"[profile] $name%-40s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    val numHashes = 64; val bands = 16; val r = numHashes / bands
    val df = spark.read.parquet(s"$sfDir/documents.parquet")
    timed("read+count docs")(df.count())

    val shingleHashes = TextFunctions.shingleHashes(col("text"), 5)
    val exploded = df.select(col("doc_id").as("__id"), explode(shingleHashes).as("__h"))
    timed("exploded shingles count")(System.err.println("  rows=" + exploded.count()))

    val aggs = (0 until numHashes).map(i => min(xxhash64(lit(i), col("__h"))).as(s"__mh$i"))
    val sigs = exploded.groupBy(col("__id")).agg(aggs.head, aggs.tail: _*)
      .withColumn("__sig", array((0 until numHashes).map(i => col(s"__mh$i")): _*))
      .select(col("__id"), col("__sig"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    timed("signatures (explode+64 min aggs)")(System.err.println("  rows=" + sigs.count()))

    val banded = sigs.select(col("__id"),
      posexplode(MinHashLsh.bandBuckets(col("__sig"), bands, r)).as(Seq("__band", "__bucket")))
    timed("banded count")(System.err.println("  rows=" + banded.count()))

    val rawPairs = banded.as("l").join(banded.as("r"),
      col("l.__band") === col("r.__band") &&
      col("l.__bucket") === col("r.__bucket") &&
      col("l.__id") < col("r.__id"))
    timed("raw banded-join collisions")(System.err.println("  rows=" + rawPairs.count()))

    val cand = rawPairs
      .groupBy(col("l.__id").as("id_a"), col("r.__id").as("id_b"))
      .agg(count(lit(1)).as("__nbands"))
      .filter(col("__nbands") >= 2)
      .select(col("id_a"), col("id_b"))
    timed("candidates after nbands>=2")(System.err.println("  rows=" + cand.count()))

    val estimated = cand
      .join(sigs.select(col("__id").as("id_a"), col("__sig").as("sig_a")), "id_a")
      .join(sigs.select(col("__id").as("id_b"), col("__sig").as("sig_b")), "id_b")
      .withColumn("__est",
        size(filter(zip_with(col("sig_a"), col("sig_b"), (x, y) => x === y), p => p))
          .cast("double") / numHashes)
      .filter(col("__est") >= 0.8 - 0.2)
      .select(col("id_a"), col("id_b"))
    timed("estimate survivors")(System.err.println("  rows=" + estimated.count()))

    val full = MinHashLsh.nearDupPairsHashed(df, "doc_id", shingleHashes,
      numHashes = 64, bands = 16, threshold = 0.8)
    timed("FULL nearDupPairsHashed end-to-end")(System.err.println("  rows=" + full.count()))
    timed("FULL again (2nd run)")(System.err.println("  rows=" + full.count()))

    spark.stop()
  }
}
