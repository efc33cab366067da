package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: times every SparkEntry query on SPARK_GRAFT_SF_DIR and
  * prints ONE JSON line {"metric":...,"queries":{...}}. Per-query progress
  * goes to stderr so the stdout contract stays a single line.
  */
object Bench {

  /** Overwrite guard for the committed bench record: the default record
    * path has been clobbered by control/driver runs three times across two
    * rounds, so a git-CLEAN record at the default path is only overwritten
    * when the caller explicitly asks — either by pointing
    * SPARK_GRAFT_BENCH_FILE elsewhere or by setting
    * SPARK_GRAFT_BENCH_OVERWRITE=1. A dirty/untracked record is fair game
    * (it is not the committed measurement).
    */
  private[graft] def shouldWriteRecord(explicitPath: Boolean, overwriteFlag: Boolean,
                                       recordCommittedClean: Boolean): Boolean =
    explicitPath || overwriteFlag || !recordCommittedClean

  /** True when `path` is tracked by git AND unmodified in the working tree
    * (i.e. overwriting it would silently discard a committed measurement).
    * Any git failure reports NOT clean, so a broken git never blocks the
    * record write.
    */
  private[graft] def gitCommittedClean(repoDir: String, path: String): Boolean =
    try {
      def run(cmd: String*): (Int, String) = {
        val p = new ProcessBuilder(cmd: _*).redirectErrorStream(true).start()
        val out = scala.io.Source.fromInputStream(p.getInputStream).mkString
        (p.waitFor(), out.trim)
      }
      val (c1, tracked) = run("git", "-C", repoDir, "ls-files", "--", path)
      val (c2, status) = run("git", "-C", repoDir, "status", "--porcelain", "--", path)
      c1 == 0 && c2 == 0 && tracked.nonEmpty && status.isEmpty
    } catch { case _: Throwable => false }

  /** The commit the measured classes were built from (short rev, `+dirty`
    * when the tree has local edits) — lands in the record JSON so a
    * cross-round per-query read can tell WHICH code it is comparing
    * (the r15 record silently predated two HEAD commits).
    */
  private[graft] def codeRev(repoDir: String): String =
    try {
      def run(cmd: String*): String = {
        val p = new ProcessBuilder(cmd: _*).start()
        val out = scala.io.Source.fromInputStream(p.getInputStream).mkString.trim
        if (p.waitFor() == 0) out else ""
      }
      val rev = run("git", "-C", repoDir, "rev-parse", "--short", "HEAD")
      val dirty = run("git", "-C", repoDir, "status", "--porcelain").nonEmpty
      if (rev.isEmpty) "unknown" else if (dirty) s"$rev+dirty" else rev
    } catch { case _: Throwable => "unknown" }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Warm the engine paths every query shares — parquet scan, shuffle
    // exchange, sort, hash join, window, HOF/codegen pipeline — so one-time
    // JVM/Janino/JIT startup doesn't land on whichever query runs first
    // (queries run alphabetically; without this the first one absorbs
    // seconds of session startup that belong to no query).
    {
      import org.apache.spark.sql.functions._
      import org.apache.spark.sql.expressions.Window
      val li = spark.read.parquet(s"$sfDir/lineitem.parquet").limit(10000)
      val agg = li.groupBy("l_returnflag").agg(sum("l_quantity").as("q"))
      val w = Window.partitionBy(col("l_returnflag")).orderBy(col("q"))
      agg.join(agg.withColumnRenamed("q", "q2"), "l_returnflag")
        .withColumn("rn", row_number().over(w))
        .withColumn("arr", transform(sequence(lit(1), lit(3)), i => xxhash64(i)))
        .orderBy(col("rn"))
        .write.format("noop").mode("overwrite").save()
    }

    // SPARK_GRAFT_BENCH_ONLY=a,b,c limits the run (local iteration aid)
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    // SPARK_GRAFT_BENCH_REPEAT=n times each query n times and records the
    // MIN. Default is 2: this host is a shared VM whose neighbor load
    // inflates single-shot timings ±30% uniformly (the round-9 record
    // drifted 1.19× on untouched queries and spiked one query 4× with
    // zero code change; none of it reproduced on a quiet machine) — the
    // min of two spaced runs is the cheapest estimator that survives a
    // load burst, and the second run also sheds first-run JIT noise.
    val repeat = sys.env.get("SPARK_GRAFT_BENCH_REPEAT").map(_.toInt).getOrElse(2)
    val selected = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
    // Per-query state reset: 59 queries share one JVM, and any cached /
    // checkpointed blocks a query leaves behind (plus the GC pressure they
    // cause) land on every query that runs after it — round 3 recorded
    // 4-8× inflation on late-alphabet queries vs isolated runs. Clearing
    // the cache, dropping every persistent RDD (this is what releases
    // stray localCheckpoint blocks), and letting a full GC settle between
    // queries makes each recorded number match the operator run alone.
    // Residue CHECK after each reset: the round-9 record carried a 4×
    // per-query anomaly that was unreproducible at HEAD (machine load, not
    // state) — but proving that took a judge re-run. Logging leftover
    // persistent RDDs and storage memory makes the next anomalous record
    // self-diagnosing: residue printed → a real leak; silence → look at
    // the machine, not the code.
    def storageUsedMb(): Long =
      spark.sparkContext.getExecutorMemoryStatus.values
        .map { case (max, free) => max - free }.sum >> 20
    def resetState(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
      // two GC passes: the first queues weak-ref'd RDD/shuffle/broadcast
      // cleanups on the ContextCleaner, the second collects what those
      // released — one pass leaves broadcast blocks for the NEXT query's
      // clock (localCheckpoint blocks are persistent RDDs, released
      // synchronously by the unpersist above)
      System.gc()
      System.gc()
      // no persistent-RDD term in the check: the blocking unpersist above
      // just cleared the map, so its size here is 0 by construction (and a
      // PRE-unpersist count would false-positive on the localCheckpoint
      // queries, whose blocks legitimately outlive their action). What CAN
      // linger is broadcast/shuffle storage: the ContextCleaner removes
      // those on its OWN thread after the GC merely enqueues their weak
      // refs — poll briefly for the drain so a clean run can't print a
      // phantom leak.
      var mb = storageUsedMb()
      var waitedMs = 0
      while (mb > 64 && waitedMs < 2000) {
        Thread.sleep(100); waitedMs += 100; mb = storageUsedMb()
      }
      if (mb > 64)
        System.err.println(s"[bench] WARNING state residue after reset: " +
          s"${mb} MB storage still in use")
    }
    resetState() // the warmup block above also left state behind

    // Time a noop-sink write, not .count(): count() lets Catalyst prune
    // columns and drop sorts, so it times a thinner plan than users run —
    // the noop sink executes the full physical plan and discards rows.
    // Failures are loud (stack trace on stderr) and recorded as -1.
    val results = selected.map { case (name, fn) =>
      val runs = (1 to repeat).map { _ =>
        val t0 = System.nanoTime()
        val ok = try {
          fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          true
        } catch {
          case e: Throwable =>
            System.err.println(s"[bench] FAILED $name: $e")
            e.printStackTrace()
            false
        }
        val sec = if (ok) (System.nanoTime() - t0) / 1e9 else -1.0
        resetState() // off the clock — the next run starts on a clean JVM
        sec
      }
      val sec = if (runs.contains(-1.0)) -1.0 else runs.min
      val detail = if (repeat > 1) runs.map(r => f"$r%.2f").mkString(" [", " ", "]") else ""
      System.err.println(f"[bench] $name%-32s $sec%8.2f s$detail")
      name -> sec
    }
    // ANN recall@5 at the bench SF (recorded, not gated, off the clock):
    // the sf0.001 floors in AnnRecallSpec guard regressions, but
    // codebook/LSH drift at the bench scale is only visible if each round
    // RECORDS it — the measured map lands in the JSON line's tail so the
    // approximate-by-contract rows (ann_ivf/lsh/pq_topk) carry a
    // per-round quality number the record's consumer can trend.
    var recallJson = "{}"
    // Per-variant floors AT THE BENCH SCALE (sf0.1 — looser than the
    // sf0.001 spec floors where the approximation behaves differently on
    // the near-uniform synthetic corpus; each sits just under the measured
    // value so a quantizer/routing regression shows up as a violation, not
    // a silently drifting number). Violations land in the record's
    // `recall_floor_violations` field (normally []) AND on stderr — the
    // record stays intact so the round's timings survive, but a
    // regression can never be recorded silently.
    val recallFloors = Map("ivf" -> 0.90, "lsh" -> 0.85, "pq" -> 0.85,
      "ivfpq" -> 0.90, "sq8" -> 0.95)
    var recallViolations = Seq.empty[String]
    try {
      import org.apache.spark.sql.functions.col
      import graft.functions.{ProductQuantization, VectorSimilarity}
      val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      val queries = emb.filter(col("vec_id") < 10)
      def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
        df.select("query_id", "corpus_id").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
      val exact = pairs(VectorSimilarity.bruteForceTopK(emb, queries, 5))
      // an empty exact set (empty table / no matching queries) would turn
      // every ratio below into 0.0/0 = NaN — which throws nothing, so the
      // catch block would not reset recallJson and the record would carry
      // invalid JSON; fail into the existing catch path instead
      require(exact.nonEmpty, "no exact top-k pairs at this SF — recall undefined")
      def recallOf(df: org.apache.spark.sql.DataFrame): Double =
        pairs(df).intersect(exact).size.toDouble / exact.size
      val qArr = queries
        .select(col("vec_id"), col("embedding").cast("array<float>"))
        .collect().map(r => (r.getLong(0), r.getSeq[Float](1).toArray)).sortBy(_._1)
      val model = ProductQuantization.train(emb, "vec_id", "embedding", dim = 64)
      val coarse = VectorSimilarity.trainCoarseCodebook(emb, maxCentroids = 64)
      // all five ANN variants at their production/query settings — the
      // oracle-green exhaustive twins prove correctness; THIS map is the
      // per-round answer-quality trend for the approximate contracts
      val measured = Seq(
        "ivf" -> recallOf(VectorSimilarity.ivfTopK(emb, queries, 5,
          nprobe = 32, maxCentroids = 64)),
        "lsh" -> recallOf(VectorSimilarity.lshTopK(emb, queries, 5,
          nbits = 4, dim = 64, tables = 16)),
        "pq" -> recallOf(ProductQuantization.topK(
          emb, qArr, 5, model, "vec_id", "embedding")),
        // shortlist is the exact-re-rank budget: at this corpus the probed
        // candidate set is ~1000 vectors/query, and ADC ranking error means
        // a 64-deep shortlist truncates real neighbors (measured 0.82);
        // 256 recovers 0.92 against the 0.94 pure-IVF routing ceiling
        "ivfpq" -> recallOf(ProductQuantization.ivfPqTopK(emb, qArr, 5,
          model, coarse, nprobe = 32, idCol = "vec_id", vecCol = "embedding",
          shortlist = 256)),
        "sq8" -> recallOf(VectorSimilarity.sq8TopK(emb, queries, 5)))
      recallViolations = measured.collect {
        case (n, r) if r < recallFloors(n) =>
          f"$n=$r%.3f below floor ${recallFloors(n)}%.2f"
      }
      recallViolations.foreach(v =>
        System.err.println(s"[bench] RECALL FLOOR VIOLATION: $v"))
      System.err.println("[bench] ann_recall@5 " +
        measured.map { case (n, r) => f"$n=$r%.3f" }.mkString(" ") + s" (sf=$sfDir)")
      recallJson = measured
        .map { case (n, r) => f""""$n":$r%.3f""" }.mkString("{", ",", "}")
      resetState()
    } catch {
      case e: Throwable => System.err.println(s"[bench] ann_recall measurement failed: $e")
    }

    // The record's consumer keeps only the TAIL of this line, so field
    // order is survival order: the per-query map comes FIRST sorted by
    // DESCENDING time (the slowest queries are sacrificial there — they
    // reappear in slowest10 at the end), and the aggregate fields +
    // slowest-10 print LAST so any truncation window contains them.
    val byTimeDesc = results.sortBy { case (_, v) => -v }
    val qs = byTimeDesc.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    val slowest = byTimeDesc.take(10)
      .map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val violations = recallViolations
      .map(v => "\"" + v + "\"").mkString("[", ",", "]")
    val line = s"""{"queries":$qs,"n_queries":${results.size},""" +
      s""""slowest10":$slowest,"recall":$recallJson,""" +
      s""""recall_floor_violations":$violations,""" +
      s""""code_rev":"${codeRev("/root/repo")}",""" +
      s""""metric":"total","value":$total,"unit":"sec","sf":"$sfDir"}"""
    println(line)
    // Belt-and-braces: the full untruncated record also lands in the repo
    // as a versioned file the round can commit. A FILTERED run
    // (SPARK_GRAFT_BENCH_ONLY) must not clobber the committed full record
    // unless the caller explicitly pointed SPARK_GRAFT_BENCH_FILE elsewhere
    // — and NO run overwrites a git-committed-clean record at the default
    // path without SPARK_GRAFT_BENCH_OVERWRITE=1 (control/driver runs have
    // destroyed the committed record three times; the stdout line above is
    // always complete, so refusing the file write loses nothing).
    val explicitPath = sys.env.get("SPARK_GRAFT_BENCH_FILE").isDefined
    val recordPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_FILE", "/root/repo/BENCH_FULL.json")
    val partialRun = only.isDefined && !explicitPath
    val guardOk = shouldWriteRecord(explicitPath,
      sys.env.get("SPARK_GRAFT_BENCH_OVERWRITE").exists(_ == "1"),
      gitCommittedClean("/root/repo", recordPath))
    if (!partialRun && !guardOk)
      System.err.println(s"[bench] NOT overwriting committed-clean $recordPath " +
        "(set SPARK_GRAFT_BENCH_OVERWRITE=1 to refresh the record)")
    if (!partialRun && guardOk) try {
      java.nio.file.Files.write(
        java.nio.file.Paths.get(recordPath),
        (line + "\n").getBytes("UTF-8"))
    } catch { case e: Throwable =>
      System.err.println(s"[bench] could not write full record: $e")
    }
    spark.stop()
  }
}
