package graft

import org.apache.spark.sql.catalyst.optimizer.{BuildLeft, BuildRight}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan, ResolvedHint}
import org.apache.spark.sql.execution.{FilterExec, InputAdapter, ProjectExec, SparkPlan, WholeStageCodegenExec}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, BroadcastQueryStageExec}
import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
import org.apache.spark.sql.execution.exchange.{BroadcastExchangeExec, ReusedExchangeExec}
import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}

/** 100 TB plan-posture guard over EVERY SparkEntry query: the physical plan
  * properties that stay true at any scale factor are asserted here, at
  * sf0.001, so a regression (someone reintroduces a fact-side broadcast
  * hint or an accidental cartesian) fails fast in CI instead of surfacing
  * as an OOM on a cluster.
  *
  * Two checks:
  *   1. No cartesian / broadcast-nested-loop node, except for the declared
  *      exact-verification kernels whose non-equi self-join IS the
  *      semantics (`vec_threshold_join`) or whose broadcast side is a
  *      bounded query batch (`knn_cosine_topk` — brute-force baseline with
  *      a =!= predicate).
  *   2. No broadcast HINT (logical-plan ResolvedHint) whose subtree reads a
  *      fact table (lineitem/orders/events) without a prior aggregation:
  *      hints on such inputs are scale bugs even when they survive at test
  *      size. AQE's own runtime choices are exempt — deciding to broadcast
  *      a frame it MEASURED as small is exactly what we want at every
  *      scale, so the check reads the logical plan where only explicit
  *      hints appear.
  */
class PlanPostureSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  // exact kernels / bounded-broadcast baselines where a nested-loop node is
  // the declared semantics, not an accident: vec_threshold_join (exact
  // verification kernel), knn_cosine_topk (bounded query batch),
  // dedup_semantic (LIMIT-k seed side broadcast against the streaming
  // corpus — the SemDeDup assignment)
  private val nestedLoopAllowed =
    Set("vec_threshold_join", "knn_cosine_topk", "dedup_semantic",
      "corpus_cluster_profile", "ann_sq8_topk")

  /** A BNLJ is scale-safe iff its broadcast side is guaranteed ≤1 row: the
    * scalar-attach idiom (a no-grouping aggregate under row-count-
    * preserving wrappers), or a nested-loop COMPOSE of such scalars (two
    * ≤1-row sides joined are ≤1 row — the derived-scalar shape the SCD2
    * auto bucket width builds). Delegates to the library tool so CI and
    * the user-facing `PlanAudit.audit` enforce the identical rule. */
  private def isScalarBroadcast(j: BroadcastNestedLoopJoinExec): Boolean =
    graft.tools.PlanAudit.isScalarBroadcast(j)

  private def collectNodes(p: SparkPlan): Seq[SparkPlan] = {
    val self = p match {
      case a: AdaptiveSparkPlanExec => collectNodes(a.executedPlan)
      case other => Seq(other)
    }
    self ++ p.children.flatMap(collectNodes) ++
      p.subqueries.flatMap(collectNodes)
  }

  test("negative control: the detector fires on a hinted un-aggregated fact scan") {
    import org.apache.spark.sql.functions._
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val ord = spark.read.parquet(s"$sfDir/orders.parquet")
    val bad = li.join(broadcast(ord), col("l_orderkey") === col("o_orderkey"))
    def logicalNodes(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan):
        Seq[org.apache.spark.sql.catalyst.plans.logical.LogicalPlan] =
      p +: p.children.flatMap(logicalNodes)
    val hinted = logicalNodes(bad.queryExecution.analyzed)
      .collect { case h: ResolvedHint if h.hints.strategy.isDefined => h }
      .filter(h => logicalNodes(h.child).exists(n =>
        n.nodeName.contains("Relation") && n.toString.contains("orders")))
    assert(hinted.nonEmpty, "a broadcast(orders) hint must be visible to the detector")
  }

  test("negative control: scalar-broadcast exemption rejects a multi-row BNLJ, accepts a global-agg one") {
    import org.apache.spark.sql.functions._
    val cust = spark.read.parquet(s"$sfDir/customer.parquet")
    val nat = spark.read.parquet(s"$sfDir/nation.parquet")

    // multi-row broadcast side (a scan) — must stay banned
    val crossDf = cust.crossJoin(broadcast(nat))
    crossDf.write.format("noop").mode("overwrite").save()
    val crossBnlj = collectNodes(crossDf.queryExecution.executedPlan)
      .collect { case j: BroadcastNestedLoopJoinExec => j }
    assert(crossBnlj.nonEmpty, "cross join should plan a BNLJ for this control to be meaningful")
    assert(crossBnlj.forall(!isScalarBroadcast(_)),
      "a scan-fed BNLJ must NOT qualify for the scalar exemption")

    // one-row broadcast side (global aggregate) — the scalar-attach idiom
    val avgBal = cust.agg(avg(col("c_acctbal")).as("avg_bal")).withColumn("jk", lit(1))
    val scalarDf = cust.withColumn("jk", lit(1)).join(broadcast(avgBal), "jk")
      .filter(col("c_acctbal") > col("avg_bal"))
    scalarDf.write.format("noop").mode("overwrite").save()
    val scalarBnlj = collectNodes(scalarDf.queryExecution.executedPlan)
      .collect { case j: BroadcastNestedLoopJoinExec => j }
    assert(scalarBnlj.nonEmpty, "constant-key scalar attach should fold to a BNLJ")
    assert(scalarBnlj.forall(isScalarBroadcast),
      "a global-aggregate broadcast side must qualify for the scalar exemption")
  }

  // Pushdown + pruning posture on probe queries where both are certain:
  // the filter must reach the parquet scan (PushedFilters non-empty on the
  // probed table) and the scan must not read columns the query never
  // touches — a scan reading all 16 lineitem columns for a 4-column
  // aggregate is the brief's named anti-pattern even when it "works".
  private val pushdownProbes = Seq(
    // (query, probed table, max columns the scan may read)
    ("q6_revenue_forecast", "lineitem", 5),
    ("q12_priority_shipping", "lineitem", 6),
    ("q4_order_priority", "orders", 4))

  // Pruning-only probes (no filter to push, but the scan must still read
  // just the columns the query touches): the round-11 map-side queries
  // project 1-2 documents/lineitem columns — a scan reading all of them
  // would be the brief's anti-pattern hiding behind a cheap query.
  private val pruningProbes = Seq(
    ("mm_container_demux", "documents", 1),   // doc_id only
    ("doc_nfc_normalize", "documents", 2),    // doc_id, text
    ("doc_html_strip", "documents", 2),
    ("text_script_profile", "documents", 2),
    ("layout_zorder", "lineitem", 2),         // l_partkey, l_suppkey
    ("layout_hilbert", "lineitem", 2),
    // r12: retrieval + graph + audit queries touch 1-3 columns each
    ("text_tfidf_topterms", "documents", 2),  // doc_id, text
    ("text_bm25_search", "documents", 2),
    ("graph_pagerank", "lineitem", 2),        // l_orderkey, l_suppkey
    ("graph_pagerank", "orders", 2),          // o_orderkey, o_custkey
    ("vec_label_centroids", "embeddings", 2), // label, embedding
    ("corpus_expectations", "documents", 4),  // text, doc_id, n_chars, lang
    // r12 second wave: SCD2 / drift / pairs / ids / window trio
    ("corpus_drift_psi", "documents", 3),     // doc_id, n_chars, lang
    ("doc_dense_ids", "documents", 1),        // doc_id only
    ("pairs_negative_sample", "documents", 2),// doc_id, source
    ("q_orders_decile", "orders", 3),         // key, priority, totalprice
    ("q_cube_pricing", "lineitem", 3),        // rf, ls, quantity
    ("m5_scd2_history", "events", 3),         // user_id, event_id, event_type
    ("q_events_winsorize", "events", 3),      // event_id, event_type, value
    ("q_events_rolling_1h", "events", 4),     // user_id, event_id, ts, value
    ("text_index_search", "documents", 2),    // doc_id, text (index build)
    ("q_events_funnel", "events", 3),         // user_id, ts, event_type
    ("m5_scd2_temporal_join", "events", 3),   // user_id, event_id, event_type
    ("m5_scd2_temporal_join_bucketed", "events", 3),
    ("retrieval_eval_metrics", "documents", 2), // doc_id, text
    ("doc_sample_weighted", "documents", 3))  // doc_id, n_chars, source

  // pruning probes must also see scans buried inside cached relations
  // (graph_pagerank persists its edge list, so the parquet scans live in
  // the InMemoryRelation's cached plan, not the outer executed plan)
  private def collectWithCached(p: SparkPlan): Seq[SparkPlan] = {
    val all = collectNodes(p)
    all ++ all.flatMap {
      case m: org.apache.spark.sql.execution.columnar.InMemoryTableScanExec =>
        collectWithCached(m.relation.cachedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        collectWithCached(q.plan)
      case _ => Nil
    }
  }

  for ((name, table, maxCols) <- pruningProbes) {
    test(s"$name: $table scan reads at most $maxCols columns") {
      val df = SparkEntry.queries(name)(spark, sfDir)
      df.write.format("noop").mode("overwrite").save()
      val scans = collectWithCached(df.queryExecution.executedPlan)
        .collect {
          case s: org.apache.spark.sql.execution.FileSourceScanExec
            if s.relation.location.rootPaths.exists(_.toString.contains(table)) => s
        }
      assert(scans.nonEmpty, s"no parquet scan of $table in the plan")
      scans.foreach { s =>
        assert(s.requiredSchema.size <= maxCols,
          s"$table scan reads ${s.requiredSchema.size} columns " +
            s"(${s.requiredSchema.fieldNames.mkString(",")}); pruning regressed")
      }
    }
  }

  for ((name, table, maxCols) <- pushdownProbes) {
    test(s"$name: filters pushed to the $table scan; columns pruned") {
      val df = SparkEntry.queries(name)(spark, sfDir)
      df.write.format("noop").mode("overwrite").save()
      val scans = collectNodes(df.queryExecution.executedPlan)
        .collect {
          case s: org.apache.spark.sql.execution.FileSourceScanExec
            if s.relation.location.rootPaths.exists(_.toString.contains(table)) => s
        }
      assert(scans.nonEmpty, s"no parquet scan of $table in the plan")
      assert(scans.exists(_.metadata.get("PushedFilters").exists(_ != "[]")),
        s"no filter pushed down to the $table scan")
      scans.foreach { s =>
        assert(s.requiredSchema.size <= maxCols,
          s"$table scan reads ${s.requiredSchema.size} columns " +
            s"(${s.requiredSchema.fieldNames.mkString(",")}); pruning regressed")
      }
    }
  }

  for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
    test(s"$name: no accidental cartesian/BNLJ; no fact-scan broadcast hint") {
      val df = fn(spark, sfDir)
      df.write.format("noop").mode("overwrite").save() // finalize AQE plan
      val nodes = collectNodes(df.queryExecution.executedPlan)

      if (!nestedLoopAllowed(name)) {
        val bad = nodes.filter {
          case _: CartesianProductExec          => true
          case j: BroadcastNestedLoopJoinExec   => !isScalarBroadcast(j)
          case _                                => false
        }
        assert(bad.isEmpty,
          s"unexpected non-equi join nodes: ${bad.map(_.nodeName).mkString(", ")}")
      }

      // A broadcast HINT over a subtree that reads a fact table with no
      // aggregate below the hint means someone pinned a build side whose
      // size scales with the data — an OOM at 100× regardless of today's
      // numbers. Only explicit hints appear as ResolvedHint in the
      // ANALYZED logical plan (the optimizer folds them into JoinHint);
      // AQE runtime broadcasts never do. Detection delegated to the
      // user-facing PlanAudit tool (location-based fact matching — a node
      // toString match would be vacuous, the path never prints).
      val hintFindings = graft.tools.PlanAudit
        .audit(df, factTables = Set("lineitem", "orders", "events"))
        .filter(_.kind == "fact-broadcast-hint")
      assert(hintFindings.isEmpty,
        s"broadcast hint over un-aggregated fact-table subtree: $hintFindings")
    }
  }
}
