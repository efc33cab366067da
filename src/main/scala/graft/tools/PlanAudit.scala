package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.optimizer.{BuildLeft, BuildRight}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan, ResolvedHint}
import org.apache.spark.sql.execution.{FilterExec, InputAdapter, ProjectExec, SparkPlan, WholeStageCodegenExec}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, BroadcastQueryStageExec, QueryStageExec}
import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
import org.apache.spark.sql.execution.exchange.{BroadcastExchangeExec, ReusedExchangeExec}
import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}

/** The repo's 100 TB plan-posture checks as a LIBRARY tool — point it at
  * any DataFrame before shipping the job, the way `PlanPostureSpec` points
  * it at every query in CI:
  *
  *   - `cartesian-product` — an all-pairs node; cost is |left|·|right| and
  *     survives no scale-up.
  *   - `nested-loop-join` — a BroadcastNestedLoopJoin whose build side is
  *     NOT provably ≤1 row (the scalar-attach idiom — a no-grouping
  *     aggregate under the broadcast — is exempt). Usually means a non-equi
  *     predicate where a bucketed/banded equi-join was intended.
  *   - `fact-broadcast-hint` — an explicit `broadcast()` hint over a
  *     subtree that reads one of `factTables` with no aggregation below
  *     it: the build side scales with the data and OOMs at some SF
  *     regardless of today's numbers. AQE's own runtime broadcasts never
  *     appear as hints and are exempt by construction.
  *
  * Call with the ANALYZED frame (any frame — the audit runs the planner,
  * not the job). Empty result = the plan posture the rest of this engine
  * holds itself to.
  */
object PlanAudit {

  final case class Finding(kind: String, detail: String)

  def audit(df: DataFrame,
            factTables: Set[String] = Set.empty): Seq[Finding] = {
    val physical = collect(df.queryExecution.executedPlan)
    val cartesian = physical.collect { case c: CartesianProductExec =>
      Finding("cartesian-product", c.simpleStringWithNodeId())
    }
    val bnlj = physical.collect {
      case j: BroadcastNestedLoopJoinExec if !isScalarBroadcast(j) =>
        Finding("nested-loop-join", j.simpleStringWithNodeId())
    }
    val hints = logical(df.queryExecution.analyzed)
      .collect { case h: ResolvedHint if h.hints.strategy.isDefined => h }
      .flatMap { h =>
        // detect fact reads by the relation's FILE LOCATION — node
        // toString omits paths, so a string match would be vacuous
        val reads = logical(h.child).exists {
          case lr: org.apache.spark.sql.execution.datasources.LogicalRelation =>
            lr.relation match {
              case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
                fs.location.rootPaths.exists(p =>
                  factTables.exists(t => p.toString.contains(t)))
              case _ => false
            }
          case _ => false
        }
        val aggregated = logical(h.child).exists(_.isInstanceOf[Aggregate])
        if (reads && !aggregated)
          Some(Finding("fact-broadcast-hint",
            s"broadcast hint over un-aggregated scan of ${factTables.mkString("/")}"))
        else None
      }
    cartesian ++ bnlj ++ hints
  }

  /** Loud variant for CI / pre-deploy gates. */
  def require(df: DataFrame, factTables: Set[String] = Set.empty): Unit = {
    val findings = audit(df, factTables)
    if (findings.nonEmpty) {
      throw new IllegalStateException(
        "plan audit failed:\n" + findings.map(f => s"  [${f.kind}] ${f.detail}").mkString("\n"))
    }
  }

  // `subqueries` surfaces the plans nested inside scalar/IN/EXISTS
  // expression subqueries — without walking them, a cartesian or
  // scale-unsafe BNLJ hiding under a predicate's subquery would escape
  // the audit entirely (children covers only the operator tree proper).
  private def collect(p: SparkPlan): Seq[SparkPlan] = {
    val here = p +: (p.children ++ p.subqueries).flatMap(collect)
    here ++ (p match {
      case a: AdaptiveSparkPlanExec => collect(a.executedPlan)
      case q: QueryStageExec => collect(q.plan)
      case _ => Nil
    })
  }

  private def logical(p: LogicalPlan): Seq[LogicalPlan] =
    p +: (p.children ++ p.subqueries).flatMap(logical)

  /** A BNLJ is scale-safe iff the broadcast side is guaranteed ≤1 row: a
    * no-grouping aggregate under the exchange (the scalar-attach idiom),
    * or a cross/nested-loop COMPOSE of such scalars — two ≤1-row sides
    * joined produce ≤1 row, so a broadcast of the compose is equally safe
    * (the shape `aggA.crossJoin(broadcast(aggB))` that derived-scalar
    * attaches like the SCD2 auto bucket width build).
    */
  def isScalarBroadcast(j: BroadcastNestedLoopJoinExec): Boolean = {
    val buildPlan = j.buildSide match {
      case BuildLeft => j.left
      case BuildRight => j.right
    }
    isScalarPlan(buildPlan)
  }

  /** Is this plan provably ≤1 row? True for a no-grouping aggregate (under
    * row-count-preserving wrappers) and for nested-loop composes of such
    * scalars.
    */
  def isScalarPlan(p: SparkPlan): Boolean = {
    def strip(q: SparkPlan): SparkPlan = q match {
      case e: BroadcastExchangeExec => strip(e.child)
      case s: BroadcastQueryStageExec => strip(s.plan)
      case r: ReusedExchangeExec => strip(r.child)
      case w: WholeStageCodegenExec => strip(w.child)
      case i: InputAdapter => strip(i.child)
      case p2: ProjectExec => strip(p2.child)
      case f: FilterExec => strip(f.child)
      // observe() is a pass-through collector — row-count-preserving by
      // contract, so an observed scalar (the SCD2 auto-width telemetry) is
      // still a scalar
      case c: org.apache.spark.sql.execution.CollectMetricsExec => strip(c.child)
      case other => other
    }
    strip(p) match {
      case a: BaseAggregateExec => a.groupingExpressions.isEmpty
      case j: BroadcastNestedLoopJoinExec =>
        isScalarPlan(j.left) && isScalarPlan(j.right)
      case _ => false
    }
  }
}
