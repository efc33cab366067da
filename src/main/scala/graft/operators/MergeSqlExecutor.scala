package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.{ColumnBridge, PlanBridge}
import org.apache.spark.sql.types.StructField

/** Executes a `MERGE INTO` statement against plain DataFrame-backed
  * relations (temp views, parquet tables) — no Iceberg/Delta catalog
  * required.
  *
  * Spark's own parser turns the statement into a [[MergeIntoTable]] logical
  * plan; this interpreter lowers that plan onto the engine's proven merge
  * shape (one full-outer join on the merge condition, [[CdcMerge]]'s plan),
  * applying the WHEN clauses in statement order with standard MERGE
  * semantics: the first clause whose condition holds wins per row, matched
  * rows with no applicable clause are kept, source-only rows with no
  * applicable NOT MATCHED clause are dropped.
  *
  * This is what closes the loop on [[MergeSqlBuilder]]: the generated SQL
  * text is not just golden-tested, it EXECUTES — parsed by Spark, resolved
  * against real data, and result-checked against the DataFrame dialects in
  * `MergeSqlExecutorSpec`. On a real deployment with a transactional
  * catalog the same strings go straight to `spark.sql(...)`; reference
  * behavior contract: /root/reference/src/main/scala/services/merging/
  * JdbcMergeServiceClient.scala:62-91.
  *
  * Scale: identical plan to [[CdcMerge.applyChanges]] — both sides shuffle
  * once on the merge key, clause conditions and assignment values are
  * ordinary Catalyst expressions inside the post-join projection (codegen,
  * no UDFs, no per-clause passes).
  */
object MergeSqlExecutor {

  /** Parse `mergeSql` and return the post-merge state of the target as a
    * DataFrame (the caller decides where to write it — temp view swap,
    * [[graft.streaming.ParquetTarget]], bucketed table, ...).
    */
  def merged(spark: SparkSession, mergeSql: String): DataFrame = {
    val plan = spark.sessionState.sqlParser.parsePlan(mergeSql) match {
      case m: MergeIntoTable => m
      case other => throw new IllegalArgumentException(
        s"not a MERGE INTO statement: ${other.getClass.getSimpleName}")
    }
    val (tAlias, tPlan) = unalias(plan.targetTable)
    val (sAlias, sPlan) = unalias(plan.sourceTable)

    val target = PlanBridge.ofRows(spark, tPlan)
    val source = PlanBridge.ofRows(spark, sPlan)
    val fields = target.schema.fields.toSeq

    val t = target.withColumn("__t_present", lit(true)).as(tAlias)
    val s = source.withColumn("__s_present", lit(true)).as(sAlias)
    val joined = t.join(s, ColumnBridge.column(plan.mergeCondition), "full_outer")

    val tPresent = coalesce(col(s"$tAlias.__t_present"), lit(false))
    val sPresent = coalesce(col(s"$sAlias.__s_present"), lit(false))
    def tc(n: String): Column = col(s"$tAlias.`$n`")
    def sc(n: String): Column = col(s"$sAlias.`$n`")

    // One tag per (clause list, index); rows resolve to the FIRST clause
    // whose condition holds, per MERGE semantics. "keep" carries the target
    // row through, "drop" elides a source-only row with no INSERT clause.
    def chain(actions: Seq[MergeAction], prefix: String, default: String): Column =
      actions.zipWithIndex.foldRight(lit(default): Column) { case ((a, i), els) =>
        val cond = actionCondition(a).map(ColumnBridge.column).getOrElse(lit(true))
        when(cond, lit(s"$prefix$i")).otherwise(els)
      }
    val tag = when(tPresent && sPresent, chain(plan.matchedActions, "m", "keep"))
      .when(sPresent, chain(plan.notMatchedActions, "i", "drop"))
      .otherwise(chain(plan.notMatchedBySourceActions, "u", "keep"))

    val dropTags: Seq[String] = "drop" +:
      (tagged(plan.matchedActions, "m") ++ tagged(plan.notMatchedBySourceActions, "u"))
        .collect { case (t0, _: DeleteAction) => t0 }

    // Per target column: a flat CASE over the tag — distinct tags, so
    // clause order no longer matters here (it was decided in `tag`).
    def assigned(assigns: Seq[Assignment], f: StructField): Option[Column] =
      assigns.collectFirst {
        case Assignment(k, v) if lastName(k).equalsIgnoreCase(f.name) =>
          ColumnBridge.column(v)
      }
    def valueFor(action: MergeAction, f: StructField): Option[Column] = action match {
      case UpdateAction(_, assigns, _) => Some(assigned(assigns, f).getOrElse(tc(f.name)))
      case _: UpdateStarAction => Some(sc(f.name).cast(f.dataType))
      case InsertAction(_, assigns) =>
        Some(assigned(assigns, f).getOrElse(lit(null)).cast(f.dataType))
      case _: InsertStarAction => Some(sc(f.name).cast(f.dataType))
      case _: DeleteAction => None // row is filtered before projection
    }
    val allTagged = tagged(plan.matchedActions, "m") ++
      tagged(plan.notMatchedActions, "i") ++
      tagged(plan.notMatchedBySourceActions, "u")
    val outCols = fields.map { f =>
      allTagged.foldLeft(tc(f.name)) { case (acc, (t0, action)) =>
        valueFor(action, f).map(v => when(col("__tag") === t0, v).otherwise(acc))
          .getOrElse(acc)
      }.as(f.name)
    }

    joined.withColumn("__tag", tag)
      .filter(!col("__tag").isin(dropTags: _*))
      .select(outCols: _*)
  }

  /** Execute the merge and replace the target temp view with the result
    * (materialized first — can't overwrite a view being read).
    *
    * OWNERSHIP: the swap releases the block-store state behind the
    * SUPERSEDED view (the previous call's checkpoint) once the new result
    * is materialized — without that, a continuous merge loop orphans one
    * table-sized checkpoint per batch and executor storage grows forever.
    * Consequently the replaced view's frame must not be read again through
    * other references after this call.
    */
  def executeIntoTempView(spark: SparkSession, mergeSql: String): Unit = {
    val plan = spark.sessionState.sqlParser.parsePlan(mergeSql)
      .asInstanceOf[MergeIntoTable]
    val viewName = plan.targetTable.collectFirst {
      case r: org.apache.spark.sql.catalyst.analysis.UnresolvedRelation =>
        r.multipartIdentifier.mkString(".")
    }.getOrElse(throw new IllegalArgumentException("target is not a named relation"))
    // the view wraps the checkpointed frame in View/SubqueryAlias nodes, so
    // collect the LogicalRDDs inside rather than matching the root
    val supersededRdds =
      if (spark.catalog.tableExists(viewName))
        spark.table(viewName).queryExecution.analyzed.collect {
          case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd
        }
      else Nil
    val out = merged(spark, mergeSql).localCheckpoint() // eager: materialized
    out.createOrReplaceTempView(viewName)
    supersededRdds.foreach(_.unpersist(blocking = false))
  }

  private def unalias(p: LogicalPlan): (String, LogicalPlan) = p match {
    case SubqueryAlias(ident, child) => (ident.name, child)
    case r: org.apache.spark.sql.catalyst.analysis.UnresolvedRelation =>
      (r.multipartIdentifier.last, r)
    case other => ("__merge_side", other)
  }

  private def tagged(actions: Seq[MergeAction], prefix: String): Seq[(String, MergeAction)] =
    actions.zipWithIndex.map { case (a, i) => (s"$prefix$i", a) }

  private def actionCondition(a: MergeAction): Option[Expression] = a.condition

  private def lastName(e: Expression): String = e match {
    case u: UnresolvedAttribute => u.nameParts.last
    case other => other.sql
  }
}
