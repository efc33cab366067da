package graft.tools

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PlanAuditSpec extends SparkSpec {
  import spark.implicits._

  private lazy val a = (1L to 100L).map(i => (i, s"a$i")).toDF("id", "va")
  private lazy val b = (1L to 100L).map(i => (i, s"b$i")).toDF("id2", "vb")

  test("clean equi-join plans audit empty") {
    val df = a.join(b, $"id" === $"id2").groupBy($"va").count()
    assert(PlanAudit.audit(df).isEmpty)
    PlanAudit.require(df) // and the loud variant stays quiet
  }

  test("a cross join is flagged as cartesian or nested-loop") {
    val kinds = PlanAudit.audit(a.crossJoin(b)).map(_.kind).toSet
    assert(kinds.intersect(Set("cartesian-product", "nested-loop-join")).nonEmpty)
  }

  test("non-equi join against a scan is flagged; scalar-attach is exempt") {
    val nonEqui = a.join(b, $"id" =!= $"id2")
    assert(PlanAudit.audit(nonEqui).exists(f =>
      f.kind == "nested-loop-join" || f.kind == "cartesian-product"))
    // the scalar idiom: constant-key join against a GLOBAL aggregate
    val scalar = a.agg(avg($"id").as("m")).withColumn("jk", lit(1))
    val attach = a.withColumn("jk", lit(1)).join(broadcast(scalar), "jk")
      .filter($"id" > $"m")
    assert(PlanAudit.audit(attach).isEmpty,
      "a 1-row-by-construction broadcast must not be flagged")
  }

  test("broadcast hint over an un-aggregated fact scan is flagged; aggregated is fine") {
    val fact = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    val dim = (1L to 10L).map(i => (i, s"d$i")).toDF("k", "d")
    val bad = dim.join(broadcast(fact), $"k" === $"l_orderkey")
    assert(PlanAudit.audit(bad, factTables = Set("lineitem"))
      .exists(_.kind == "fact-broadcast-hint"))
    val ok = dim.join(
      broadcast(fact.groupBy($"l_orderkey").agg(sum($"l_quantity").as("q"))),
      $"k" === $"l_orderkey")
    assert(!PlanAudit.audit(ok, factTables = Set("lineitem"))
      .exists(_.kind == "fact-broadcast-hint"),
      "a broadcast hint over an AGGREGATED fact subtree is legitimate")
    intercept[IllegalStateException] {
      PlanAudit.require(bad, factTables = Set("lineitem"))
    }
  }
}
