package graft

import graft.functions.expressions._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge

class GraftOptimizationsSpec extends SparkSpec {
  import spark.implicits._

  private def nfc(c: org.apache.spark.sql.Column) =
    ColumnBridge.column(NfcNormalizeExpr(ColumnBridge.expression(c)))
  private def norm(c: org.apache.spark.sql.Column) =
    ColumnBridge.column(NormalizedTextExpr(ColumnBridge.expression(c)))
  private def strided(c: org.apache.spark.sql.Column, n: Int) =
    ColumnBridge.column(StridedResizeExpr(ColumnBridge.expression(c), n))

  private def countExpr(df: DataFrame, p: Any => Boolean): Int =
    df.queryExecution.optimizedPlan
      .collect { case n => n.expressions }.flatten
      .map(_.collect { case e if p(e) => e }.size).sum

  // a non-foldable source: constant folding would otherwise evaluate a
  // literal-input projection away entirely and the count would test nothing
  private def srcText(value: String): DataFrame =
    spark.range(1).select(concat(lit(value), when($"id" < 0, "x").otherwise("")).as("t"))

  private def srcBytes(n: Int): DataFrame =
    spark.range(1).select(
      encode(concat(lit("x" * n), when($"id" < 0, "y").otherwise("")), "UTF-8")
        .as("payload"))

  private def withRule[T](f: => T): T = {
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ GraftOptimizations
    try f
    finally spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations.filterNot(_ eq GraftOptimizations)
  }

  test("nested idempotent kernels collapse to one application") {
    withRule {
      val df = srcText("Caf X")
      val doubled = df.select(nfc(nfc($"t")).as("a"), norm(norm($"t")).as("b"))
      assert(countExpr(doubled, _.isInstanceOf[NfcNormalizeExpr]) == 1)
      assert(countExpr(doubled, _.isInstanceOf[NormalizedTextExpr]) == 1)
      val row = doubled.head()
      assert(row.getString(0) == "Caf X", "semantics preserved")
      assert(row.getString(1) == "caf x")
    }
  }

  test("a 4-deep chain collapses fully (local fixpoint, not one pass)") {
    withRule {
      val df = srcText("A B")
      val quad = df.select(nfc(nfc(nfc(nfc($"t")))).as("a"))
      assert(countExpr(quad, _.isInstanceOf[NfcNormalizeExpr]) == 1)
    }
  }

  test("resize pairs collapse only when the outer bound is looser") {
    withRule {
      val df = srcBytes(32)
      val loose = df.select(strided(strided($"payload", 8), 16).as("p"))
      assert(countExpr(loose, _.isInstanceOf[StridedResizeExpr]) == 1)
      assert(loose.head().getAs[Array[Byte]](0).length == 8)
      val tight = df.select(strided(strided($"payload", 16), 8).as("p"))
      assert(countExpr(tight, _.isInstanceOf[StridedResizeExpr]) == 2,
        "tighter outer bound does real work and must stay")
      assert(tight.head().getAs[Array[Byte]](0).length == 8)
    }
  }

  test("fix_mojibake is never collapsed (3-round cap makes re-application meaningful)") {
    withRule {
      def fix(c: org.apache.spark.sql.Column) =
        ColumnBridge.column(FixMojibakeExpr(ColumnBridge.expression(c)))
      val df = srcText("\u00c3\u00a9")
      val doubled = df.select(fix(fix($"t")).as("a"))
      assert(countExpr(doubled, _.isInstanceOf[FixMojibakeExpr]) == 2)
    }
  }

  test("without the rule, doubled kernels stay doubled (the rule is the cause)") {
    val df = srcText("x")
    val doubled = df.select(nfc(nfc($"t")).as("a"))
    assert(countExpr(doubled, _.isInstanceOf[NfcNormalizeExpr]) == 2)
  }
}
