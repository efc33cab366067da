package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class VectorMeanSpec extends SparkSpec {
  import spark.implicits._

  test("element-wise mean across many partitions matches the arithmetic") {
    val df = (1 to 1000).map(i => (i % 3, Array(i.toFloat, (2 * i).toFloat)))
      .toDF("label", "embedding").repartition(13)
    val got = df.groupBy($"label")
      .agg(VectorSimilarity.vectorMean($"embedding").as("c"))
      .as[(Int, Array[Double])].collect().toMap
    for (label <- 0 to 2) {
      val members = (1 to 1000).filter(_ % 3 == label)
      val exp0 = members.map(_.toFloat.toDouble).sum / members.size
      assert(math.abs(got(label)(0) - exp0) < 1e-9)
      assert(math.abs(got(label)(1) - 2 * exp0) < 1e-9)
    }
  }

  test("null vectors are skipped; an all-null group yields null") {
    val df = Seq(
      (0, Some(Array(1.0f, 3.0f))), (0, None), (0, Some(Array(3.0f, 5.0f))),
      (1, None))
      .toDF("label", "embedding")
    val rows = df.groupBy($"label")
      .agg(VectorSimilarity.vectorMean($"embedding").as("c"))
      .orderBy($"label").collect()
    assert(rows(0).getSeq[Double](1) == Seq(2.0, 4.0))
    assert(rows(1).isNullAt(1), "all-null group → null centroid")
  }

  test("double arrays work; inconsistent dimensions fail loudly") {
    val d = Seq((0, Array(1.0, 2.0)), (0, Array(3.0, 4.0))).toDF("label", "embedding")
    val r = d.groupBy($"label").agg(VectorSimilarity.vectorMean($"embedding").as("c"))
      .head().getSeq[Double](1)
    assert(r == Seq(2.0, 3.0))
    val bad = Seq((0, Array(1.0f)), (0, Array(1.0f, 2.0f))).toDF("label", "embedding")
    val e = intercept[Exception] {
      bad.groupBy($"label").agg(VectorSimilarity.vectorMean($"embedding")).collect()
    }
    assert(e.getMessage.contains("inconsistent dimensions") ||
      Option(e.getCause).exists(_.getMessage.contains("inconsistent dimensions")))
  }

  test("a null ELEMENT fails loudly instead of silently reading 0") {
    val bad = Seq((0, Array[Option[Float]](Some(1.0f), None)),
      (0, Array[Option[Float]](Some(2.0f), Some(3.0f))))
      .toDF("label", "embedding")
      .selectExpr("label", "transform(embedding, x -> x) AS embedding")
    val e = intercept[Exception] {
      bad.groupBy($"label").agg(VectorSimilarity.vectorMean($"embedding")).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(_.contains("null element")))
  }

  test("SQL surface: graft_vector_mean aggregates in a GROUP BY") {
    graft.GraftExtensions.register(spark)
    Seq((0, Array(1.0f, 1.0f)), (0, Array(3.0f, 5.0f)))
      .toDF("label", "embedding").createOrReplaceTempView("vm_in")
    val r = spark.sql(
      "SELECT graft_vector_mean(embedding) AS c FROM vm_in GROUP BY label").head()
    assert(r.getSeq[Double](0) == Seq(2.0, 3.0))
  }
}
