package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class CleaningSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("equiWidthHistogram: bins partition the range, counts sum to n, max in last bin") {
    val df = (0 to 100).map(_.toDouble).toDF("x")
    val out = Cleaning.equiWidthHistogram(df, "x", bins = 10)
      .orderBy("bin").collect()
    assert(out.map(_.getLong(3)).sum == 101)
    assert(out.head.getDouble(1) == 0.0 && out.last.getDouble(2) == 100.0)
    // x = 100 (the max) falls in bin 9, not a phantom bin 10
    assert(out.last.getLong(0) == 9L && out.last.getLong(3) == 11L)
  }

  test("equiWidthHistogram: constant column collapses to one bin") {
    val df = Seq.fill(5)(7.0).toDF("x")
    val out = Cleaning.equiWidthHistogram(df, "x", bins = 4).collect()
    assert(out.length == 1 && out.head.getLong(0) == 0L && out.head.getLong(3) == 5L)
  }

  test("groupMeanImpute fills nulls with the group mean, flags them") {
    val df = Seq(
      ("a", Some(1.0)), ("a", Some(3.0)), ("a", None),
      ("b", Some(10.0)), ("b", None)).toDF("g", "v")
    val out = Cleaning.groupMeanImpute(df, "v", "g")
      .select("g", "imputed", "v_filled").collect()
    val imputedA = out.filter(r => r.getString(0) == "a" && r.getBoolean(1))
    val imputedB = out.filter(r => r.getString(0) == "b" && r.getBoolean(1))
    assert(imputedA.map(_.getDouble(2)).toSeq == Seq(2.0))
    assert(imputedB.map(_.getDouble(2)).toSeq == Seq(10.0))
    assert(out.count(!_.getBoolean(1)) == 3)
  }

  test("zscoreOutliers finds the planted outlier and skips zero-variance groups") {
    val normal = (1 to 20).map(i => ("a", 100.0 + (i % 3)))
    val planted = Seq(("a", 500.0))
    val constant = Seq(("c", 1.0), ("c", 1.0), ("c", 1.0))
    val df = (normal ++ planted ++ constant).toDF("g", "v")
    val out = Cleaning.zscoreOutliers(df, "v", "g", threshold = 3.0).collect()
    assert(out.length == 1)
    assert(out.head.getAs[Double]("v") == 500.0)
    assert(out.head.getAs[Double]("z") > 3.0)
  }
}
