package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class SkewSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private lazy val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")

  test("salted two-phase sum equals the naive groupBy") {
    val salted = Skew.saltedSum(li, "l_returnflag", "l_quantity")
      .select($"l_returnflag", $"sum_l_quantity", $"n_rows")
      .as[(String, Double, Long)].collect().map(t => t._1 -> ((t._2, t._3))).toMap
    val naive = li.groupBy("l_returnflag")
      .agg(sum("l_quantity").as("s"), count(lit(1)).as("n"))
      .as[(String, Double, Long)].collect().map(t => t._1 -> ((t._2, t._3))).toMap
    assert(salted == naive)
  }

  test("salted join equals the plain equi-join") {
    val dim = Seq(("A", "grpA"), ("N", "grpN"), ("R", "grpR")).toDF("l_returnflag", "grp")
    val salted = Skew.saltedJoin(li.select("l_orderkey", "l_linenumber", "l_returnflag"),
      dim, "l_returnflag")
    val plain = li.select("l_orderkey", "l_linenumber", "l_returnflag")
      .join(dim, "l_returnflag")
    assert(salted.count() == plain.count())
    assert(salted.groupBy("grp").count().as[(String, Long)].collect().toMap ==
      plain.groupBy("grp").count().as[(String, Long)].collect().toMap)
  }
}
