package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class SamplingSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("rateThreshold: exact hex thresholds at the boundaries") {
    assert(Sampling.rateThreshold(0.0) == "00000000")
    assert(Sampling.rateThreshold(0.5) == "80000000")
    assert(Sampling.rateThreshold(1.0) == "ffffffff")
    assert(Sampling.rateThreshold(0.1) == "19999999")
  }

  test("hashSample is deterministic and near the requested rate") {
    val df = spark.range(10000).toDF("id")
    val a = Sampling.hashSample(df, "id", 0.3).select("id").as[Long].collect().toSet
    val b = Sampling.hashSample(df, "id", 0.3).select("id").as[Long].collect().toSet
    assert(a == b, "same ids kept on every run")
    assert(math.abs(a.size / 10000.0 - 0.3) < 0.02, s"rate off: ${a.size}")
    // monotone: a higher rate keeps a superset (thresholds nest)
    val c = Sampling.hashSample(df, "id", 0.6).select("id").as[Long].collect().toSet
    assert(a.subsetOf(c), "rate 0.3 sample must nest inside rate 0.6 sample")
  }

  test("stratifiedHashSample applies per-stratum rates") {
    val df = spark.range(8000)
      .select(col("id"), (when(col("id") % 2 === 0, "en").otherwise("xx")).as("lang"))
    val out = Sampling.stratifiedHashSample(df, "lang", "id",
      rates = Map("en" -> 0.1), defaultRate = 0.8)
      .groupBy("lang").count().as[(String, Long)].collect().toMap
    assert(math.abs(out("en") / 4000.0 - 0.1) < 0.03, s"en rate off: ${out("en")}")
    assert(math.abs(out("xx") / 4000.0 - 0.8) < 0.03, s"xx rate off: ${out("xx")}")
  }

  test("the sampling predicate is narrow (no shuffle) and retry-stable") {
    val df = spark.range(100).toDF("id")
    val out = Sampling.hashSample(df, "id", 0.5)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"sampling must not shuffle:\n$plan")
  }
}
