package graft.index

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class BucketedSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("bucketed index write: id-keyed self-join plans without an exchange") {
    val pts = (1 to 500).map(i => (s"id_$i", s"payload_$i")).toDF("id", "payload")
    IndexWriter.writeBucketed(pts, "bucketed_idx_test", buckets = 8)
    val t = spark.table("bucketed_idx_test")
    val joined = t.join(t.select($"id", $"payload".as("p2")), "id")
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed self-join must not shuffle, got:\n${plan.take(800)}")
    assert(joined.count() == 500)
    spark.sql("DROP TABLE bucketed_idx_test")
  }

  test("percentile_approx (sketch) lands within 1% of exact quantiles") {
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .select($"l_extendedprice".cast("double").as("v"))
    val row = li.agg(
      expr("percentile_approx(v, array(0.25, 0.5, 0.95), 10000)").as("approx"),
      expr("percentile(v, array(0.25, 0.5, 0.95))").as("exact")).head()
    val approx = row.getSeq[Double](0)
    val exact = row.getSeq[Double](1)
    approx.zip(exact).foreach { case (a, e) =>
      assert(math.abs(a - e) / e < 0.01, s"approx=$a exact=$e")
    }
  }

  test("approx_count_distinct (HLL) lands within 5% of exact on lineitem keys") {
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    val Row = li.agg(
      countDistinct($"l_orderkey").as("exact"),
      approx_count_distinct($"l_orderkey", rsd = 0.01).as("approx")).head()
    val exact = Row.getLong(0).toDouble
    val approx = Row.getLong(1).toDouble
    assert(math.abs(approx - exact) / exact < 0.05, s"exact=$exact approx=$approx")
  }
}

class StreamDedupSpec extends AnyFunSuite with SparkTestBase {
  import graft.streaming.EventsPipeline

  test("dropDuplicatesWithinWatermark: event counts match the distinct batch counts") {
    val dir = "/root/testdata/sf0.001"
    val q = EventsPipeline.streamDedupCounts(spark, dir, "dedup_sink")
    q.processAllAvailable()
    q.stop()
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val batch = spark.read.parquet(s"$dir/events.parquet")
      .dropDuplicates("event_id")
      .groupBy("event_type").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val streamed = spark.table("dedup_sink")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(streamed == batch)
  }
}
