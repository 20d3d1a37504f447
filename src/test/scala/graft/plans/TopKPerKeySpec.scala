package graft.plans

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class TopKPerKeySpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def sample = {
    // deterministic multi-partition frame with ties and a tiny group
    val rows = for (i <- 1 to 500) yield
      (s"g${i % 7}", (i * 37) % 101, i.toLong)
    rows.toDF("g", "score", "id").repartition(8)
  }

  test("perKey equals the row_number window formulation") {
    val df = sample.cache()
    val got = TopK.perKey(df, Seq("g"), Seq(("score", false), ("id", true)), k = 5)
      .select("g", "score", "id").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2))).sorted.toSeq
    val w = Window.partitionBy("g").orderBy(col("score").desc, col("id").asc)
    val want = df.withColumn("rn", row_number().over(w)).filter(col("rn") <= 5)
      .select("g", "score", "id").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2))).sorted.toSeq
    assert(got == want)
    df.unpersist()
  }

  test("groups smaller than k are returned whole") {
    val df = Seq(("a", 1L), ("a", 2L), ("b", 3L)).toDF("g", "v")
    val out = TopK.perKey(df, Seq("g"), Seq(("v", true)), k = 10)
      .collect().map(r => (r.getString(0), r.getLong(1))).sorted.toSeq
    assert(out == Seq(("a", 1L), ("a", 2L), ("b", 3L)))
  }

  test("plans TopKPerKeyExec with a hash exchange, no WindowExec, no full Sort") {
    val df = sample
    val plan = TopK.perKey(df, Seq("g"), Seq(("score", false), ("id", true)), k = 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKey"), plan)
    assert(!plan.contains("Window"), s"window should not appear:\n$plan")
    assert(!plan.contains("Sort "), s"no full sort expected:\n$plan")
  }
}
