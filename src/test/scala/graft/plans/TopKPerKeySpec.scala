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

  test("spill path: tiny maxRetainedRows forces runs, result identical, metrics fire") {
    val df = sample.cache()
    df.count()
    val want = TopK.perKey(df, Seq("g"), Seq(("score", false), ("id", true)), k = 5)
      .select("g", "score", "id").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2))).sorted.toSeq
    spark.conf.set("graft.topk.maxRetainedRows", "5") // every new key spills
    try {
      val plan = TopK.perKey(df, Seq("g"), Seq(("score", false), ("id", true)), k = 5)
      // collect on `plan` itself: metrics live on ITS executed plan (a
      // derived .select() would execute a separate physical plan)
      val got = plan.collect()
        .map(r => (r.getString(0), r.getInt(1), r.getLong(2))).sorted.toSeq
      assert(got == want)
      // AQE wraps stages in QueryStageExec nodes whose subtree is not in
      // `children` — unwrap explicitly to reach the executed instance
      import org.apache.spark.sql.execution.SparkPlan
      import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
      def findExec(p: SparkPlan): Option[TopKPerKeyExec] = p match {
        case e: TopKPerKeyExec => Some(e)
        case a: AdaptiveSparkPlanExec => findExec(a.executedPlan)
        case q: QueryStageExec => findExec(q.plan)
        case other => other.children.iterator.flatMap(findExec).nextOption()
      }
      val exec = findExec(plan.queryExecution.executedPlan).get
      assert(exec.metrics("spills").value > 0, "expected spilled runs")
      assert(exec.metrics("spilledRows").value > 0)
      assert(exec.metrics("numOutputRows").value == want.size)
    } finally spark.conf.unset("graft.topk.maxRetainedRows")
    df.unpersist()
  }

  test("output is emitted keys-ascending, rows in declared order within key") {
    val df = sample
    spark.conf.set("graft.topk.maxRetainedRows", "7")
    try {
      for (conf <- Seq(true, false)) { // spill and in-memory paths
        if (!conf) spark.conf.unset("graft.topk.maxRetainedRows")
        val rows = TopK.perKey(df.coalesce(1), Seq("g"),
            Seq(("score", false), ("id", true)), k = 5)
          .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSeq
        val regrouped = rows.map(_._1)
        assert(regrouped == regrouped.sorted, "keys must come out ascending")
        rows.groupBy(_._1).values.foreach { g =>
          assert(g == g.sortBy(t => (-t._2, t._3)), "within-key order violated")
        }
      }
    } finally spark.conf.unset("graft.topk.maxRetainedRows")
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
