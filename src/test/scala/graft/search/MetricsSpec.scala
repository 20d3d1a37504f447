package graft.search

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class MetricsSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("perQuery: hand-computed recall@k and RR; no-relevant queries dropped") {
    // q1: relevant {10, 11, 12}; top-3 = (10@1, 99@2, 11@3) -> hits 2,
    //     recall 2/3, RR 1
    // q2: relevant {20}; top-3 = (98@1, 97@2, 20@3) -> recall 1, RR 1/3
    // q3: relevant {30}; top-3 has no hit -> recall 0, RR 0
    // q4: appears in results but has NO relevant docs -> dropped
    val ranked = Seq(
      (1L, 10L, 1), (1L, 99L, 2), (1L, 11L, 3),
      (2L, 98L, 1), (2L, 97L, 2), (2L, 20L, 3),
      (3L, 96L, 1), (3L, 95L, 2), (3L, 94L, 3),
      (4L, 93L, 1)
    ).toDF("query_id", "doc_id", "rank")
    val relevant = Seq((1L, 10L), (1L, 11L), (1L, 12L), (2L, 20L), (3L, 30L))
      .toDF("query_id", "doc_id")
    val m = Metrics.perQuery(ranked, relevant, k = 3)
      .select("query_id", "n_relevant", "hits", "recall_at_k", "reciprocal_rank")
      .as[(Long, Long, Long, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(m.keySet == Set(1L, 2L, 3L), "query 4 (no relevant) must be dropped")
    assert(m(1L) == ((1L, 3L, 2L, 0.666667, 1.0)), m(1L).toString)
    assert(m(2L) == ((2L, 1L, 1L, 1.0, 0.333333)), m(2L).toString)
    assert(m(3L) == ((3L, 1L, 0L, 0.0, 0.0)), m(3L).toString)
    val s = Metrics.summary(Metrics.perQuery(ranked, relevant, 3))
      .select("n_queries", "mean_recall", "mrr")
      .as[(Long, Double, Double)].head()
    assert(s._1 == 3L)
    assert(math.abs(s._2 - (0.666667 + 1.0 + 0.0) / 3) < 1e-6)
    assert(math.abs(s._3 - (1.0 + 0.333333 + 0.0) / 3) < 1e-6)
  }

  test("perQuery: duplicate relevance / ranked rows don't inflate metrics") {
    // relevant {10} listed twice, and doc 10 ranked at BOTH 1 and 3:
    // without dedup hits would be 4 and recall 4.0 — must be exactly 1.0
    // with RR taken from the best rank.
    val ranked = Seq((1L, 10L, 1), (1L, 99L, 2), (1L, 10L, 3))
      .toDF("query_id", "doc_id", "rank")
    val relevant = Seq((1L, 10L), (1L, 10L)).toDF("query_id", "doc_id")
    val m = Metrics.perQuery(ranked, relevant, k = 3)
      .select("query_id", "n_relevant", "hits", "recall_at_k", "reciprocal_rank")
      .as[(Long, Long, Long, Double, Double)].head()
    assert(m == ((1L, 1L, 1L, 1.0, 1.0)), m.toString)
  }

  test("ndcgAtK: hand micro weights, hit at rank 2 only, prefix-sum " +
      "IDCG, no-relevant query null, perfect ranking hits 1e6, guard") {
    val ranked = Seq((1L, 10L, 1), (1L, 11L, 2), (1L, 12L, 3),
      (2L, 10L, 1), (3L, 20L, 1), (3L, 21L, 2))
      .toDF("query_id", "doc_id", "rank")
    val relevant = Seq((1L, 11L), (1L, 99L), (3L, 20L), (3L, 21L))
      .toDF("query_id", "doc_id")
    val got = graft.search.Metrics.ndcgAtK(ranked, relevant, k = 3)
      .as[(Long, Long, Long, Option[Long])].collect().toSet
    // w = (1000000, 630930, 500000); q1: dcg = w2 = 630930,
    // idcg = cw(2) = 1630930; q2: nothing relevant → null;
    // q3: both hits in order → dcg = idcg → exactly 1e6
    val q1 = 630930L * 1000000L / 1630930L
    assert(got == Set((1L, 2L, 630930L, Some(q1)),
      (2L, 0L, 0L, None), (3L, 2L, 1630930L, Some(1000000L))),
      s"got $got (q1=$q1)")
    intercept[IllegalArgumentException] {
      graft.search.Metrics.ndcgAtK(ranked, relevant, k = 0)
    }
  }
}
