package graft.search

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Retrieval-evaluation metrics — the measurement side of the hybrid
  * search stack (reference context: the reference ships retrieval with
  * no evaluation harness at all; a pipeline that re-ranks or swaps
  * embedders needs recall/MRR to know it didn't regress).
  *
  * Input contract: a ranked result table (query_id, doc_id, rank) —
  * rank 1-based, deterministic tie-breaks upstream — and a relevance
  * table (query_id, doc_id). Metrics follow the standard definitions:
  * recall@k = |relevant ∩ top-k| / |relevant|, RR = 1/rank of the first
  * relevant hit (0 when none in the top k).
  *
  * Scale shape: one (query, doc)-keyed join against the relevance set
  * (broadcast while eval sets stay eval-sized), one groupBy query —
  * metrics cost is O(results), never O(corpus). Ratios round to 6
  * decimals so engines agree bit-for-bit.
  */
object Metrics {

  /** Per-query recall@k and reciprocal rank. Queries with no relevant
    * docs are dropped (their metrics are undefined, and keeping them as
    * zeros silently deflates the mean). */
  def perQuery(ranked: DataFrame, relevant: DataFrame, k: Int): DataFrame = {
    require(k >= 1, "k must be positive")
    // Defensive dedup rather than a documented input contract: duplicate
    // relevance rows would multiply hits (recall_at_k > 1.0) and inflate
    // n_relevant; a doc ranked twice keeps its best rank. Both inputs
    // are eval-sized, so the extra exchanges are noise.
    val rel = relevant.select("query_id", "doc_id").distinct()
    val rk = ranked.filter(col("rank") <= k)
      .groupBy("query_id", "doc_id").agg(min("rank").as("rank"))
    val relCounts = rel.groupBy("query_id")
      .agg(count(lit(1)).as("n_relevant"))
    val hits = rk
      .join(rel.withColumn("__rel", lit(1L)), Seq("query_id", "doc_id"), "left")
      .groupBy("query_id")
      .agg(
        sum(coalesce(col("__rel"), lit(0L))).as("hits"),
        min(when(col("__rel") === 1L, col("rank"))).as("first_rel_rank"))
    relCounts.join(hits, Seq("query_id"), "left")
      .select(col("query_id"), col("n_relevant"),
        coalesce(col("hits"), lit(0L)).as("hits"),
        round(coalesce(col("hits"), lit(0L)).cast("double") /
          col("n_relevant"), 6).as("recall_at_k"),
        coalesce(round(lit(1.0) / col("first_rel_rank"), 6), lit(0.0))
          .as("reciprocal_rank"))
  }

  /** Mean metrics across queries (macro average, 6 dp). */
  def summary(perQueryMetrics: DataFrame): DataFrame =
    perQueryMetrics.agg(
      count(lit(1)).as("n_queries"),
      round(avg(col("recall_at_k")), 6).as("mean_recall"),
      round(avg(col("reciprocal_rank")), 6).as("mrr"))

  /** NDCG@k (Järvelin & Kekäläinen TOIS 2002), binary relevance —
    * the position-sensitive member next to [[perQuery]]'s recall/MRR:
    * a hit at rank 1 is worth the full weight, a hit at rank k a
    * fraction, so ranking quality separates systems recall@k calls
    * equal. Exact-integer discipline: the position weights
    * w_i = round(10⁶ / log₂(i+1)) enter as a k-row broadcast literal
    * table (k is a serving constant — any engine derives the same
    * table from the same formula), DCG is the integer sum of matched
    * weights, IDCG the weight prefix sum at min(R, k), the ratio one
    * truncating division. Queries with no relevant docs carry null
    * ndcg (nothing to normalize by). Inputs dedup defensively like
    * [[perQuery]]. Returns (query_id, n_relevant, dcg_u6, ndcg_ppm). */
  def ndcgAtK(ranked: DataFrame, relevant: DataFrame, k: Int): DataFrame = {
    require(k >= 1, "k must be positive")
    val spark = ranked.sparkSession
    val w = (1 to k).map(i =>
      math.floor(1e6 / (math.log(i + 1.0) / math.log(2.0)) + 0.5).toLong)
    val cw = w.scanLeft(0L)(_ + _)
    val wDf = spark.createDataFrame((1 to k).map(i => (i, w(i - 1))))
      .toDF("rank", "w")
    val cwDf = spark.createDataFrame((0 to k).map(j => (j, cw(j))))
      .toDF("j", "cw")
    val rel = relevant.select("query_id", "doc_id").distinct()
    val rk = ranked.filter(col("rank") <= k)
      .groupBy("query_id", "doc_id").agg(min("rank").as("rank"))
    val relCounts = rel.groupBy("query_id")
      .agg(count(lit(1)).as("n_relevant"))
    val dcg = rk
      .join(rel.withColumn("hit", lit(1L)),
        Seq("query_id", "doc_id"), "left")
      .join(broadcast(wDf), "rank")
      .groupBy("query_id")
      .agg(sum(coalesce(col("hit"), lit(0L)) * col("w")).as("dcg_u6"))
    ranked.select("query_id").distinct()
      .join(relCounts, Seq("query_id"), "left")
      .na.fill(0L, Seq("n_relevant"))
      .join(dcg, Seq("query_id"), "left")
      .na.fill(0L, Seq("dcg_u6"))
      .withColumn("j", least(col("n_relevant"), lit(k)).cast("int"))
      .join(broadcast(cwDf), "j")
      .withColumn("ndcg_ppm", when(col("cw") === 0L, lit(null))
        .otherwise(expr("CAST(dcg_u6 * 1000000 div cw AS BIGINT)")))
      .select("query_id", "n_relevant", "dcg_u6", "ndcg_ppm")
  }
}
