package graft.search

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.embed.{Embedder, HashingEmbedder}
import graft.functions.GraftFunctions._
import graft.text.Bm25

/** T1-T3 / J4 / A5 — hybrid (dense + BM25) top-k with RRF fusion.
  *
  * The reference issues one Qdrant `query_points` call with two prefetch
  * branches (dense cosine, sparse BM25, each `limit = 5×k`) fused by
  * Reciprocal-Rank-Fusion and post-filtered by `score_threshold`
  * (`/root/reference/chatbot/app.py:110-191`). Here both branches are
  * Spark plans over the index table:
  *
  *  - dense: codegen'd [[graft.functions.CosineSimilarity]] scan +
  *    `orderBy(desc).limit(n)` — Catalyst plans `TakeOrderedAndProject`,
  *    a per-partition top-n + driver merge, NO global sort/shuffle, so
  *    it scales linearly with executors.
  *  - sparse: query terms are a handful of literals, so the token
  *    explode is filtered to them *before* any aggregation; doc-frequency
  *    stats arrive via a broadcast join (dimension side is tiny).
  *  - fusion: full-outer join of the two ranked branch results (both
  *    ≤ 5k rows — driver-scale), RRF `Σ 1/(rrfK + rank)`.
  *
  * RRF constant k=60 (the published default the reference inherits
  * server-side) is explicit config here so results are self-contained.
  */
object HybridSearch {

  /** @param rrfScoreThreshold applied to the RRF-fused score, which is
    *   bounded by 2/(rrfK+1) ≈ 0.033 — deliberately NOT named like the
    *   reference's `score_threshold` (default 0.4), which applies to
    *   store-native fused scores; porting that value here would silently
    *   return zero results, so the ceiling is validated. */
  final case class Config(
      k: Int = 3,
      rrfScoreThreshold: Double = 0.0,
      prefetchMultiplier: Int = 5,  // config.yml:60
      rrfK: Int = 60) {
    require(rrfScoreThreshold <= 2.0 / (rrfK + 1),
      s"rrfScoreThreshold=$rrfScoreThreshold exceeds the maximum possible " +
        s"RRF score 2/(rrfK+1)=${2.0 / (rrfK + 1)}: every result would be " +
        "filtered. The reference's score_threshold (default 0.4) applies to " +
        "store-native scores, not RRF — do not port it verbatim.")
  }

  /** T2 — dense branch: exact cosine top-n (TakeOrderedAndProject). */
  def denseTopK(index: DataFrame, queryVec: Array[Float], n: Int,
      idCol: String = "id", vecCol: String = "dense_vec"): DataFrame =
    index
      // rounded to 6dp before ranking: fp-accumulation-order independent
      .withColumn("dense_score", round(vecCosine(col(vecCol), typedlit(queryVec)), 6))
      .orderBy(desc("dense_score"), col(idCol))
      .limit(n)
      .select(col(idCol), col("dense_score"))

  /** T3 — sparse branch: BM25 top-n against pre-computed doc frequencies.
    *
    * @param docStats (term, df) table from [[graft.index.IndexWriter.docFrequencies]]
    * @param corpusSize total docs N; avgDocLen mean token count
    */
  def bm25TopK(index: DataFrame, docStats: DataFrame, corpusSize: Long,
      avgDocLen: Double, queryTerms: Seq[String], n: Int,
      idCol: String = "id", tokensCol: String = "tokens"): DataFrame = {
    val terms = queryTerms.distinct
    if (terms.isEmpty) return index.sparkSession.emptyDataFrame
      .withColumn(idCol, lit("")).withColumn("bm25_score", lit(0.0)).limit(0)
    val idfCol = log(lit(1.0) + (lit(corpusSize.toDouble) - col("df") + 0.5) / (col("df") + 0.5))
    index
      .select(col(idCol), size(col(tokensCol)).as("dl"),
        explode(col(tokensCol)).as("term"))
      .filter(col("term").isin(terms: _*))     // prune before the shuffle
      .groupBy(col(idCol), col("term"), col("dl"))
      .agg(count(lit(1)).as("tf"))
      .join(broadcast(docStats.filter(col("term").isin(terms: _*))), Seq("term"))
      .withColumn("term_score",
        idfCol * col("tf") * lit(Bm25.k1 + 1.0) /
          (col("tf") + lit(Bm25.k1) * (lit(1.0 - Bm25.b) + lit(Bm25.b) * col("dl") / lit(avgDocLen))))
      .groupBy(col(idCol))
      .agg(round(sum("term_score"), 6).as("bm25_score"))
      .orderBy(desc("bm25_score"), col(idCol))
      .limit(n)
  }

  /** J4 + A5 + T1 — RRF fusion of the two ranked branches, threshold,
    * final top-k. */
  def rrfFuse(dense: DataFrame, sparse: DataFrame, cfg: Config,
      idCol: String = "id"): DataFrame = {
    val dw = Window.orderBy(desc("dense_score"), col(idCol))
    val sw = Window.orderBy(desc("bm25_score"), col(idCol))
    val d = dense.withColumn("dense_rank", row_number().over(dw))
    val s = sparse.withColumn("bm25_rank", row_number().over(sw))
    d.join(s, Seq(idCol), "full_outer")
      .withColumn("rrf_score",
        coalesce(lit(1.0) / (lit(cfg.rrfK) + col("dense_rank")), lit(0.0)) +
        coalesce(lit(1.0) / (lit(cfg.rrfK) + col("bm25_rank")), lit(0.0)))
      .filter(col("rrf_score") >= cfg.rrfScoreThreshold) // P8
      .orderBy(desc("rrf_score"), col(idCol))
      .limit(cfg.k)
  }

  /** Full §3.2 query lifecycle: embed query (V2, with BGE-style prefix)
    * → dense ∪ sparse prefetch (5×k each) → RRF → top-k, joined back to
    * payload columns. */
  def search(index: DataFrame, docStats: DataFrame, corpusSize: Long,
      avgDocLen: Double, query: String, cfg: Config = Config(),
      embedder: Embedder = HashingEmbedder.default): DataFrame = {
    val prefetch = cfg.k * cfg.prefetchMultiplier
    val qVec = embedder.embedQuery(query)
    val qTerms = Bm25.tokenize(query)
    val dense = denseTopK(index, qVec, prefetch)
    val sparse = bm25TopK(index, docStats, corpusSize, avgDocLen, qTerms, prefetch)
    val fused = rrfFuse(dense, sparse, cfg)
    // payload projection (P9): hydrate the top-k ids only
    fused.join(index, Seq("id"), "left")
      .orderBy(desc("rrf_score"), col("id"))
  }
}
