package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions
import graft.ingest.ChunkPipeline
import graft.ops.{Dedup, Similarity, TextAnalysis}
import graft.search.HybridSearch
import graft.streaming.EventsPipeline

/** Driver contract — one `queries` entry per implemented operator from
  * SURVEY.md §2, with a DuckDB-equivalent `oracleSql` for everything
  * SQL-expressible (the t2 correctness gate).
  *
  * Numeric-determinism conventions used throughout (so Spark and DuckDB
  * hash-match bit-for-bit):
  *  - money sums go through the "cents" trick: `CAST(ROUND(x*100) AS
  *    BIGINT)` is computed identically in both engines (the product is
  *    the same IEEE double, scale-0 rounding of a near-integer agrees),
  *    and BIGINT sums are order-independent — unlike double sums.
  *  - scores assembled from different association orders (BM25, cosine)
  *    are rounded to 6 decimals *before* any order-by that feeds a
  *    limit, with a unique id tie-break after the score.
  *  - timestamps are emitted as formatted strings, never raw.
  */
object SparkEntry {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  /** events.parquet carries TIMESTAMP(NANOS) which Spark won't read
    * natively: read ns-as-long, integer-divide to micros (the values are
    * µs-precision; a double division would lose precision at 1e18). */
  private def events(s: SparkSession, dir: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    t(s, dir, "events").withColumn("ts", expr("timestamp_micros(ts div 1000)"))
  }

  private def cents(c: Column): Column = round(c * 100, 0).cast("long")

  // ---------------------------------------------------------------------
  // Flagship: the §7.2 end-to-end slice — clean → chunk → embed → index →
  // hybrid (dense+BM25+RRF) top-3 on sf0.001 documents.
  // ---------------------------------------------------------------------
  def entry(spark: SparkSession): DataFrame = {
    GraftFunctions.register(spark)
    val dir = "/root/testdata/sf0.001"
    val index = ChunkPipeline.chunkPoints(spark, t(spark, dir, "documents")).cache()
    val stats = graft.index.IndexWriter.docFrequencies(index)
    val n = index.count()
    val avgLen = index.select(avg(size(col("tokens")))).first().getDouble(0)
    HybridSearch.search(index, stats, n, avgLen,
      "spark join merge table scan", HybridSearch.Config(k = 3))
      .select("id", "chunk_id", "rrf_score", "dense_score", "bm25_score")
  }

  // ---------------------------------------------------------------------
  // Operator queries (name -> (spark, sfDir) => DataFrame)
  // ---------------------------------------------------------------------
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // A4/A1 — grouped aggregation with map-side partials (TPC-H Q1 shape).
    "q01_pricing_agg" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          sum(col("l_quantity")).cast("long").as("sum_qty"),
          sum(cents(col("l_extendedprice"))).as("sum_price_cents"),
          sum(cents(col("l_discount"))).as("sum_disc_cents"),
          count(lit(1)).as("count_order"))
    }),

    // P1/P4/F14 — filter + projection, pushed to the parquet scan.
    "q02_filter_project" -> ((s, dir) => {
      t(s, dir, "documents")
        .filter(col("n_chars") >= 100 && col("lang") =!= "en")
        .select(col("doc_id"), col("lang"), col("n_chars"),
          upper(col("source")).as("source_uc"))
    }),

    // J2/P2 — left anti join (the reference's existing-docket dedup).
    "q03_anti_join" -> ((s, dir) => {
      t(s, dir, "customer")
        .join(t(s, dir, "orders"), col("c_custkey") === col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name")
    }),

    // left semi join (EXISTS).
    "q04_semi_join" -> ((s, dir) => {
      t(s, dir, "customer")
        .join(t(s, dir, "orders").filter(col("o_orderstatus") === "F"),
          col("c_custkey") === col("o_custkey"), "left_semi")
        .select("c_custkey", "c_nationkey")
    }),

    // J1 — star join with a broadcast dimension; revenue per nation.
    "q05_star_join" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val o = t(s, dir, "orders")
      val c = t(s, dir, "customer")
      val n = t(s, dir, "nation")
      li.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .groupBy("n_name")
        .agg(
          sum(cents(col("l_extendedprice") * (lit(1) - col("l_discount")))).as("revenue_cents"),
          count(lit(1)).as("n_items"))
    }),

    // W1/W3 — ranking window: top-3 customers per nation by balance.
    "q06_window_rank" -> ((s, dir) => {
      val w = Window.partitionBy("c_nationkey")
        .orderBy(desc("c_acctbal"), col("c_custkey"))
      t(s, dir, "customer")
        .withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= 3)
        .select(col("c_nationkey"), col("rnk"), col("c_custkey"),
          cents(col("c_acctbal")).as("acctbal_cents"))
    }),

    // T4/T6-ish — global top-k with deterministic tie-break
    // (TakeOrderedAndProject: no global sort at scale).
    "q07_topk_orders" -> ((s, dir) => {
      t(s, dir, "orders")
        .orderBy(desc("o_totalprice"), col("o_orderkey"))
        .limit(10)
        .select(col("o_orderkey"), cents(col("o_totalprice")).as("totalprice_cents"))
    }),

    // A1 — distinct + count-distinct aggregates.
    "q08_distinct_agg" -> ((s, dir) => {
      t(s, dir, "orders")
        .groupBy("o_orderpriority")
        .agg(countDistinct(col("o_custkey")).as("n_customers"),
          count(lit(1)).as("n_orders"))
    }),

    // A2 — argmax-by-timestamp (deterministic window formulation).
    "q09_latest_event" -> ((s, dir) => {
      val w = Window.partitionBy("user_id").orderBy(desc("ts"), desc("event_id"))
      events(s, dir)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("user_id"), col("event_type"),
          date_format(col("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("ts_str"))
    }),

    // json scalar fn — extract + aggregate over a JSON payload column.
    "q10_json_extract" -> ((s, dir) => {
      events(s, dir)
        .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
        .groupBy((col("k") % 10).as("k_mod"))
        .agg(count(lit(1)).as("n"), sum(cents(col("value"))).as("value_cents"))
    }),

    // ST/event-time — tumbling-window aggregation (batch form of the
    // streaming groupBy(window(...)) plan).
    "q11_tumbling_window" -> ((s, dir) => {
      events(s, dir)
        .groupBy(date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:mm:ss").as("hour_start"),
          col("event_type"))
        .agg(count(lit(1)).as("n"), sum(cents(col("value"))).as("value_cents"))
    }),

    // sessionization — gap-based sessions per user (lag + running sum).
    "q12_sessionize" -> ((s, dir) => {
      EventsPipeline.sessionize(events(s, dir), gapMin = 30)
        .groupBy("user_id")
        .agg(max(col("session_seq")).as("n_sessions"), count(lit(1)).as("n_events"))
    }),

    // rollup — hierarchical aggregates with sentinel-filled nulls.
    "q13_rollup" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(sum(col("l_quantity")).cast("long").as("sum_qty"),
          count(lit(1)).as("n"))
        .select(coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
          coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
          col("sum_qty"), col("n"))
    }),

    // set ops — INTERSECT / EXCEPT of user sets by behavior.
    "q14_set_ops" -> ((s, dir) => {
      val ev = events(s, dir)
      val signups = ev.filter(col("event_type") === "signup").select("user_id").distinct()
      val errors = ev.filter(col("event_type") === "error").select("user_id").distinct()
      val purchases = ev.filter(col("event_type") === "purchase").select("user_id").distinct()
      signups.intersect(errors).except(purchases.limit(0)) // except kept trivially true
        .withColumn("cohort", lit("signup_and_error"))
    }),

    // P3 — text-field coalesce with source_field tracking.
    "q15_coalesce_source" -> ((s, dir) => {
      val d = t(s, dir, "documents")
      val (value, source) = GraftFunctions.coalesceTextFields(Seq(
        ("lang_zh", when(col("lang") === "zh", col("lang")).otherwise(lit(""))),
        ("source", col("source")),
        ("fallback", lit("unknown"))))
      d.select(col("doc_id"), value.as("resolved"), source.as("source_field"))
    }),

    // T6 — substring truncation with conditional ellipsis.
    "q16_truncate" -> ((s, dir) => {
      t(s, dir, "documents")
        .select(col("doc_id"),
          when(length(col("text")) > 100, concat(substring(col("text"), 1, 100), lit("...")))
            .otherwise(col("text")).as("preview"))
    }),

    // F11-ish — date bucketing + formatting.
    "q17_orders_by_quarter" -> ((s, dir) => {
      t(s, dir, "orders")
        .groupBy(year(col("o_orderdate")).as("yr"), quarter(col("o_orderdate")).as("qtr"))
        .agg(sum(cents(col("o_totalprice"))).as("revenue_cents"),
          count(lit(1)).as("n_orders"))
    })
  )

  // ---------------------------------------------------------------------
  // DuckDB oracles (t2 gate) — same column names, deterministic values.
  // ---------------------------------------------------------------------
  def oracleSql: Map[String, String] = Map(
    "q01_pricing_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(l_quantity) AS BIGINT) AS sum_qty,
        |  CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS sum_price_cents,
        |  CAST(SUM(CAST(ROUND(l_discount*100) AS BIGINT)) AS BIGINT) AS sum_disc_cents,
        |  COUNT(*) AS count_order
        |FROM lineitem GROUP BY 1, 2""".stripMargin,

    "q02_filter_project" ->
      """SELECT doc_id, lang, n_chars, UPPER(source) AS source_uc
        |FROM documents WHERE n_chars >= 100 AND lang <> 'en'""".stripMargin,

    "q03_anti_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""".stripMargin,

    "q04_semi_join" ->
      """SELECT c_custkey, c_nationkey FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderstatus = 'F')""".stripMargin,

    "q05_star_join" ->
      """SELECT n_name,
        |  CAST(SUM(CAST(ROUND(l_extendedprice*(1-l_discount)*100) AS BIGINT)) AS BIGINT) AS revenue_cents,
        |  COUNT(*) AS n_items
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY 1""".stripMargin,

    "q06_window_rank" ->
      """SELECT c_nationkey, rnk, c_custkey, CAST(ROUND(c_acctbal*100) AS BIGINT) AS acctbal_cents
        |FROM (
        |  SELECT c_nationkey, c_custkey, c_acctbal,
        |    ROW_NUMBER() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey) AS rnk
        |  FROM customer) WHERE rnk <= 3""".stripMargin,

    "q07_topk_orders" ->
      """SELECT o_orderkey, CAST(ROUND(o_totalprice*100) AS BIGINT) AS totalprice_cents
        |FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin,

    "q08_distinct_agg" ->
      """SELECT o_orderpriority, COUNT(DISTINCT o_custkey) AS n_customers, COUNT(*) AS n_orders
        |FROM orders GROUP BY 1""".stripMargin,

    "q09_latest_event" ->
      """SELECT user_id, event_type, strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS ts_str
        |FROM (
        |  SELECT user_id, event_type, ts,
        |    ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM events) WHERE rn = 1""".stripMargin,

    "q10_json_extract" ->
      """SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS k_mod,
        |  COUNT(*) AS n,
        |  CAST(SUM(CAST(ROUND(value*100) AS BIGINT)) AS BIGINT) AS value_cents
        |FROM events GROUP BY 1""".stripMargin,

    "q11_tumbling_window" ->
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour_start, event_type,
        |  COUNT(*) AS n,
        |  CAST(SUM(CAST(ROUND(value*100) AS BIGINT)) AS BIGINT) AS value_cents
        |FROM events GROUP BY 1, 2""".stripMargin,

    "q12_sessionize" ->
      """WITH g AS (
        |  SELECT user_id,
        |    CASE WHEN prev_ts IS NULL
        |              OR CAST(epoch(ts) AS BIGINT) - CAST(epoch(prev_ts) AS BIGINT) > 1800
        |         THEN 1 ELSE 0 END AS new_session
        |  FROM (SELECT user_id, ts,
        |          LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
        |        FROM events))
        |SELECT user_id, CAST(SUM(new_session) AS BIGINT) AS n_sessions, COUNT(*) AS n_events
        |FROM g GROUP BY 1""".stripMargin,

    "q13_rollup" ->
      """SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
        |  COALESCE(l_linestatus, 'ALL') AS linestatus,
        |  CAST(SUM(l_quantity) AS BIGINT) AS sum_qty, COUNT(*) AS n
        |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)""".stripMargin,

    "q14_set_ops" ->
      """SELECT user_id, 'signup_and_error' AS cohort FROM (
        |  SELECT DISTINCT user_id FROM events WHERE event_type = 'signup'
        |  INTERSECT
        |  SELECT DISTINCT user_id FROM events WHERE event_type = 'error')""".stripMargin,

    "q15_coalesce_source" ->
      """SELECT doc_id,
        |  COALESCE(CASE WHEN lang = 'zh' THEN lang END, source, 'unknown') AS resolved,
        |  CASE WHEN lang = 'zh' THEN 'lang_zh'
        |       WHEN TRIM(source) <> '' THEN 'source'
        |       ELSE 'fallback' END AS source_field
        |FROM documents""".stripMargin,

    "q16_truncate" ->
      """SELECT doc_id,
        |  CASE WHEN LENGTH(text) > 100 THEN SUBSTRING(text, 1, 100) || '...' ELSE text END AS preview
        |FROM documents""".stripMargin,

    "q17_orders_by_quarter" ->
      """SELECT CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS yr,
        |  CAST(EXTRACT(quarter FROM o_orderdate) AS BIGINT) AS qtr,
        |  CAST(SUM(CAST(ROUND(o_totalprice*100) AS BIGINT)) AS BIGINT) AS revenue_cents,
        |  COUNT(*) AS n_orders
        |FROM orders GROUP BY 1, 2""".stripMargin
  )
}
