package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class EventsPipelineSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("sessionize: new session after gap, running count per user") {
    val ev = Seq(
      (1L, 10L, ts("2024-01-01 10:00:00")),
      (2L, 10L, ts("2024-01-01 10:10:00")),  // same session (10 min)
      (3L, 10L, ts("2024-01-01 11:30:00")),  // gap 80 min -> new session
      (4L, 20L, ts("2024-01-01 10:00:00")))  // other user
      .toDF("event_id", "user_id", "ts")
    val out = EventsPipeline.sessionize(ev, gapMin = 30)
      .select("event_id", "session_seq").as[(Long, Long)].collect().toMap
    assert(out(1L) == 1 && out(2L) == 1 && out(3L) == 2 && out(4L) == 1)
  }

  test("streaming windowed counts (complete mode) match the batch aggregation") {
    val dir = "/root/testdata/sf0.001"
    val q = EventsPipeline.streamWindowedCountsComplete(spark, dir, "test_sink")
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("test_sink")
      .select(col("window.start").as("w"), col("event_type"), col("n"))
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val batch = spark.read.parquet(s"$dir/events.parquet")
      .transform(EventsPipeline.tsToTimestamp(_))
      .groupBy(window(col("ts"), "1 hour").getField("start").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"))
    assert(streamed.except(batch).isEmpty && batch.except(streamed).isEmpty)
  }

  test("streaming windowed counts (append mode + watermark) emit finalized windows") {
    val dir = "/root/testdata/sf0.001"
    val q = EventsPipeline.streamWindowedCounts(spark, dir, "test_append_sink")
    q.processAllAvailable()
    q.stop()
    // append mode emits only windows the final watermark has closed; every
    // emitted row must agree with the batch aggregation for its window
    val streamed = spark.table("test_append_sink")
      .select(col("window.start").as("w"), col("event_type"), col("n"))
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val batch = spark.read.parquet(s"$dir/events.parquet")
      .transform(EventsPipeline.tsToTimestamp(_))
      .groupBy(window(col("ts"), "1 hour").getField("start").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"))
    assert(streamed.count() > 0, "watermarked stream should finalize at least one window")
    assert(streamed.except(batch).isEmpty, "every emitted window must match batch")
  }

  test("streaming session windows (append + watermark) match the batch" +
      " session_window aggregation") {
    val dir = "/root/testdata/sf0.001"
    val q = EventsPipeline.streamSessionCounts(spark, dir, "test_session_sink")
    q.processAllAvailable()
    q.stop()
    // append emits only sessions the final watermark closed; each must
    // equal the batch session_window row for the same (user, span)
    val streamed = spark.table("test_session_sink")
      .select(col("session_window.start").as("s"),
        col("session_window.end").as("e"), col("user_id"), col("n"))
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val batch = spark.read.parquet(s"$dir/events.parquet")
      .transform(EventsPipeline.tsToTimestamp(_))
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n"))
      .select(col("session_window.start").as("s"),
        col("session_window.end").as("e"), col("user_id"), col("n"))
    assert(streamed.count() > 0,
      "watermarked stream should finalize at least one session")
    assert(streamed.except(batch).isEmpty,
      "every emitted session must match the batch aggregation")
  }

  test("flatMapGroupsWithState running counts converge to the batch aggregate") {
    val dir = "/root/testdata/sf0.001"
    val q = EventsPipeline.streamStatefulUserCounts(spark, dir, "test_state_sink")
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("test_state_sink")
      .groupBy("user_id")
      .agg(max(col("n_events")).as("n"), max(col("n_purchases")).as("np"))
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val batch = spark.read.parquet(s"$dir/events.parquet")
      .groupBy("user_id")
      .agg(count(lit(1)).as("n"),
        count(when(col("event_type") === "purchase", 1)).as("np"))
    assert(streamed.except(batch).isEmpty && batch.except(streamed).isEmpty)
  }

  test("stream-stream inner join pairs equal the batch self-join") {
    val dir = "/root/testdata/sf0.001"
    val q = EventsPipeline.streamStreamJoin(spark, dir, "test_ssj_sink")
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("test_ssj_sink").select("user_id", "c_id", "p_id")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val ev = spark.read.parquet(s"$dir/events.parquet")
      .transform(EventsPipeline.tsToTimestamp(_))
    val c = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts").as("c_ts"), col("event_id").as("c_id"))
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"), col("event_id").as("p_id"))
    val batch = c.join(p, col("user_id") === col("p_user") &&
        col("p_ts") >= col("c_ts") &&
        col("p_ts") <= col("c_ts") + expr("INTERVAL 10 MINUTES"))
      .select("user_id", "c_id", "p_id")
    assert(streamed.except(batch).isEmpty && batch.except(streamed).isEmpty)
  }

  test("stream-stream LEFT OUTER join equals the batch left join, tail rows included") {
    val dir = "/root/testdata/sf0.001"
    val q = EventsPipeline.streamStreamLeftJoin(spark, dir, "test_sslj_sink")
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("test_sslj_sink")
      .filter(col("user_id") >= 0).select("user_id", "c_id", "p_id")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val ev = spark.read.parquet(s"$dir/events.parquet")
      .transform(EventsPipeline.tsToTimestamp(_))
    val c = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts").as("c_ts"), col("event_id").as("c_id"))
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"), col("event_id").as("p_id"))
    val batch = c.join(p, col("user_id") === col("p_user") &&
        col("p_ts") >= col("c_ts") &&
        col("p_ts") <= col("c_ts") + expr("INTERVAL 10 MINUTES"), "left_outer")
      .select("user_id", "c_id", "p_id")
    assert(streamed.except(batch).isEmpty && batch.except(streamed).isEmpty,
      "stream left join must equal batch left join")
    // the regression this operator exists to avoid: the LAST unmatched
    // click before end-of-stream must still emit its outer null — it
    // only can if the sentinel advanced the watermark past its window
    val lastUnmatched = batch.filter(col("p_id").isNull)
      .orderBy(col("c_id").desc).select("c_id").first().getLong(0)
    assert(streamed.filter(col("c_id") === lastUnmatched).count() == 1,
      s"tail click $lastUnmatched lost: watermark never passed its join window")
  }

  test("cohortRetention: day-0 is the full cohort; later offsets count returners") {
    def at(day: Int, sec: Long) =
      java.sql.Timestamp.valueOf(f"2024-01-${day}%02d 00:00:${sec}%02d")
    val ev = Seq(
      (1L, at(1, 1), 1L), (1L, at(2, 1), 2L),   // cohort d1, returns d2
      (2L, at(1, 2), 3L),                       // cohort d1, never returns
      (3L, at(2, 1), 4L), (3L, at(2, 30), 5L))  // cohort d2 (2 events, 1 day)
      .toDF("user_id", "ts", "event_id")
    val got = EventsPipeline.cohortRetention(ev)
      .as[(String, Long, Long, Long)].collect().toSet
    assert(got == Set(
      ("2024-01-01", 0L, 2L, 2L), ("2024-01-01", 1L, 1L, 2L),
      ("2024-01-02", 0L, 1L, 1L)), got.toString)
  }

  test("streamCountMinMaintain: drained stream sketch equals the batch build") {
    val dir = "/root/testdata/sf0.001"
    EventsPipeline.drained(spark) {
      EventsPipeline.streamCountMinMaintain(spark, dir, "t_cm_sink",
        "event_type", depth = 4, width = 32)
    }
    val streamed = spark.table("t_cm_sink")
      .as[(Int, Long, Long)].collect().toSet
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val batch = graft.ops.Profile.countMinBuild(
        spark.read.parquet(s"$dir/events.parquet")
          .select(col("event_type").cast("string").as("v")),
        "v", depth = 4, width = 32)
      .as[(Int, Long, Long)].collect().toSet
    assert(streamed == batch,
      s"incremental merge must equal the from-scratch sketch: " +
        s"${(streamed -- batch).take(3)} / ${(batch -- streamed).take(3)}")
  }

  test("streamQuantileMaintain: merged sketch holds the rank bound vs exact") {
    val dir = "/root/testdata/sf0.001"
    val k = 64
    EventsPipeline.drained(spark) {
      EventsPipeline.streamQuantileMaintain(spark, dir, "t_kll_sink", k = k)
    }
    val sk = graft.ops.Profile.quantileSketchMerge(spark.table("t_kll_sink"), k)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val vals = spark.read.parquet(s"$dir/events.parquet")
      .select(round(col("value") * 100, 0).cast("long").as("v"))
      .as[Long].collect().sorted
    assert(sk.count == vals.length,
      s"sketch weight ${sk.count} != ${vals.length} rows")
    // every derived cut's EXACT rank within the q177 contract (6N/k)
    val slack = (6L * vals.length + k - 1) / k
    Seq(0.25, 0.5, 0.9).foreach { q =>
      val cut = sk.quantile(q)
      val exactRank = vals.count(_ <= cut.toLong)
      val target = math.ceil(q * vals.length).toLong
      assert(math.abs(exactRank - target) <= slack,
        s"q=$q cut=$cut rank=$exactRank target=$target slack=$slack")
    }
  }

  test("timeWeightedSum: value x hold-duration integral; last observation open") {
    def at(sec: Long) = new java.sql.Timestamp(sec * 1000)
    val ev = Seq(
      (1L, at(0), 1L, 100L),   // holds 10 s at 100 -> 1000
      (1L, at(10), 2L, 300L),  // holds 5 s at 300 -> 1500
      (1L, at(15), 3L, 999L),  // last: contributes nothing
      (2L, at(0), 4L, 50L))    // single observation: no span at all
      .toDF("user_id", "ts", "event_id", "value_cents")
    val got = EventsPipeline.timeWeightedSum(ev)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(got == Map(1L -> ((2500L, 15L))), got.toString)
  }

  test("eventTransitions: consecutive-pair counts per user, first event skipped") {
    def r(u: Long, s: Long, t: String) = (u, new java.sql.Timestamp(s * 1000), s, t)
    val ev = Seq(r(1, 1, "a"), r(1, 2, "b"), r(1, 3, "a"),
      r(2, 1, "a"), r(2, 2, "b"))
      .toDF("user_id", "ts", "event_id", "event_type")
    val got = EventsPipeline.eventTransitions(ev)
      .as[(String, String, Long)].collect().toSet
    assert(got == Set(("a", "b", 2L), ("b", "a", 1L)), got.toString)
  }

  test("dropConsecutiveDuplicates keeps only value changes per key") {
    val ev = Seq(
      (1L, 1L, "on"), (1L, 2L, "on"), (1L, 3L, "off"), (1L, 4L, "off"),
      (1L, 5L, "on"),
      (2L, 6L, "off"))
      .map { case (u, i, st) => (u, new java.sql.Timestamp(i * 1000), i, st) }
      .toDF("user_id", "ts", "event_id", "state")
    val kept = EventsPipeline
      .dropConsecutiveDuplicates(ev, "user_id", Seq("state"))
      .select("event_id").as[Long].collect().toSet
    assert(kept == Set(1L, 3L, 5L, 6L), s"kept: $kept")
  }

  test("dropConsecutiveDuplicates: multi-column signatures don't collide") {
    // Adjacent rows whose payloads differ only in column BOUNDARIES or
    // null placement are genuine changes and must all survive; a true
    // repeat is still dropped.
    val ev = Seq(
      (1L, 1L, "ab", "c"), (1L, 2L, "a", "bc"),      // boundary shift
      (1L, 3L, "x", null), (1L, 4L, null, "x"),      // null placement
      (1L, 5L, "x", ""), (1L, 6L, "x", null),        // empty vs null
      (1L, 7L, "x", null))                           // true repeat — drop
      .map { case (u, i, a, b) => (u, new java.sql.Timestamp(i * 1000), i, a, b) }
      .toDF("user_id", "ts", "event_id", "a", "b")
    val kept = EventsPipeline
      .dropConsecutiveDuplicates(ev, "user_id", Seq("a", "b"))
      .select("event_id").as[Long].collect().toSet
    assert(kept == Set(1L, 2L, 3L, 4L, 5L, 6L), s"kept: $kept")
  }

  test("attributeConversions: window clamps both credits, organic " +
      "conversions null, same-instant touch excluded, per-key") {
    // user 1: old touch (outside the 100 s window), two in-window
    // touches, conversion at t=200; user 2: organic (same-instant
    // touch excluded); user 3: later touch must not credit earlier
    val fixed = Seq(
      (1L, 10L, 50L, "click"), (1L, 11L, 120L, "click"),
      (1L, 12L, 150L, "click"), (1L, 13L, 200L, "purchase"),
      (2L, 20L, 300L, "click"), (2L, 21L, 300L, "purchase"),
      (3L, 30L, 400L, "purchase"), (3L, 31L, 410L, "click"))
      .map { case (u, id, s, t) => (u, id, new Timestamp(s * 1000), t) }
      .toDF("user_id", "event_id", "ts", "event_type")
    val got = graft.streaming.EventsPipeline.attributeConversions(
        fixed, "user_id", "ts", "event_id", "event_type",
        "click", "purchase", lookbackSec = 100L)
      .select("user_id", "conversion_id", "last_touch_id",
        "first_touch_id")
      .as[(Long, Long, Option[Long], Option[Long])].collect().toSet
    assert(got == Set(
      (1L, 13L, Some(12L), Some(11L)), // 10 is outside the window
      (2L, 21L, None, None),           // same-instant touch excluded
      (3L, 30L, None, None)), s"got $got")
  }

  test("cusumFlags: sustained small drift alarms where a spike " +
      "doesn't, crossing resets, both sides, per-key isolation") {
    // ref 100, slack 10, h 50: key 1 drifts +30/event (net +20) →
    // alarms at the 3rd event (60 > 50), resets, alarms again at the
    // 6th; key 2 has one +45 spike (net 35 < 50, decays) → silent;
    // key 3 drifts DOWN −40 (net 30) → down alarm at the 2nd event.
    def ev(k: Long, xs: Long*) =
      xs.zipWithIndex.map { case (x, i) => (k, i.toLong + 1, x) }
    val df = (ev(1L, 130, 130, 130, 130, 130, 130) ++
      ev(2L, 145, 100, 100) ++
      ev(3L, 60, 60)).toDF("k", "seq", "v")
    val got = graft.streaming.EventsPipeline.cusumFlags(df, "k", "seq",
        "v", ref = 100L, slack = 10L, h = 50L)
      .select("k", "seq", "side", "stat")
      .as[(Long, Long, String, Long)].collect().toSet
    assert(got == Set((1L, 3L, "up", 60L), (1L, 6L, "up", 60L),
      (3L, 2L, "down", 60L)), s"got $got")
    intercept[IllegalArgumentException] {
      graft.streaming.EventsPipeline.cusumFlags(df, "k", "seq", "v",
        100L, 0L, 0L)
    }
  }

  test("haarSketch: hand 4-point series, integer sum/detail folds, " +
      "approximation carries the total, top-K by |coef| with ties, " +
      "zero-filled grid, guards") {
    def ts(s: Long) = new Timestamp(s * 1000L)
    // hourly counts [3, 1, 4, 4] → level0 details (2, 0),
    // level1 detail −4, approximation 12
    val rows = Seq.fill(3)(0L) ++ Seq(1L) ++ Seq.fill(4)(2L) ++
      Seq.fill(4)(3L)
    val df = rows.zipWithIndex.map { case (h, i) =>
      (i.toLong, ts(h * 3600L + 10L))
    }.toDF("event_id", "ts")
    val got = graft.streaming.EventsPipeline
      .haarSketch(df, "ts", gridLen = 4, topK = 2)
      .as[(Long, Long, Long)].collect().toSet
    assert(got == Set((2L, 0L, 12L), (1L, 0L, -4L), (0L, 0L, 2L)),
      s"got $got")
    intercept[IllegalArgumentException] {
      graft.streaming.EventsPipeline.haarSketch(df, "ts", gridLen = 6)
    }
  }

  test("acf: hand 4-point series, exact centered products, negative " +
      "lag-2 anticorrelation, constant series yields null, guards") {
    def ts(s: Long) = new Timestamp(s * 1000L)
    // key a hourly counts [1,2,3,4]: n=4, S=10, c = 4x−S = [−6,−2,2,6],
    // den = 80; lag1 num = 12−4+12 = 20 → 250000 ppm;
    // lag2 num = −12−12 = −24 → −300000 ppm.
    // key b constant [1,1,1,1]: den = 0 → null.
    val rows = (0 until 4).flatMap(h =>
      Seq.fill(h + 1)(("a", h.toLong))) ++
      (0 until 4).map(h => ("b", h.toLong))
    val df = rows.zipWithIndex.map { case ((k, h), i) =>
      (i.toLong, k, ts(h * 3600L + 5L))
    }.toDF("event_id", "event_type", "ts")
    val got = graft.streaming.EventsPipeline
      .acf(df, "ts", "event_type", gridLen = 4, lags = Seq(1, 2))
      .as[(String, Long, Option[Long])].collect().toSet
    assert(got == Set(("a", 1L, Some(250000L)),
      ("a", 2L, Some(-300000L)), ("b", 1L, None), ("b", 2L, None)),
      s"got $got")
    intercept[IllegalArgumentException] {
      graft.streaming.EventsPipeline.acf(df, "ts", "event_type",
        gridLen = 4, lags = Seq(4))
    }
    intercept[IllegalArgumentException] {
      graft.streaming.EventsPipeline.acf(df, "ts", "event_type",
        lags = Seq.empty)
    }
    intercept[IllegalArgumentException] {
      graft.streaming.EventsPipeline.acf(df, "ts", "event_type",
        lags = Seq(1, 1))
    }
  }

  test("sprtReplay: hand walks hit upper/lower at the FIRST crossing, " +
      "no-crossing continues with the final llr, guards") {
    def ts(s: Long) = new Timestamp(s * 1000L)
    // inc: success +3, fail −2; bounds +5 / −4.
    // key a  S S F S → llr 3, 6 → crosses upper at n=2 (llr 6).
    // key b  F F F   → llr −2, −4 → crosses lower at n=2 (llr −4).
    // key c  S F     → llr 3, 1 → never crosses → continue, llr 1.
    val rows = Seq(
      ("a", 0L, 0L, true), ("a", 1L, 1L, true), ("a", 2L, 2L, false),
      ("a", 3L, 3L, true),
      ("b", 0L, 4L, false), ("b", 1L, 5L, false), ("b", 2L, 6L, false),
      ("c", 0L, 7L, true), ("c", 1L, 8L, false))
    val df = rows.map { case (k, s, q, ok) => (k, ts(s), q, ok) }
      .toDF("k", "ts", "seq", "ok")
    val got = graft.streaming.EventsPipeline
      .sprtReplay(df, "k", "ts", "seq", col("ok"),
        lnSuccU6 = 3L, lnFailU6 = -2L, upperU6 = 5L, lowerU6 = -4L)
      .as[(String, String, Long, Long)].collect().toSet
    assert(got == Set(("a", "accept_h1", 2L, 6L),
      ("b", "accept_h0", 2L, -4L), ("c", "continue", 2L, 1L)),
      s"got $got")
    intercept[IllegalArgumentException] {
      graft.streaming.EventsPipeline.sprtReplay(df, "k", "ts", "seq",
        col("ok"), lnSuccU6 = -1L, lnFailU6 = -2L, upperU6 = 5L,
        lowerU6 = -4L)
    }
    intercept[IllegalArgumentException] {
      graft.streaming.EventsPipeline.sprtReplay(df, "k", "ts", "seq",
        col("ok"), lnSuccU6 = 3L, lnFailU6 = -2L, upperU6 = 5L,
        lowerU6 = 1L)
    }
  }

  test("pettittChangePoint: hand level shift located at the break, " +
      "signed direction, earliest-m tie-break via constant tail, " +
      "guards") {
    def ts(s: Long) = new Timestamp(s * 1000L)
    // key a, gridLen 6: hourly counts [1,1,1,11,11,11] (h-th hour gets
    // h∈{0,1,2} → 1 event, h∈{3,4,5} → 11). Ranks (x, h) = 1..6 in
    // order; W = 1,3,6,10,15,21; U_m = 2W − 7m = [−5,−8,−9,−8,−5] →
    // argmax |U| at m=3, U = −9 (negative: later half higher).
    val rows = (0 until 6).flatMap { h =>
      val n = if (h < 3) 1 else 11
      Seq.fill(n)(("a", h.toLong))
    }
    val df = rows.zipWithIndex.map { case ((k, h), i) =>
      (i.toLong, k, ts(h * 3600L + 9L))
    }.toDF("event_id", "event_type", "ts")
    val got = graft.streaming.EventsPipeline
      .pettittChangePoint(df, "ts", "event_type", gridLen = 6)
      .as[(String, Long, Long, Long)].collect().toSet
    assert(got == Set(("a", 3L, -9L, 9L)), s"got $got")
    intercept[IllegalArgumentException] {
      graft.streaming.EventsPipeline.pettittChangePoint(df, "ts",
        "event_type", gridLen = 2)
    }
  }

  test("markovAttribution: hand 4-journey chain — exact ppm matrix, " +
      "truncated value iteration, removal clamps, path truncation at " +
      "first conversion, guards") {
    def ts(s: Long) = new Timestamp(s * 1000L)
    // u1: A→conv; u2: A→B (no conv); u3: B→conv; u4: A (no conv).
    // u1 gets a post-conversion event that MUST be truncated away.
    // Matrix: start→A 750000, start→B 250000; A→B 333333,
    // bp(A)=333333; bp(B)=500000. Converged: p(B)=500000,
    // p(A)=499999, p_full(start)=499999. Remove A → 125000;
    // remove B → 249999.
    val rows = Seq(
      (1L, 0L, "A"), (1L, 1L, "purchase"), (1L, 2L, "A"),
      (2L, 0L, "A"), (2L, 1L, "B"),
      (3L, 0L, "B"), (3L, 1L, "purchase"),
      (4L, 0L, "A"))
    val df = rows.zipWithIndex.map { case ((u, t, e), i) =>
      (u, ts(t), i.toLong, e)
    }.toDF("u", "ts", "seq", "etype")
    val got = graft.streaming.EventsPipeline
      .markovAttribution(df, "u", "ts", "seq", "etype", "purchase",
        iters = 12)
      .as[(String, Long, Long, Long)].collect().toSet
    assert(got == Set(("A", 499999L, 125000L, 374999L),
      ("B", 499999L, 249999L, 250000L)), s"got $got")
    intercept[IllegalArgumentException] {
      graft.streaming.EventsPipeline.markovAttribution(df, "u", "ts",
        "seq", "etype", "purchase", iters = 0)
    }
    intercept[IllegalArgumentException] {
      graft.streaming.EventsPipeline.markovAttribution(df, "u", "ts",
        "seq", "etype", "")
    }
  }

  test("kleinbergBursts: hand d-walk finds the rapid-fire interval, " +
      "backward tie-breaks to base state, degenerate keys emit " +
      "nothing, guards") {
    def ts(s: Long) = new Timestamp(s * 1000L)
    // key a: events at 0,100,200,201,202,203,300 → gaps
    // [100,100,1,1,1,97], n=6, T=300, α₀ = 20000 ppm/s;
    // Δk = 20000·x − 693147 → [1306853, 1306853, −673147×3, 1246853].
    // d: 1e6 → 2306853, 2306853, 326853, −346294, −673147, 1246853.
    // Backward from state 0 at gap 6: gaps 3..5 are state 1 — the
    // 200..203 rapid-fire cluster; weight = 3·673147 = 2019441.
    // key b: two coincident events (T = 0) → nothing.
    // key c: one event → nothing.
    val rows =
      Seq(0L, 100L, 200L, 201L, 202L, 203L, 300L).zipWithIndex.map {
        case (t, i) => ("a", ts(t), i.toLong)
      } ++ Seq(("b", ts(5L), 90L), ("b", ts(5L), 91L), ("c", ts(9L), 92L))
    val df = rows.toDF("k", "ts", "seq")
    val got = graft.streaming.EventsPipeline
      .kleinbergBursts(df, "k", "ts", "seq")
      .as[(String, Long, Long, Long, Long, Long, Long)].collect().toSet
    assert(got == Set(("a", 3L, 5L, 3L, 200L, 203L, 2019441L)),
      s"got $got")
    intercept[IllegalArgumentException] {
      graft.streaming.EventsPipeline.kleinbergBursts(df, "k", "ts",
        "seq", sFactor = 1)
    }
    intercept[IllegalArgumentException] {
      graft.streaming.EventsPipeline.kleinbergBursts(df, "k", "ts",
        "seq", lnSU6 = 0L)
    }
    intercept[IllegalArgumentException] {
      graft.streaming.EventsPipeline.kleinbergBursts(df, "k", "ts",
        "seq", maxSteps = 1)
    }
  }

  test("holtSmoothing: hand level/trend recurrence, SAE accumulation, " +
      "per-key isolation, guards") {
    def ts(s: Long) = new Timestamp(s * 1000L)
    // alpha = beta = 0.5, series 1.0, 3.0, 2.0 (milli 1000/3000/2000):
    //   t2: f=1000, sae=2000, l=2000, b=500
    //   t3: f=2500, sae=2500, l=2250, b=375 → forecast 2625
    val df = Seq((1L, ts(1), 1L, 1.0), (1L, ts(2), 2L, 3.0),
      (1L, ts(3), 3L, 2.0), (2L, ts(1), 4L, 7.0))
      .toDF("k", "ts", "eid", "value")
    val got = graft.streaming.EventsPipeline.holtSmoothing(
        df, "k", "ts", "eid", "value", 500000L, 500000L)
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSet
    assert(got == Set((1L, 3L, 2250L, 375L, 2500L, 2625L),
      (2L, 1L, 7000L, 0L, 0L, 7000L)), s"got $got")
    intercept[IllegalArgumentException] {
      graft.streaming.EventsPipeline.holtSmoothing(df, "k", "ts",
        "eid", "value", 1000001L, 0L)
    }
  }

  test("coec: ppm position priors, per-item expected sums, truncating " +
      "ratio, zero-expectation null") {
    // pos 0: 2/4 clicks → 500000 ppm; pos 1: 0/2 → 0 ppm.
    // item A: 2 impr at pos 0, 2 clicks → exp 1000000 → coec 2.000
    // item B: 2 impr at pos 0, 0 clicks → exp 1000000 → coec 0
    // item C: only pos 1 → exp 0 → coec null
    val df = Seq(("A", 0L, 1L), ("A", 0L, 1L), ("B", 0L, 0L),
      ("B", 0L, 0L), ("C", 1L, 0L), ("C", 1L, 0L))
      .toDF("item", "pos", "clk")
    val got = graft.streaming.EventsPipeline.coec(df, "item", "pos", "clk")
      .as[(String, Long, Long, Long, Option[Long])].collect().toSet
    assert(got == Set(("A", 2L, 2L, 1000000L, Some(2000L)),
      ("B", 2L, 0L, 1000000L, Some(0L)),
      ("C", 2L, 0L, 0L, None)), s"got $got")
  }

  test("markovAccuracy: argmax model from even users, held-out " +
      "per-state accuracy, unseen state predicts null miss") {
    def ts(s: Long) = new Timestamp(s * 1000L)
    def seq(u: Long, types: String*) = types.zipWithIndex.map {
      case (t, i) => (u, ts(i.toLong), u * 100 + i, t)
    }
    // train u0: (a→b)×2, (b→a)×2, (a→c) → pred(a)=b, pred(b)=a;
    // train u2: (c→a) → pred(c)=a. test u1: a→b ✓, b→c ✗, c→a ✓;
    // test u3: d→a with d unseen → null pred, miss.
    val df = (seq(0L, "a", "b", "a", "b", "a", "c") ++
      seq(2L, "c", "a") ++ seq(1L, "a", "b", "c", "a") ++
      seq(3L, "d", "a")).toDF("user_id", "ts", "event_id", "event_type")
    val got = graft.streaming.EventsPipeline.markovAccuracy(df)
      .as[(String, Option[String], Long, Long)].collect().toSet
    assert(got == Set(("a", Some("b"), 1L, 1L), ("b", Some("a"), 1L, 0L),
      ("c", Some("a"), 1L, 1L), ("d", None, 1L, 0L)), s"got $got")
  }

  test("diffInDiff: midpoint cut, hand cell means, exact estimator") {
    def ts(s: Long) = new Timestamp(s * 1000L)
    // cut = (0+3) div 2 = 1, post = ts > 1. Cells: T,pre 1e6,
    // T,post 5e6, C,pre 2e6, C,post 3e6 → DiD = (5−1)−(3−2) = 3e6.
    val df = Seq((1L, ts(0), 1.0), (0L, ts(1), 2.0),
      (1L, ts(2), 5.0), (0L, ts(3), 3.0)).toDF("treated", "ts", "value")
    val got = graft.streaming.EventsPipeline
      .diffInDiff(df, "treated", "ts", "value")
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(got == Set(
      (0L, 0L, 1L, 2000000L, 3000000L), (0L, 1L, 1L, 3000000L, 3000000L),
      (1L, 0L, 1L, 1000000L, 3000000L), (1L, 1L, 1L, 5000000L, 3000000L)),
      s"got $got")
  }

  test("cuped: per-unit milli means, hand integer theta, adjusted " +
      "arm means, pre-only unit dropped") {
    def ts(s: Long) = new Timestamp(s * 1000L)
    // cut = 5. units: u1 (t1) x=2000 y=4000; u2 (t0) x=1000 y=2000;
    // u3 (t1) x=3000 y=5000; u4 pre-only → dropped. theta = 9e6/6e6
    // → 1500000; xbar 2000; adj: u1 4000, u2 3500, u3 3500.
    val df = Seq(
      (1L, 1L, ts(0), 1.0), (1L, 1L, ts(1), 3.0), (1L, 1L, ts(10), 4.0),
      (2L, 0L, ts(2), 1.0), (2L, 0L, ts(9), 2.0),
      (3L, 1L, ts(3), 3.0), (3L, 1L, ts(8), 5.0),
      (4L, 0L, ts(4), 9.0)).toDF("unit", "treated", "ts", "value")
    val got = graft.streaming.EventsPipeline
      .cuped(df, "unit", "treated", "ts", "value")
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(got == Set((0L, 1L, 2000L, 3500L, 1500000L),
      (1L, 2L, 4500L, 3750L, 1500000L)), s"got $got")
  }

  test("ucb1Replay: unpulled-first init, micro exploration bonus " +
      "hand-walked, only matched events update, global arm set can " +
      "strand a key, deterministic") {
    def ts(s: Long) = new Timestamp(s * 1000L)
    // key 1 sees both arms; key 2 logs only 'a', so once the policy
    // wants to init 'b' it never matches again (replay semantics).
    val df = Seq(
      (1L, ts(1), 1L, "a", 150.0), (1L, ts(2), 2L, "a", 50.0),
      (1L, ts(3), 3L, "b", 50.0), (1L, ts(4), 4L, "a", 150.0),
      (1L, ts(5), 5L, "b", 150.0),
      (2L, ts(1), 6L, "a", 150.0), (2L, ts(2), 7L, "a", 150.0),
      (2L, ts(3), 8L, "a", 50.0))
      .toDF("k", "ts", "eid", "arm", "value")
    val got = graft.streaming.EventsPipeline.ucb1Replay(
        df, "k", "ts", "eid", "arm", "value", rewardThreshold = 100.0)
      .as[(Long, String, Long, Long, Long)].collect().toSet
    // key 1 walk: init a (match, r=1) → init b wanted, logged a →
    // init b (match) → τ=3 scores a=2482304 vs b=1482304 → a matches
    // → τ=4 a=2177410 vs b=1665109, wants a, logged b → no update
    assert(got == Set(
      (1L, "a", 2L, 2L, 3L), (1L, "b", 1L, 0L, 3L),
      (2L, "a", 1L, 1L, 1L), (2L, "b", 0L, 0L, 1L)), s"got $got")
    val again = graft.streaming.EventsPipeline.ucb1Replay(
        df, "k", "ts", "eid", "arm", "value", 100.0)
      .as[(Long, String, Long, Long, Long)].collect().toSet
    assert(again == got, "deterministic")
  }

  test("kaplanMeier: lifetimes, horizon censoring, shrinking risk " +
      "sets, micro ln steps, terminal-death latch, bad-arg reject") {
    def ts(s: Long) = new Timestamp(s * 1000L)
    // window end 36000: u1 (10 h) is inside the 1 h horizon → censored;
    // u2 (1 h), u3/u4 (2 h) churned. ln(3/4) → −287682, ln(1/3) →
    // −1098612; cumulative −1386294 holds through the censored tail.
    val df = Seq(
      (1L, ts(0L)), (1L, ts(36000L)),
      (2L, ts(0L)), (2L, ts(3600L)),
      (3L, ts(0L)), (3L, ts(7200L)),
      (4L, ts(1000L)), (4L, ts(8200L))).toDF("user_id", "ts")
    val got = graft.streaming.EventsPipeline
      .kaplanMeier(df, "user_id", "ts", censorHours = 1L)
      .orderBy("t_h")
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      (1L, 4L, 1L, 0L, -287682L, 0L),
      (2L, 3L, 2L, 0L, -1386294L, 0L),
      (10L, 1L, 0L, 1L, -1386294L, 0L)), s"got $got")
    // no horizon → the last survivor's death empties the risk set:
    // null step (ln 0 undefined), s_zero latches.
    val zero = graft.streaming.EventsPipeline
      .kaplanMeier(df, "user_id", "ts", censorHours = 0L)
      .orderBy("t_h")
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(zero.last == ((10L, 1L, 1L, 0L, -1386294L, 1L)), s"got $zero")
    intercept[IllegalArgumentException] {
      graft.streaming.EventsPipeline.kaplanMeier(df, "user_id", "ts",
        censorHours = -1L)
    }
  }

  test("seasonalDecompose: full-window centered trend, per-phase " +
      "seasonal means, exact truncating micro arithmetic, edge nulls, " +
      "per-key isolation, odd period enforced") {
    val df = ((1 to 6).map(i =>
        (1L, i.toLong, Seq(1d, 5d, 2d, 8d, 4d, 7d)(i - 1))) ++
      (1 to 4).map(i => (2L, i.toLong, 3d))).toDF("k", "seq", "v")
    val got = graft.streaming.EventsPipeline.seasonalDecompose(
        df, "k", Seq("seq"), "v", period = 3)
      .select("k", "idx", "phase", "v_u6", "trend_u6", "seasonal_u6",
        "resid_u6")
      .as[(Long, Long, Long, Long, Option[Long], Option[Long],
        Option[Long])].collect().toSet
    assert(got == Set(
      (1L, 1L, 0L, 1000000L, None, None, None),
      (1L, 2L, 1L, 5000000L, Some(2666666L), Some(0L), Some(2333334L)),
      (1L, 3L, 2L, 2000000L, Some(5000000L), Some(-3000000L), Some(0L)),
      (1L, 4L, 0L, 8000000L, Some(4666666L), Some(3333334L), Some(0L)),
      (1L, 5L, 1L, 4000000L, Some(6333333L), Some(0L), Some(-2333333L)),
      (1L, 6L, 2L, 7000000L, None, None, None),
      (2L, 1L, 0L, 3000000L, None, None, None),
      (2L, 2L, 1L, 3000000L, Some(3000000L), Some(0L), Some(0L)),
      (2L, 3L, 2L, 3000000L, Some(3000000L), Some(0L), Some(0L)),
      (2L, 4L, 0L, 3000000L, None, None, None)), s"got $got")
    intercept[IllegalArgumentException] {
      graft.streaming.EventsPipeline.seasonalDecompose(
        df, "k", Seq("seq"), "v", period = 4)
    }
  }

  test("latenessAudit: running high-water mark per key, exact micro " +
      "lags, drop verdicts per candidate delay, in-order keys silent") {
    def r(u: Long, seq: Long, epochS: Long) =
      (u, seq, new Timestamp(epochS * 1000))
    val ev = Seq(
      // user 1: arrives 0,100,50,90 (seq order) — 50 is 50 s late,
      // 90 is 10 s late; the mark never regresses
      r(1L, 1L, 0L), r(1L, 2L, 100L), r(1L, 3L, 50L), r(1L, 4L, 90L),
      // user 2: perfectly ordered → absent entirely
      r(2L, 5L, 10L), r(2L, 6L, 20L),
      // user 3: equal timestamp is NOT late (strict <)
      r(3L, 7L, 5L), r(3L, 8L, 5L))
      .toDF("user_id", "event_id", "ts")
    val got = graft.streaming.EventsPipeline.latenessAudit(ev,
        "user_id", "event_id", "ts", Seq(20L, 60L))
      .select("user_id", "event_id", "late_us", "dropped_20s", "dropped_60s")
      .as[(Long, Long, Long, Boolean, Boolean)].collect().toSet
    assert(got == Set(
      (1L, 3L, 50000000L, true, false),
      (1L, 4L, 10000000L, false, false)), s"got $got")
    intercept[IllegalArgumentException] {
      graft.streaming.EventsPipeline.latenessAudit(ev, "user_id",
        "event_id", "ts", Nil)
    }
  }

  test("funnelCounts: strict ordering — a purchase before the click doesn't convert") {
    def r(u: Long, s: Long, t: String) =
      (u, new java.sql.Timestamp(s * 1000), s, t)
    val ev = Seq(
      // user 1 completes the funnel in order
      r(1, 10, "signup"), r(1, 20, "click"), r(1, 30, "purchase"),
      // user 2: purchase BEFORE click -> reaches click only
      r(2, 10, "signup"), r(2, 15, "purchase"), r(2, 20, "click"),
      // user 3: click without signup -> reaches nothing
      r(3, 10, "click"), r(3, 20, "purchase"),
      // user 4: signup only
      r(4, 10, "signup"))
      .toDF("user_id", "ts", "event_id", "event_type")
    val got = EventsPipeline
      .funnelCounts(ev, Seq("signup", "click", "purchase"))
      .select("step_index", "step", "users")
      .as[(Long, String, Long)].collect().sortBy(_._1).toSeq
    assert(got == Seq((1L, "signup", 3L), (2L, "click", 2L), (3L, "purchase", 1L)),
      got.toString)
  }

  test("funnelCounts: unreached steps report zero rows, not missing rows") {
    val ev = Seq((1L, new java.sql.Timestamp(1000L), 1L, "signup"))
      .toDF("user_id", "ts", "event_id", "event_type")
    val got = EventsPipeline
      .funnelCounts(ev, Seq("signup", "click", "purchase"))
      .select("step_index", "step", "users")
      .as[(Long, String, Long)].collect().sortBy(_._1).toSeq
    assert(got == Seq((1L, "signup", 1L), (2L, "click", 0L), (3L, "purchase", 0L)),
      got.toString)
  }

  test("streamQuotaAdmission: at most cap per user, earliest events win") {
    val dir = "/root/testdata/sf0.001"
    val q = EventsPipeline.streamQuotaAdmission(spark, dir, "test_quota_sink", cap = 3)
    q.processAllAvailable()
    q.stop()
    val admitted = spark.table("test_quota_sink")
    val perUser = admitted.groupBy("user_id").count()
      .agg(max("count")).first().getLong(0)
    assert(perUser <= 3, s"cap violated: $perUser")
    // single-batch drain == batch rank by (ts, event_id)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val ev = spark.read.parquet(s"$dir/events.parquet")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val batch = ev.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3).select("user_id", "event_id")
    assert(admitted.except(batch).isEmpty && batch.except(admitted).isEmpty,
      "admitted set must equal the batch rank formulation")
  }

  test("cursor checkpoint round-trips and fixes the reference's broken resume (Q1)") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_cursor").toString + "/c"
    val state = EventsPipeline.CursorState("scotus", "cursor-abc123", ts("2024-06-01 00:00:00"))
    EventsPipeline.CursorCheckpoint.save(spark, tmp, state)
    val loaded = EventsPipeline.CursorCheckpoint.load(spark, tmp)
    assert(loaded.contains(state))
    assert(EventsPipeline.CursorCheckpoint.load(spark, tmp + "_missing").isEmpty)
  }
}

class ChunkPipelineSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._
  import graft.ingest.ChunkPipeline
  import graft.text.Uuid5

  test("chunk ids are uuid5(chunk_id); vectors are unit-norm; P4 filter applies") {
    val sentences = (1 to 60).map(i => s"Sentence number $i of the long opinion ends here.").mkString(" ")
    val docs = Seq((7L, sentences), (8L, "too short")).toDF("doc_id", "text")
    val pts = ChunkPipeline.chunkPoints(spark, docs)
    val rows = pts.select("doc_id", "chunk_id", "id").as[(Long, String, String)].collect()
    assert(rows.nonEmpty && rows.forall(_._1 == 7L), "short doc dropped by P4")
    rows.foreach { case (_, chunkId, id) => assert(id == Uuid5(chunkId)) }
    val norms = pts.select(sqrt(graft.functions.GraftFunctions.vecDot(col("dense_vec"), col("dense_vec"))))
      .as[Double].collect()
    norms.foreach(n => assert(math.abs(n - 1.0) < 1e-5))
  }

  test("F9 processing exposes citations/entities/stats columns") {
    val docs = Seq((1L, "<p>Justice Marshall cited 347 U.S. 483 (1954) in Brown v. Board.</p>"))
      .toDF("doc_id", "text")
    val out = ChunkPipeline.processed(docs)
    val row = out.select("opinion_text", "citations", "text_stats.citation_count").head()
    assert(!row.getString(0).contains("<p>"))
    assert(row.getSeq[String](1).exists(_.startsWith("347 U.S.")))
    assert(row.getLong(2) == row.getSeq[String](1).size)
  }
}
