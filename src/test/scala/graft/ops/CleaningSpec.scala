package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class CleaningSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("equiWidthHistogram: bins partition the range, counts sum to n, max in last bin") {
    val df = (0 to 100).map(_.toDouble).toDF("x")
    val out = Cleaning.equiWidthHistogram(df, "x", bins = 10)
      .orderBy("bin").collect()
    assert(out.map(_.getLong(3)).sum == 101)
    assert(out.head.getDouble(1) == 0.0 && out.last.getDouble(2) == 100.0)
    // x = 100 (the max) falls in bin 9, not a phantom bin 10
    assert(out.last.getLong(0) == 9L && out.last.getLong(3) == 11L)
  }

  test("equiWidthHistogram: constant column collapses to one bin") {
    val df = Seq.fill(5)(7.0).toDF("x")
    val out = Cleaning.equiWidthHistogram(df, "x", bins = 4).collect()
    assert(out.length == 1 && out.head.getLong(0) == 0L && out.head.getLong(3) == 5L)
  }

  test("groupMeanImpute fills nulls with the group mean, flags them") {
    val df = Seq(
      ("a", Some(1.0)), ("a", Some(3.0)), ("a", None),
      ("b", Some(10.0)), ("b", None)).toDF("g", "v")
    val out = Cleaning.groupMeanImpute(df, "v", "g")
      .select("g", "imputed", "v_filled").collect()
    val imputedA = out.filter(r => r.getString(0) == "a" && r.getBoolean(1))
    val imputedB = out.filter(r => r.getString(0) == "b" && r.getBoolean(1))
    assert(imputedA.map(_.getDouble(2)).toSeq == Seq(2.0))
    assert(imputedB.map(_.getDouble(2)).toSeq == Seq(10.0))
    assert(out.count(!_.getBoolean(1)) == 3)
  }

  test("zscoreOutliers finds the planted outlier and skips zero-variance groups") {
    val normal = (1 to 20).map(i => ("a", 100.0 + (i % 3)))
    val planted = Seq(("a", 500.0))
    val constant = Seq(("c", 1.0), ("c", 1.0), ("c", 1.0))
    val df = (normal ++ planted ++ constant).toDF("g", "v")
    val out = Cleaning.zscoreOutliers(df, "v", "g", threshold = 3.0).collect()
    assert(out.length == 1)
    assert(out.head.getAs[Double]("v") == 500.0)
    assert(out.head.getAs[Double]("z") > 3.0)
  }

  test("validate routes bad rows to quarantine with reasons; null rule = failed") {
    val df = Seq(
      (1L, "ok text", 10L),
      (2L, null.asInstanceOf[String], 5L),   // null rule result must quarantine
      (3L, "x", -1L),                         // one violation
      (4L, "", -2L)                           // two violations, sorted
    ).toDF("id", "text", "n")
    val rules = Seq(
      "text_missing" -> (col("text").isNotNull && length(col("text")) > 0),
      "n_negative" -> (col("n") >= 0))
    val bad = Cleaning.quarantined(df, rules)
      .select("id", "violations").as[(Long, Seq[String])].collect().toMap
    assert(bad == Map(
      2L -> Seq("text_missing"),
      3L -> Seq("n_negative"),
      4L -> Seq("n_negative", "text_missing")))
    val good = Cleaning.admitted(df, rules).select("id").as[Long].collect().toSeq
    assert(good == Seq(1L))
    assert(!Cleaning.admitted(df, rules).columns.contains("violations"))
    // quarantined + admitted partition the input
    assert(bad.size + good.size == 4)
    // validation is narrow: no exchange in the plan
    val plan = Cleaning.validate(df, rules).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"validate must not shuffle:\n$plan")
    intercept[IllegalArgumentException] { Cleaning.validate(df, Seq.empty) }
  }

  test("madOutliers flags planted spikes; zero-MAD groups skipped") {
    // 27 inliers + 3 large spikes: with k spikes among n rows the plain
    // z-score of a spike is ~sqrt(n/k) = sqrt(10) ≈ 3.2 < 3.5 — the
    // spikes inflate sigma enough to MASK each other. Median/MAD barely
    // move, so the robust score flags all three.
    val df = ((1 to 27).map(i => ("a", 1L + i, 100.0 + (i % 10))) ++
      Seq(("a", 997L, 5000.0), ("a", 998L, 5200.0), ("a", 999L, 5400.0)) ++
      (1 to 10).map(i => ("b", 2000L + i, 7.0))) // constant group -> MAD 0
      .toDF("grp", "id", "v")
    val flagged = Cleaning.madOutliers(df, "v", "grp")
      .select("id").as[Long].collect().toSet
    assert(flagged == Set(997L, 998L, 999L), s"flagged: $flagged")
    val z = Cleaning.zscoreOutliers(df, "v", "grp", threshold = 3.5)
      .select("id").as[Long].collect().toSet
    assert(z.isEmpty, s"z-score should mask here, got $z")
  }

  test("winsorize clamps tails to group percentiles, keeps every row") {
    // group a: 1..100 -> p05 = 5.95, p95 = 95.05 (linear interpolation)
    val df = ((1 to 100).map(i => ("a", i.toDouble)) :+ (("b", 7.0)))
      .toDF("grp", "v")
    val out = Cleaning.winsorize(df, "grp", "v", 0.05, 0.95)
    assert(out.count() == 101, "winsorize never drops rows")
    val a = out.filter(col("grp") === "a").select("v_wins").as[Double].collect()
    assert(a.min == 5.95 && a.max == 95.05, s"bounds: ${a.min}/${a.max}")
    // interior values untouched
    assert(a.count(v => v == 50.0) == 1)
    // a single-row group maps to itself (p05 = p95 = the value)
    val b = out.filter(col("grp") === "b").select("v_wins").as[Double].head()
    assert(b == 7.0)
    intercept[IllegalArgumentException] { Cleaning.winsorize(df, "grp", "v", 0.9, 0.1) }
  }

  test("binnedDrift: shifted distribution shows up as bin-count deltas") {
    val df = (Seq.fill(10)(("a", 100L)) ++ Seq.fill(10)(("b", 100L)) ++
      Seq.fill(5)(("b", 900L))) // period b grew a tail bin
      .toDF("period", "v")
    val got = Cleaning.binnedDrift(df, "v", "period", binWidth = 500L)
      .as[(Long, Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3, r._4))
      .toMap
    assert(got == Map(0L -> ((10L, 10L, 0L)), 1L -> ((0L, 5L, 5L))), got.toString)
    intercept[IllegalArgumentException] {
      Cleaning.binnedDrift(df, "v", "period", 0L)
    }
  }

  test("binnedDrift: custom labels work; a foreign label raises, not undercounts") {
    val df = Seq(("train", 10L), ("train", 20L), ("eval", 30L))
      .toDF("period", "v")
    val got = Cleaning.binnedDrift(df, "v", "period", 500L, "train", "eval")
      .as[(Long, Long, Long, Long)].collect()
    assert(got.toSeq == Seq((0L, 2L, 1L, 1L)), got.mkString(","))
    // a row matching neither label (or NULL) must raise at execution
    val dirty = Seq(("a", 10L), ("b", 20L), ("c", 30L)).toDF("period", "v")
    intercept[Exception] {
      Cleaning.binnedDrift(dirty, "v", "period", 500L).collect()
    }
    intercept[IllegalArgumentException] {
      Cleaning.binnedDrift(df, "v", "period", 500L, "x", "x")
    }
  }

  test("targetEncodeLoo: NULL-category rows are kept and get (0, 0)") {
    val df = Seq((1L, Some("a"), 10L), (2L, Some("a"), 20L), (3L, None, 30L))
      .toDF("id", "cat", "y")
    val got = Cleaning.targetEncodeLoo(df, "cat", "y")
      .select("id", "loo_sum", "loo_n").as[(Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(got == Map(1L -> ((20L, 1L)), 2L -> ((10L, 1L)), 3L -> ((0L, 0L))),
      got.toString)
  }

  test("rareLabelCollapse: tail labels -> OTHER, frequent labels survive") {
    val df = (Seq.fill(5)("hot") ++ Seq("rare1", "rare2", "rare2"))
      .zipWithIndex.map { case (l, i) => (i.toLong, l) }.toDF("id", "label")
    val got = Cleaning.rareLabelCollapse(df, "label", minCount = 3)
      .select("label", "label_collapsed").as[(String, String)].collect().toSet
    assert(got == Set(("hot", "hot"), ("rare1", "OTHER"), ("rare2", "OTHER")),
      got.toString)
    intercept[IllegalArgumentException] {
      Cleaning.rareLabelCollapse(df, "label", 0)
    }
  }

  test("targetEncodeLoo: own target excluded exactly; singletons get (0, 0)") {
    val df = Seq((1L, "a", 10L), (2L, "a", 20L), (3L, "a", 30L), (4L, "b", 7L))
      .toDF("id", "cat", "y")
    val got = Cleaning.targetEncodeLoo(df, "cat", "y")
      .select("id", "loo_sum", "loo_n").as[(Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(got == Map(1L -> ((50L, 2L)), 2L -> ((40L, 2L)),
      3L -> ((30L, 2L)), 4L -> ((0L, 0L))), got.toString)
  }

  test("mergeIntervals: overlap/touch/containment merge; gaps split; per key") {
    val iv = Seq(
      (1L, 0L, 10L), (1L, 5L, 12L),    // overlap -> one island
      (1L, 12L, 15L),                  // touching (start == running max) -> merges
      (1L, 20L, 30L), (1L, 22L, 25L),  // containment: long swallows short
      (1L, 40L, 41L),                  // gap -> new island
      (2L, 0L, 1L))                    // other key independent
      .toDF("k", "s", "e")
    val got = Cleaning.mergeIntervals(iv, "k", "s", "e")
      .select("k", "island", "s", "e", "n_rows")
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(got == Set(
      (1L, 1L, 0L, 15L, 3L),
      (1L, 2L, 20L, 30L, 2L),
      (1L, 3L, 40L, 41L, 1L),
      (2L, 1L, 0L, 1L, 1L)), got.toString)
  }

  test("timeGrid + forwardFill: gaps densify and carry the last value; leading nulls stay") {
    def ts(h: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 $h%02d:00:00")
    // user 1 observes at hours 1 and 4 (gap 2-3); user 2 only at 2
    val obs = Seq((1L, ts(1), 10L), (1L, ts(4), 40L), (2L, ts(2), 5L))
      .toDF("user_id", "h", "c")
    val grid = Cleaning.timeGrid(obs, Seq("user_id"), "h", "1 hour", "h")
    assert(grid.count() == 5, "1: hours 1-4; 2: hour 2 only")
    val filled = Cleaning.forwardFill(
        grid.join(obs, Seq("user_id", "h"), "left"), Seq("user_id"), "h", Seq("c"))
      .select(col("user_id"), hour(col("h")).as("hh"), col("c"))
      .as[(Long, Int, Option[Long])].collect().toSet
    assert(filled == Set((1L, 1, Some(10L)), (1L, 2, Some(10L)),
      (1L, 3, Some(10L)), (1L, 4, Some(40L)), (2L, 2, Some(5L))), filled.toString)
    // leading null: an observation row with null value before the first real one
    val lead = Seq((1L, ts(1), None: Option[Long]), (1L, ts(2), Some(7L)))
      .toDF("user_id", "h", "c")
    val f2 = Cleaning.forwardFill(lead, Seq("user_id"), "h", Seq("c"))
      .select(hour(col("h")), col("c")).as[(Int, Option[Long])].collect().toMap
    assert(f2 == Map(1 -> None, 2 -> Some(7L)), "nothing observed yet stays null")
  }
  test("quantileNormalize: group marginals map onto the pooled " +
      "distribution, within-group order preserved, exact positions") {
    // group a = {10, 20}, group b = {100, 200}: pooled sorted =
    // [10, 20, 100, 200] (N=4). Each group has ng=2: rg=1 → pos
    // ceil(1·4/2)=2 → 20; rg=2 → pos 4 → 200. Both groups normalize
    // to the SAME {20, 200} marginal.
    val df = Seq(("a", 1L, 10L), ("a", 2L, 20L),
      ("b", 3L, 100L), ("b", 4L, 200L)).toDF("g", "id", "v")
    val got = Cleaning.quantileNormalize(df, "g", "id", "v")
      .select("grp", "id", "norm_v").as[(String, Long, Long)]
      .collect().toSet
    assert(got == Set(("a", 1L, 20L), ("a", 2L, 200L),
      ("b", 3L, 20L), ("b", 4L, 200L)), s"got $got")
    // a single-member group maps to the pooled maximum (rank 1 of 1)
    val single = Seq(("a", 1L, 5L), ("a", 2L, 6L), ("s", 9L, 1L))
      .toDF("g", "id", "v")
    val sv = Cleaning.quantileNormalize(single, "g", "id", "v")
      .filter(col("grp") === "s").select("norm_v").as[Long].head()
    assert(sv == 6L, s"singleton group sits at the pooled top: $sv")
    // within-group order is preserved after the transform
    val big = Seq.tabulate(20)(i => ("g" + (i % 2), i.toLong, (37L * i) % 100))
      .toDF("g", "id", "v")
    val out = Cleaning.quantileNormalize(big, "g", "id", "v")
      .select("grp", "rg", "norm_v").as[(String, Long, Long)].collect()
    out.groupBy(_._1).values.foreach { rows =>
      val sorted = rows.sortBy(_._2)
      assert(sorted.map(_._3).toSeq == sorted.map(_._3).sorted.toSeq,
        "normalized values must stay monotone in the group rank")
    }
  }

  test("psiDrift: hand 2-bin shift — exact shares, one micro-rounded " +
      "ln per bin, contributions and total in p12 units, empty-bin " +
      "clamp, guards") {
    // ref 1..8 → median cut 5 (4.5 rounds up); bins [≤5], [>5]:
    // ref shares 625000/375000; cur {5,6,7,8,5,6,7,8} → 250000/750000.
    // ln(2.5)·1e6 → 916291; ln(0.5)·1e6 → −693147.
    val rows = (1L to 8L).map(v => (v, 0L)) ++
      Seq(5L, 6L, 7L, 8L, 5L, 6L, 7L, 8L).map(v => (v, 1L))
    val got = Cleaning.psiDrift(rows.toDF("v", "p"), "v", "p", bins = 2)
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSet
    val want = Set(
      (0L, 625000L, 250000L, 916291L, 343609125000L, 603539250000L),
      (1L, 375000L, 750000L, -693147L, 259930125000L, 603539250000L))
    assert(got == want, s"got $got")
    // current period entirely above the cut → bin0 clamps to 1 ppm
    val rows2 = (1L to 8L).map(v => (v, 0L)) ++
      Seq(6L, 7L, 8L, 6L).map(v => (v, 1L))
    val clamped = Cleaning.psiDrift(rows2.toDF("v", "p"), "v", "p",
        bins = 2)
      .as[(Long, Long, Long, Long, Long, Long)].collect()
      .find(_._1 == 0L).get
    assert(clamped._3 == 1L && clamped._2 == 625000L, s"got $clamped")
    intercept[IllegalArgumentException] {
      Cleaning.psiDrift(rows.toDF("v", "p"), "v", "p", bins = 3)
    }
    intercept[IllegalArgumentException] {
      Cleaning.psiDrift(Seq((1L, 1L)).toDF("v", "p"), "v", "p", 2)
    }
  }

  test("histogramSelectivityAudit: skewed fixture — equi-width lies " +
      "on the hot point (est 0 of 12), equi-depth nails it, both " +
      "exact on the covered tail, guards") {
    // 12 copies of 1, then 97..100: n=16, lo=1, hi=100.
    // width buckets of 25: the [1,1] predicate interpolates
    // 12·1 div 25 = 0 (err 750000 ppm); depth boundary β₁ = 1 puts
    // all twelve in a width-1 bucket → est 12, err 0.
    val vals = (Seq.fill(12)(1L) ++ Seq(97L, 98L, 99L, 100L)).toDF("x")
    val preds = Seq((0L, 1L, 1L), (1L, 26L, 100L))
      .toDF("pred_id", "q_lo", "q_hi")
    val got = Cleaning.histogramSelectivityAudit(vals, "x", preds,
        bins = 4)
      .as[(String, Long, Long, Long, Long)].collect().toSet
    val want = Set(
      ("width", 0L, 0L, 12L, 750000L), ("width", 1L, 4L, 4L, 0L),
      ("depth", 0L, 12L, 12L, 0L), ("depth", 1L, 4L, 4L, 0L))
    assert(got == want, s"got $got")
    intercept[IllegalArgumentException] {
      Cleaning.histogramSelectivityAudit(vals, "x", preds, bins = 3)
    }
    intercept[IllegalArgumentException] {
      Cleaning.histogramSelectivityAudit(vals, "x", preds, bins = 1)
    }
  }
}
