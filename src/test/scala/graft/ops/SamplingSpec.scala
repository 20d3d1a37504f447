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

  test("temperatureSample flattens a skewed mixture toward sqrt counts") {
    // domains: a = 900 rows, b = 100 rows, c = 100 rows
    val df = spark.range(1100).select(col("id"),
      when(col("id") < 900, "a").when(col("id") < 1000, "b").otherwise("c").as("dom"))
    val kept = Sampling.temperatureSample(df, "dom", "id", alpha = 0.5)
      .groupBy("dom").count().as[(String, Long)].collect().toMap
    // smallest domains kept whole (rate exactly 1)
    assert(kept("b") == 100, s"min domain must be kept whole: ${kept("b")}")
    assert(kept("c") == 100, s"min domain must be kept whole: ${kept("c")}")
    // the big domain keeps ~sqrt(100/900) = 1/3 of its rows
    assert(math.abs(kept("a") / 900.0 - 1.0 / 3) < 0.05, s"a rate off: ${kept("a")}")
    // deterministic: identical ids on a re-run
    val a1 = Sampling.temperatureSample(df, "dom", "id", 0.5)
      .select("id").as[Long].collect().toSet
    val a2 = Sampling.temperatureSample(df, "dom", "id", 0.5)
      .select("id").as[Long].collect().toSet
    assert(a1 == a2)
    // alpha = 1 is the identity mixture: every row kept
    assert(Sampling.temperatureSample(df, "dom", "id", 1.0).count() == 1100)
    intercept[IllegalArgumentException] {
      Sampling.temperatureSample(df, "dom", "id", 0.0)
    }
  }

  test("kFold: every row in exactly one fold, roughly balanced, deterministic") {
    val df = spark.range(10000).toDF("id")
    val folds = Sampling.kFold(df, "id", k = 5)
      .groupBy("fold").count().as[(Long, Long)].collect().toMap
    assert(folds.keySet == Set(0L, 1L, 2L, 3L, 4L))
    folds.values.foreach(n =>
      assert(math.abs(n - 2000L) < 200, s"fold sizes skewed: $folds"))
    val a = Sampling.kFold(df, "id", 5).select("id", "fold")
      .as[(Long, Long)].collect().toMap
    val b = Sampling.kFold(df, "id", 5).select("id", "fold")
      .as[(Long, Long)].collect().toMap
    assert(a == b, "fold assignment must be deterministic")
    intercept[IllegalArgumentException] { Sampling.kFold(df, "id", 1) }
  }

  test("groupHashSplit is group-atomic: no group straddles the eval boundary") {
    val df = spark.range(5000).select(col("id"), (col("id") % 97).as("grp"))
    val out = Sampling.groupHashSplit(df, "grp",
      Seq(("train", 0.8), ("val", 0.1), ("test", 0.1)))
    val perGroup = out.groupBy("grp")
      .agg(countDistinct(col("split")).as("nsplits"))
      .agg(max("nsplits")).first().getLong(0)
    assert(perGroup == 1L, "every group must land whole in one split")
  }

  test("hashSplit partitions every row once, near the requested fractions") {
    val df = spark.range(10000).toDF("id")
    val out = Sampling.hashSplit(df, "id",
      Seq(("train", 0.8), ("val", 0.1), ("test", 0.1)))
    val sizes = out.groupBy("split").count().as[(String, Long)].collect().toMap
    assert(sizes.values.sum == 10000L, "a partition: every row exactly once")
    assert(math.abs(sizes("train") / 10000.0 - 0.8) < 0.02, s"train off: $sizes")
    assert(math.abs(sizes("val") / 10000.0 - 0.1) < 0.01, s"val off: $sizes")
    assert(math.abs(sizes("test") / 10000.0 - 0.1) < 0.01, s"test off: $sizes")
    // deterministic: same assignment on re-run
    val a = out.select("id", "split").as[(Long, String)].collect().toMap
    val b = Sampling.hashSplit(df, "id",
      Seq(("train", 0.8), ("val", 0.1), ("test", 0.1)))
      .select("id", "split").as[(Long, String)].collect().toMap
    assert(a == b)
    // train bucket == hashSample(0.8): the split nests with the sampler
    val sampled = Sampling.hashSample(df, "id", 0.8).select("id").as[Long].collect().toSet
    assert(a.filter(_._2 == "train").keySet == sampled)
    // narrow — no shuffle
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"hashSplit must not shuffle:\n$plan")
    // invalid fractions rejected loudly
    intercept[IllegalArgumentException] {
      Sampling.hashSplit(df, "id", Seq(("a", 0.5), ("b", 0.3)))
    }
  }

  test("negativeSample: k others per row, never self, deterministic") {
    val df = spark.range(200).toDF("id")
    val negs = Sampling.negativeSample(df, "id", k = 3)
      .select("id", "j", "neg_id").as[(Long, Long, Long)].collect()
    assert(negs.length == 600, "3 negatives per row")
    assert(negs.forall { case (id, _, neg) => id != neg }, "a row is never its own negative")
    assert(negs.groupBy(_._1).forall(_._2.map(_._2).toSet == Set(0L, 1L, 2L)))
    val again = Sampling.negativeSample(df, "id", k = 3)
      .select("id", "j", "neg_id").as[(Long, Long, Long)].collect()
    assert(negs.sorted.toSeq == again.sorted.toSeq, "same draw on every run")
    // the draw spreads: no single negative dominates
    val histo = negs.groupBy(_._3).view.mapValues(_.size)
    assert(histo.values.max < 30, s"hash draw must spread: max=${histo.values.max}")
    intercept[IllegalArgumentException] { Sampling.negativeSample(df, "id", 0) }
  }

  test("the sampling predicate is narrow (no shuffle) and retry-stable") {
    val df = spark.range(100).toDF("id")
    val out = Sampling.hashSample(df, "id", 0.5)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"sampling must not shuffle:\n$plan")
  }

  test("fixedSizeStratified: exact n per stratum, small strata whole, deterministic") {
    val df = ((1L to 100L).map(i => (i, "big")) ++ Seq((200L, "tiny"), (201L, "tiny")))
      .toDF("id", "grp")
    val out = Sampling.fixedSizeStratified(df, Seq("grp"), "id", n = 10)
      .select("id", "grp").as[(Long, String)].collect()
    val byGrp = out.groupBy(_._2).view.mapValues(_.map(_._1).toSet).toMap
    assert(byGrp("big").size == 10, s"exactly n from the large stratum: $byGrp")
    assert(byGrp("tiny") == Set(200L, 201L), "undersized strata keep every row")
    // pure function of the ids: same rows on every run
    val again = Sampling.fixedSizeStratified(df, Seq("grp"), "id", n = 10)
      .select("id", "grp").as[(Long, String)].collect()
    assert(out.sorted.toSeq == again.sorted.toSeq)
    // membership must be md5-rank, not id-order: not simply ids 1..10
    assert(byGrp("big") != (1L to 10L).toSet, "selection follows hash priority")
  }

  test("tokenBudgetSample: budget respected, hash-ordered, append-stable") {
    val df = (1L to 100L).map(i => (i, 10L)).toDF("id", "n_tok")
    val kept = Sampling.tokenBudgetSample(df, "id", "n_tok", budget = 300L)
      .select("id", "cum_n_tok").as[(Long, Long)].collect()
    assert(kept.length == 30, s"300 budget / 10 per doc = 30 docs: ${kept.length}")
    assert(kept.map(_._2).max == 300L, "audit trail: last cum == budget spent")
    // pure function of ids: an unrelated append only adds docs hashed
    // into the window — every previously-kept doc that still fits stays
    val kept2 = Sampling.tokenBudgetSample(
        df.unionByName(Seq((1000L, 10L)).toDF("id", "n_tok")),
        "id", "n_tok", budget = 300L)
      .select("id").as[Long].collect().toSet
    val before = kept.map(_._1).toSet
    assert((before -- kept2).size <= 1,
      s"append displaces at most the docs after the new arrival: ${before -- kept2}")
  }

  test("waterfillAllocation: small sources whole, big ones level, sum == budget") {
    val counts = Seq(("tiny", 5L), ("small", 10L), ("big", 100L), ("huge", 200L))
      .toDF("src", "c")
    // budget 95: tiny(5) and small(10) are satisfied; big/huge share 80
    // -> level 40 each, remainder 0
    val got = Sampling.waterfillAllocation(counts, "src", "c", budget = 95L)
      .as[(String, Long, Long)].collect().map(r => r._1 -> r._3).toMap
    assert(got == Map("tiny" -> 5L, "small" -> 10L, "big" -> 40L, "huge" -> 40L),
      got.toString)
    // remainder goes to the first unsatisfied sources (ascending order):
    // budget 96 -> big gets the extra unit
    val got2 = Sampling.waterfillAllocation(counts, "src", "c", budget = 96L)
      .as[(String, Long, Long)].collect().map(r => r._1 -> r._3).toMap
    assert(got2("big") == 41L && got2("huge") == 40L, got2.toString)
    // budget >= total: everyone keeps everything
    val got3 = Sampling.waterfillAllocation(counts, "src", "c", budget = 1000L)
      .as[(String, Long, Long)].collect().map(r => r._1 -> r._3).toMap
    assert(got3 == Map("tiny" -> 5L, "small" -> 10L, "big" -> 100L, "huge" -> 200L))
    // budget below the smallest source: pure even split with remainder
    val got4 = Sampling.waterfillAllocation(counts, "src", "c", budget = 6L)
      .as[(String, Long, Long)].collect().map(r => r._1 -> r._3)
    assert(got4.map(_._2).sum == 6L, got4.mkString(","))
    // sum == min(budget, capacity); no source exceeds its capacity
    assert(got.values.sum == 95L && got2.values.sum == 96L)
    intercept[IllegalArgumentException] {
      Sampling.waterfillAllocation(counts, "src", "c", budget = -1L)
    }
  }

  test("packSequences: capacity respected, next-fit-decreasing, oversize alone") {
    val df = spark.range(200)
      .select(col("id"), (col("id") % 37 * 13 + 20).as("w"))
    val out = Sampling.packSequences(df, "id", "w", capacity = 500L,
        nShards = 4)
      .as[(Long, Int, Long, Long)].collect()
    assert(out.length == 200, "every doc assigned exactly one slot")
    val w = df.as[(Long, Long)].collect().toMap
    // no sequence exceeds capacity (no oversize docs in this fixture)
    val bySeq = out.groupBy(r => (r._2, r._3))
    bySeq.foreach { case (k, rows) =>
      val tot = rows.map(r => w(r._1)).sum
      assert(tot <= 500L, s"sequence $k overflows: $tot")
      // offsets tile the sequence exactly: sorted pos are the prefix sums
      val sorted = rows.sortBy(_._4)
      var cum = 0L
      sorted.foreach { r =>
        assert(r._4 == cum, s"pos gap in $k: got ${r._4}, want $cum")
        cum += w(r._1)
      }
    }
    // deterministic across runs
    val again = Sampling.packSequences(df, "id", "w", capacity = 500L,
      nShards = 4).as[(Long, Int, Long, Long)].collect()
    assert(out.sortBy(_._1).sameElements(again.sortBy(_._1)))
    // within a shard, weights are non-increasing in (seq_idx, pos) order
    out.groupBy(_._2).foreach { case (sh, rows) =>
      val ws = rows.sortBy(r => (r._3, r._4)).map(r => w(r._1))
      assert(ws.zip(ws.tail).forall { case (a, b) => a >= b },
        s"shard $sh not packed in decreasing weight order")
    }
    // an oversize doc sits alone at pos 0; neighbors unaffected
    val over = Seq((1000L, 900L), (1001L, 100L), (1002L, 100L)).toDF("id", "w")
    val o2 = Sampling.packSequences(over, "id", "w", capacity = 500L,
        nShards = 1)
      .as[(Long, Int, Long, Long)].collect().map(r => r._1 -> (r._3, r._4)).toMap
    assert(o2(1000L) == (0L, 0L), "oversize doc leads its own sequence")
    assert(o2(1001L)._1 == 1L && o2(1002L)._1 == 1L,
      "following docs start a fresh sequence")
    intercept[IllegalArgumentException] {
      Sampling.packSequences(df, "id", "w", capacity = 0L)
    }
  }

  test("interleaveBySource: WFQ order interleaves proportionally, no RNG") {
    // a has weight 2 (4 items), b weight 1 (2 items): hand-derived
    // schedule vt(a) = 5000,10000,15000,20000; vt(b) = 10000,20000
    // -> a, a, b, a, a, b (ties vt: 'a' < 'b')
    val df = Seq((1L, "a"), (2L, "a"), (3L, "a"), (4L, "a"),
      (10L, "b"), (11L, "b")).toDF("id", "src")
    val got = Sampling.interleaveBySource(df, "id", "src",
        weights = Map("a" -> 2L), defaultWeight = 1L)
      .orderBy("pos").as[(Long, String, Long, Long)].collect()
    assert(got.map(_._2).toSeq == Seq("a", "a", "b", "a", "a", "b"),
      s"WFQ interleave order wrong: ${got.toSeq}")
    assert(got.map(_._4).toSeq == (1L to 6L), "pos must be 1..n dense")
    // within a source, items follow md5 order (append-stable)
    val aIds = got.filter(_._2 == "a").map(_._1).toSeq
    val md5Order = Seq(1L, 2L, 3L, 4L).sortBy(i =>
      (java.security.MessageDigest.getInstance("MD5")
        .digest(i.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(8), i))
    assert(aIds == md5Order, s"$aIds != $md5Order")
    // deterministic across runs
    val again = Sampling.interleaveBySource(df, "id", "src",
        weights = Map("a" -> 2L), defaultWeight = 1L)
      .orderBy("pos").as[(Long, String, Long, Long)].collect()
    assert(got.toSeq == again.toSeq)
    intercept[IllegalArgumentException] {
      Sampling.interleaveBySource(df, "id", "src", Map("a" -> 0L))
    }
  }

  test("domainMixtureWeights: hand-computed one-round update, clamp, " +
      "renorm floor, determinism") {
    // a: mean 10, b: mean 30, ref 20 → excess ∓10, bucket 5 → k = ∓2.
    // one 11/10 round: a → 1e6·100//121 = 826446, b → 1e6·121//100 =
    // 1210000; renorm to ppm: 405827 / 594172 (floored).
    val df = Seq(("a", 10L), ("a", 10L), ("b", 30L), ("b", 30L))
      .toDF("dom", "sc")
    val got = Sampling.domainMixtureWeights(df, "dom", "sc",
        bucket = 5L, kMax = 4, rounds = 1)
      .select("domain", "n_rows", "mean_score", "excess", "bucket", "w_ppm")
      .as[(String, Long, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(("a", 2L, 10L, -10L, -2L, 405827L),
      ("b", 2L, 30L, 10L, 2L, 594172L)), s"got $got")
    // clamp: a huge excess saturates at ±kMax
    val wide = Seq(("lo", 0L), ("hi", 1000L)).toDF("dom", "sc")
    val ks = Sampling.domainMixtureWeights(wide, "dom", "sc",
        bucket = 5L, kMax = 3, rounds = 1)
      .select("domain", "bucket").as[(String, Long)].collect().toMap
    assert(ks == Map("lo" -> -3L, "hi" -> 3L), s"clamp: $ks")
    // deterministic across runs
    val again = Sampling.domainMixtureWeights(df, "dom", "sc", 5L, 4, 1)
      .select("domain", "w_ppm").as[(String, Long)].collect().toSeq
    assert(again.sortBy(_._1).map(_._2) == Seq(405827L, 594172L))
    intercept[IllegalArgumentException] {
      Sampling.domainMixtureWeights(df, "dom", "sc", 0L, 4, 1)
    }
  }

  test("purgedTimeFolds: ntile-sized blocks, embargo purges boundary " +
      "rows, far rows train, test wins inside its own fold") {
    def ts(d: String) = java.sql.Timestamp.valueOf(s"2020-$d 00:00:00")
    // 7 daily rows Jan 1-7 → k=2 folds: {1..4}, {5..7} (ntile: 4, 3)
    val df = (1 to 7).map(i => (i.toLong, ts(f"01-0$i"))).toDF("id", "at")
    val got = Sampling.purgedTimeFolds(df, "id", "at", k = 2,
        embargoExpr = "INTERVAL 1 DAYS")
      .select("test_fold", "id", "role")
      .as[(Long, Long, String)].collect()
      .map { case (f, i, r) => (f, i) -> r }.toMap
    // fold 1 tested: rows 1-4 test; row 5 is within 1 day of Jan 4 →
    // purged; rows 6,7 train
    assert((1L to 4L).forall(i => got(1L -> i) == "test"))
    assert(got(1L -> 5L) == "purged")
    assert(got(1L -> 6L) == "train" && got(1L -> 7L) == "train")
    // fold 2 tested: rows 5-7 test; row 4 within embargo of Jan 5 →
    // purged; rows 1-3 train
    assert((5L to 7L).forall(i => got(2L -> i) == "test"))
    assert(got(2L -> 4L) == "purged")
    assert((1L to 3L).forall(i => got(2L -> i) == "train"))
    // grid is complete: k × n
    assert(got.size == 14)
    intercept[IllegalArgumentException] {
      Sampling.purgedTimeFolds(df, "id", "at", 1, "INTERVAL 1 DAYS")
    }
  }

  test("bootstrapCi: hash membership replayed locally, milli resample " +
      "means, count-based CI order statistics, guards") {
    val rows = (1L to 6L).map(i => (i, i * 10L))
    val df = rows.toDF("id", "v")
    val b = 20
    // kLo = ceil(21·0.1) = 3, kHi = 18 — replay every membership
    // decision with the same md5 coin and derive the expected CI.
    def keep(i: Long, r: Int): Boolean = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$i:$r".getBytes("UTF-8"))
      ((d(0) >> 4) & 0xf) < 8
    }
    val means = (0 until b).flatMap { r =>
      val sel = rows.filter { case (i, _) => keep(i, r) }
      if (sel.isEmpty) None
      else Some(sel.map(_._2).sum * 1000L / sel.size)
    }.sorted
    val expLo = means(2)
    val expHi = means(17)
    val got = Sampling.bootstrapCi(df, "id", "v", b = b, alphaPct = 20L)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq((6L, 20L, 35000L, expLo, expHi)),
      s"got $got expected CI ($expLo, $expHi) from ${means.size} means")
    intercept[IllegalArgumentException] {
      Sampling.bootstrapCi(df, "id", "v", b = 1)
    }
    intercept[IllegalArgumentException] {
      Sampling.bootstrapCi(df, "id", "v", b = 5, alphaPct = 90L)
    }
  }
}
