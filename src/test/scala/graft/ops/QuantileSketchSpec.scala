package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase
import graft.ops.Profile.QuantileSketch

/** The quantile sketch's rank-error contract (ε = 3/k, documented on
  * the class) proved against EXACT ranks on adversarial insert orders,
  * plus the mergeability / rows-persistence / distributed-build paths
  * the 100 TB pattern relies on (per-batch sketches, union, one merged
  * read — the HLL/Count-Min discipline applied to quantiles). */
class QuantileSketchSpec extends AnyFunSuite with SparkTestBase {

  private def exactRank(sorted: Array[Double], x: Double): Long = {
    // |{v <= x}| by binary search on the sorted data
    var lo = 0; var hi = sorted.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (sorted(mid) <= x) lo = mid + 1 else hi = mid
    }
    lo.toLong
  }

  /** Max |estRank − trueRank| over every retained item and a value grid. */
  private def maxRankErr(s: QuantileSketch, data: Array[Double]): Long = {
    val sorted = data.sorted
    val probes = s.toRows.map(_._2) ++
      (0 to 100).map(i => sorted(((sorted.length - 1).toLong * i / 100).toInt))
    probes.map(x => math.abs(s.estRank(x) - exactRank(sorted, x))).max
  }

  private def bound(n: Int, k: Int): Long = (3L * n + k - 1) / k

  test("no compaction (N within capacity) = exact order statistics") {
    // a fresh sketch's capacity is exactly k (one level, no ladder yet):
    // N < k never compacts, so estimates are exact
    val s = new QuantileSketch(64)
    val data = (1 to 60).map(_.toDouble).reverse
    data.foreach(s.insert)
    assert(s.count == 60)
    for (q <- Seq(0.01, 0.25, 0.5, 0.75, 1.0))
      assert(s.quantile(q) == math.ceil(q * 60), s"q=$q")
    assert(maxRankErr(s, data.toArray) == 0)
  }

  test("rank-error bound eps=3/k holds on adversarial insert orders") {
    val n = 100000
    val k = 128
    val orders = Map(
      "sorted" -> (0 until n).map(_.toDouble),
      "reversed" -> (0 until n).reverse.map(_.toDouble),
      // deterministic interleave: bit-reversal-ish scatter of the range
      "interleaved" -> (0 until n).map(i => ((i * 2654435761L) % n).toDouble),
      // heavy duplicates: 90% of mass on 10 values, tail spread wide
      "duplicates" -> (0 until n).map(i =>
        if (i % 10 != 0) (i % 10).toDouble else (1000 + i).toDouble))
    for ((name, data) <- orders) {
      val s = new QuantileSketch(k)
      data.foreach(s.insert)
      assert(s.count == n, name)
      val err = maxRankErr(s, data.toArray)
      assert(err <= bound(n, k), s"$name: err $err > bound ${bound(n, k)}")
    }
  }

  test("merge of per-batch sketches keeps count exact and the bound") {
    val n = 60000
    val k = 128
    val data = (0 until n).map(i => ((i * 48271L) % n).toDouble)
    val merged = data.grouped(n / 10).map { batch =>
      val s = new QuantileSketch(k)
      batch.foreach(s.insert)
      s
    }.reduce(_.merge(_))
    assert(merged.count == n)
    val err = maxRankErr(merged, data.toArray)
    assert(err <= bound(n, k), s"merged err $err > ${bound(n, k)}")
  }

  test("rows round-trip: toRows/fromRows preserves count and estimates") {
    val s = new QuantileSketch(64)
    (0 until 5000).foreach(i => s.insert(((i * 7919) % 5000).toDouble))
    val back = QuantileSketch.fromRows(64, s.toRows)
    assert(back.count == s.count)
    for (q <- Seq(0.1, 0.5, 0.9))
      assert(back.quantile(q) == s.quantile(q), s"q=$q")
  }

  test("union of batches' rows rebuilds a sketch within the bound") {
    val n = 40000
    val k = 128
    val data = (0 until n).map(i => ((i * 1103515245L) % n).toDouble)
    val (a, b) = data.splitAt(n / 3)
    def rowsOf(xs: Seq[Double]) = {
      val s = new QuantileSketch(k)
      xs.foreach(s.insert)
      s.toRows
    }
    // the streaming-merge pattern: each batch persists its rows; a later
    // reader unions the rows tables and rebuilds one queryable sketch
    val rebuilt = QuantileSketch.fromRows(k, rowsOf(a) ++ rowsOf(b))
    assert(rebuilt.count == n)
    val err = maxRankErr(rebuilt, data.toArray)
    assert(err <= bound(n, k), s"rebuilt err $err > ${bound(n, k)}")
  }

  test("distributed build + rows-form merge on a DataFrame") {
    import spark.implicits._
    val n = 30000
    val k = 256
    val df = (0 until n).map(i => ((i * 69621L) % n).toDouble).toDF("v")
    val s = Profile.quantileSketchOf(df, "v", k)
    assert(s.count == n)
    val data = (0 until n).map(i => ((i * 69621L) % n).toDouble).toArray
    assert(maxRankErr(s, data) <= bound(n, k))
    // per-batch rows tables union + merge (the q177 shape)
    val rows1 = Profile.quantileSketch(df.filter($"v" < n / 2), "v", k)
    val rows2 = Profile.quantileSketch(df.filter($"v" >= n / 2), "v", k)
    val merged = Profile.quantileSketchMerge(rows1.union(rows2), k)
    assert(merged.count == n)
    assert(maxRankErr(merged, data) <= bound(n, k))
  }

  test("groupedQuantiles: per-group sketches, small groups exact") {
    import spark.implicits._
    val df = (for (g <- Seq("a", "b"); i <- 1 to 50)
      yield (g, if (g == "a") i.toDouble else i * 10.0)).toDF("g", "v")
    val out = Profile.groupedQuantiles(df, "g", "v", Seq(500, 900), k = 64)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getDouble(2))).toSet
    // 50 values per group < k: no compaction, estimates are exact stats
    assert(out == Set(("a", 500, 25.0), ("a", 900, 45.0),
      ("b", 500, 250.0), ("b", 900, 450.0)))
  }

  test("winsorizeSketched: sketch cuts clamp within the rank-error " +
      "bound; interior values untouched; deterministic") {
    import spark.implicits._
    val n = 1000
    val df = (1 to n).map(i => (i.toLong, i.toLong)).toDF("id", "v")
    val k = 64
    val w = graft.ops.Cleaning.winsorizeSketched(df, "v",
      lo = 0.05, hi = 0.95, k = k)
    val rows = w.select("id", "v", "v_wins", "v_lo_cut", "v_hi_cut")
      .collect()
    val (loCut, hiCut) = (rows.head.getDouble(3), rows.head.getDouble(4))
    // cuts sit within the q177 admission contract: ±ceil(6n/k) ranks
    val slack = (6 * n + k - 1) / k
    assert(math.abs(loCut - 50.0) <= slack, s"lo cut $loCut")
    assert(math.abs(hiCut - 950.0) <= slack, s"hi cut $hiCut")
    // clamping: below -> loCut, above -> hiCut, interior untouched
    rows.foreach { r =>
      val (v, wins) = (r.getLong(1).toDouble, r.getDouble(2))
      if (v < loCut) assert(wins == loCut)
      else if (v > hiCut) assert(wins == hiCut)
      else assert(wins == v, s"interior $v must be untouched, got $wins")
    }
    // a rebuild's cuts honor the SAME bound (treeAggregate merge order
    // may differ between runs — the contract is the rank-error bound,
    // not bit-equal sketches; q216 aux-dumps its run's cuts)
    val again = graft.ops.Cleaning.winsorizeSketched(df, "v",
      lo = 0.05, hi = 0.95, k = k).select("v_lo_cut", "v_hi_cut").head
    assert(math.abs(again.getDouble(0) - 50.0) <= slack)
    assert(math.abs(again.getDouble(1) - 950.0) <= slack)
    intercept[IllegalArgumentException](
      graft.ops.Cleaning.winsorizeSketched(df, "v", lo = 0.9, hi = 0.1))
  }

  test("contract errors are loud") {
    intercept[IllegalArgumentException](new QuantileSketch(4))
    intercept[IllegalArgumentException](new QuantileSketch(64).quantile(0.5))
    val s = new QuantileSketch(64).insert(1.0)
    intercept[IllegalArgumentException](s.quantile(1.5))
    intercept[IllegalArgumentException](
      Profile.groupedQuantiles(spark.range(1).toDF("v"), "v", "v", Seq(2000)))
  }
}
