package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase

/** KMV (k-minimum-values) set sketch: exactness under capacity, the
  * lossless-merge property (the k smallest hashes of a union are a
  * subset of the union of each part's k smallest), estimator accuracy
  * at capacity (deterministic: md5 hashing has no seed), and the
  * intersection/Jaccard estimates HLL cannot provide. */
class KmvSketchSpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  private val K = 64

  test("under capacity the sketch is the exact distinct hash set") {
    val df = Seq("a", "b", "c", "b", "a").toDF("v")
    val sk = Profile.kmvSketch(df, "v", K)
    assert(sk.count() === 3)
    assert(Profile.kmvEstimate(sk, K) === 3L)
  }

  test("estimate at capacity is within 25% of the true distinct count") {
    val n = 5000
    val df = (0 until n).map(i => s"val_$i").toDF("v")
    val est = Profile.kmvEstimate(Profile.kmvSketch(df, "v", 256), 256)
    // deterministic (md5, no seed): expected relative error ~1/sqrt(k)=6%
    assert(math.abs(est - n) < n / 4, s"est $est vs true $n")
  }

  test("merge of per-batch sketches equals the sketch of the union") {
    val a = (0 until 800).map(i => s"x$i").toDF("v")
    val b = (500 until 1300).map(i => s"x$i").toDF("v")
    val merged = Profile.kmvMerge(
      Profile.kmvSketch(a, "v", K).union(Profile.kmvSketch(b, "v", K)), K)
    val direct = Profile.kmvSketch(a.union(b), "v", K)
    assert(merged.collect().map(_.getString(0)).sorted.toSeq ===
      direct.collect().map(_.getString(0)).sorted.toSeq)
  }

  test("overlap: disjoint sets match nothing, identical sets fully") {
    val a = (0 until 500).map(i => s"a$i").toDF("v")
    val b = (0 until 500).map(i => s"b$i").toDF("v")
    val ka = Profile.kmvSketch(a, "v", K)
    val kb = Profile.kmvSketch(b, "v", K)
    val disjoint = Profile.kmvOverlap(ka, kb, K).first()
    assert(disjoint.getAs[Long]("matched") === 0L)
    assert(disjoint.getAs[Long]("est_intersection") === 0L)
    val self = Profile.kmvOverlap(ka, ka, K).first()
    assert(self.getAs[Long]("jaccard_pm") === 1000L)
    assert(self.getAs[Long]("est_intersection") ===
      self.getAs[Long]("est_union"))
  }

  test("overlap estimate tracks a planted 50% intersection") {
    val a = (0 until 2000).map(i => s"c$i").toDF("v")       // 0..1999
    val b = (1000 until 3000).map(i => s"c$i").toDF("v")    // 1000..2999
    val r = Profile.kmvOverlap(
      Profile.kmvSketch(a, "v", 256), Profile.kmvSketch(b, "v", 256),
      256).first()
    val inter = r.getAs[Long]("est_intersection")           // true 1000
    assert(inter > 600 && inter < 1400, s"est_intersection $inter")
    val j = r.getAs[Long]("jaccard_pm")                     // true 333
    assert(j > 200 && j < 470, s"jaccard_pm $j")
  }

  test("estIntersection never overflows when estU sits at the " +
      "Long.MaxValue cap (degenerate/hostile sketch)") {
    // kmvEstimateOf caps estU at Long.MaxValue for near-zero k-th
    // hashes; the intersection multiply must not wrap negative there.
    val est = Profile.estIntersection(
      matched = 63L, estU = Long.MaxValue, k = K)
    assert(est > 0L, s"Long multiply would have wrapped negative: $est")
    assert(est === (BigInt(63) * BigInt(Long.MaxValue) / K).toLong)
    // a sane case still matches plain integer arithmetic
    assert(Profile.estIntersection(10L, 6400L, K) === 1000L)
    // zero matched stays zero even against the cap
    assert(Profile.estIntersection(0L, Long.MaxValue, K) === 0L)
  }

  test("kmvSketchGrouped: per-group k-smallest through TopKPerKey") {
    val df = (0 until 600).map(i => (s"g${i % 3}", s"v$i"))
      .toDF("grp", "v") // 200 distinct values per group, capacity 64
    val sk = Profile.kmvSketchGrouped(df, "v", "grp", K)
    val plan = Profile.kmvSketchGrouped(df, "v", "grp", K)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKey"), s"bounded-heap plan expected:\n$plan")
    val byG = sk.as[(String, String)].collect().groupBy(_._1)
    assert(byG.keySet == Set("g0", "g1", "g2"))
    byG.values.foreach(rows =>
      assert(rows.length == K, "each group capped at k"))
    // each group's sketch must equal the ungrouped sketch of exactly
    // that group's values
    (0 until 3).foreach { g =>
      val solo = Profile.kmvSketch(
        df.filter($"grp" === s"g$g").select($"v"), "v", K)
        .collect().map(_.getString(0)).toSet
      assert(byG(s"g$g").map(_._2).toSet == solo, s"group g$g mismatch")
    }
  }

  test("kmvOverlapMatrix: one row per pair, self-consistent estimates") {
    val df = ((0 until 200).map(i => ("a", s"x$i")) ++
      (100 until 300).map(i => ("b", s"x$i")) ++
      (0 until 200).map(i => ("c", s"y$i")))
      .toDF("grp", "v")
    val mat = Profile.kmvOverlapMatrix(
      Profile.kmvSketchGrouped(df, "v", "grp", K), K)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r).toMap
    assert(mat.keySet == Set(("a", "b"), ("a", "c"), ("b", "c")))
    val ab = mat(("a", "b"))
    assert(ab.getAs[Long]("matched") > 0, "a and b share x100..x199")
    assert(mat(("a", "c")).getAs[Long]("matched") == 0, "a/c disjoint")
    assert(mat(("b", "c")).getAs[Long]("matched") == 0, "b/c disjoint")
    val inter = ab.getAs[Long]("est_intersection") // true 100
    assert(inter > 40 && inter < 180, s"est_intersection $inter")
  }
}
