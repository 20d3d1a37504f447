package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class MatchingSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("stableMatching: hand 3x2 instance — first-round conflict, a " +
      "dumped incumbent re-proposes, list exhaustion leaves a " +
      "proposer unmatched, result is stable, guards") {
    // p1: [a1, a2]; p2: [a2, a1]; p3: [a1, a2].
    // a1 scores: p3=9, p2=5, p1=1. a2: p1=8, p2=2, p3=1.
    // r1: p1,p3 → a1 (p3 holds), p2 → a2 (holds); p1 advances.
    // r2: p1 → a2 beats incumbent p2 (8 > 2) — p2 DUMPED, advances.
    // r3: p2 → a1 loses to p3; p2 exhausts its list.
    // r4: no proposals → fixpoint. p2 ends unmatched.
    val pp = Seq((1L, 1L, 0L), (1L, 2L, 1L), (2L, 2L, 0L), (2L, 1L, 1L),
      (3L, 1L, 0L), (3L, 2L, 1L)).toDF("p", "a", "rank")
    val pa = Seq((1L, 3L, 9L), (1L, 2L, 5L), (1L, 1L, 1L),
      (2L, 1L, 8L), (2L, 2L, 2L), (2L, 3L, 1L)).toDF("a", "p", "score")
    val got = Matching.stableMatching(pp, pa)
      .as[(Long, Long, Long)].collect().toSet
    assert(got == Set((1L, 2L, 1L), (3L, 1L, 0L)), s"got $got")
    // stability: no blocking pair — for every unmatched-together
    // (p, a), either p prefers its match or a prefers its match
    val matched = got.map(r => r._1 -> r._2).toMap
    val prank = Map((1L, 1L) -> 0L, (1L, 2L) -> 1L, (2L, 2L) -> 0L,
      (2L, 1L) -> 1L, (3L, 1L) -> 0L, (3L, 2L) -> 1L)
    val ascore = Map((1L, 3L) -> 9L, (1L, 2L) -> 5L, (1L, 1L) -> 1L,
      (2L, 1L) -> 8L, (2L, 2L) -> 2L, (2L, 3L) -> 1L)
    val holder = got.map(r => r._2 -> r._1).toMap
    for (p <- Seq(1L, 2L, 3L); a <- Seq(1L, 2L)
         if matched.get(p) != Some(a)) {
      val pWantsA = matched.get(p)
        .forall(cur => prank((p, a)) < prank((p, cur)))
      val aWantsP = holder.get(a)
        .forall(cur => ascore((a, p)) > ascore((a, cur)))
      assert(!(pWantsA && aWantsP), s"blocking pair ($p, $a)")
    }
    intercept[IllegalArgumentException] {
      Matching.stableMatching(pp, pa, maxRounds = 0)
    }
    intercept[IllegalArgumentException] {
      Matching.stableMatching(pp, pa, maxRounds = 1)
    }
  }

  test("stableMatching: adversarial displacement chain (max rank 1, " +
      "Θ(n) rounds) converges under the derived default bound") {
    // The worst case the old fixed default (64 rounds) could not cover:
    // acceptors prefer SMALLER proposers, p1 wants only a1, and each
    // p_i (i ≥ 2) wants a_{i-1} then a_i — so round 1 rejects p2 at a1,
    // p2 then dumps p3 at a2, p3 dumps p4 at a3, ... one displacement
    // per round across all n proposers even though no list is longer
    // than 2. n = 70 > 64 proves a fixed-constant cap is unsafe and the
    // |propPrefs|+1 derived bound is not.
    val n = 70
    val pp = ((1L, 1L, 0L) +: (2 to n).flatMap(i =>
      Seq((i.toLong, i.toLong - 1, 0L), (i.toLong, i.toLong, 1L))))
      .toDF("p", "a", "rank")
    val pa = pp.select(col("a"), col("p"), (lit(1000L) - col("p")).as("score"))
    val got = Matching.stableMatching(pp, pa)
      .as[(Long, Long, Long)].collect().toSet
    val want = ((1L, 1L, 0L) +:
      (2 to n).map(i => (i.toLong, i.toLong, 1L))).toSet
    assert(got == want, s"chain must settle p_i -> a_i: ${got -- want}")
    // an explicit cap below the chain length still fails loudly
    intercept[IllegalArgumentException] {
      Matching.stableMatching(pp, pa, maxRounds = 10)
    }
  }
}
