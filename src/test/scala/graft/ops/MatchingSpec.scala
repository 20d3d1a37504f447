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
}
