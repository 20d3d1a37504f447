package graft

import org.scalatest.funsuite.AnyFunSuite

/** The sa-family frame memo's lifecycle (r14 driver advisories): the
  * bench's adjudication rerun must be able to drop a session's warm
  * frames so a flagged build phase re-times COLD (a warm memo would
  * auto-refute a real build regression), and entries are keyed on the
  * session reference, never a reusable identity hash. */
class SaMemoSpec extends AnyFunSuite with SparkTestBase {

  private val sfDir = "/root/testdata/sf0.001"

  test("invalidateSaMemo drops this session's warm frames and the next " +
      "build re-populates them (the adjudication-rerun cold path)") {
    SparkEntry.invalidateSaMemo(spark)
    assert(SparkEntry.saMemoSize(spark) == 0)

    // drive q357's bench phases once: mk derives the planted corpus,
    // the build thunk materializes the shared key table — both memoized
    val phases = SparkEntry.benchPhases("q357_sa_incremental")(spark, sfDir)
    val (_, build) = phases.head
    val rows1 = build()
    assert(rows1 > 0)
    val warm = SparkEntry.saMemoSize(spark)
    assert(warm >= 2, s"planted corpus + key table should be memoized: $warm")

    // the rerun's pre-step: every frame of THIS session drops
    SparkEntry.invalidateSaMemo(spark)
    assert(SparkEntry.saMemoSize(spark) == 0)

    // and a fresh build repopulates with identical results (cold ==
    // warm semantics — the memo is a cost cache, never a value change)
    val phases2 = SparkEntry.benchPhases("q357_sa_incremental")(spark, sfDir)
    val rows2 = phases2.head._2()
    assert(rows2 == rows1)
    assert(SparkEntry.saMemoSize(spark) >= 2)
    SparkEntry.invalidateSaMemo(spark)
  }
}
