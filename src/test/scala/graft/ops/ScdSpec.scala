package graft.ops

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** SCD2 build / incremental apply / point-in-time join. */
class ScdSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s + " 00:00:00")

  private def log(rows: (Long, String, Long, String)*): DataFrame =
    rows.map { case (k, d, q, v) => (k, ts(d), q, v) }
      .toDF("k", "ts", "seq", "v")

  private def dimRows(d: DataFrame): Set[(Long, String, String, String, Long, Boolean)] =
    d.select(col("k"), col("v"),
        date_format(col("effective_from"), "yyyy-MM-dd").as("f"),
        coalesce(date_format(col("effective_to"), "yyyy-MM-dd"), lit("-"))
          .as("t"),
        col("version"), col("is_current"))
      .as[(Long, String, String, String, Long, Boolean)].collect().toSet

  test("build collapses runs, closes intervals, versions per key") {
    val d = Scd.scd2Build(log(
      (1L, "2020-01-01", 1L, "A"),
      (1L, "2020-02-01", 2L, "A"), // same value → collapsed
      (1L, "2020-03-01", 3L, "B"),
      (1L, "2020-04-01", 4L, "A"), // A again → NEW interval, not merged
      (2L, "2020-01-15", 5L, "X")), "k", "ts", "seq", Seq("v"))
    assert(dimRows(d) == Set(
      (1L, "A", "2020-01-01", "2020-03-01", 1L, false),
      (1L, "B", "2020-03-01", "2020-04-01", 2L, false),
      (1L, "A", "2020-04-01", "-", 3L, true),
      (2L, "X", "2020-01-15", "-", 1L, true)))
  }

  test("same-ts changes tie-break on seq; zero-width interval emitted") {
    val d = Scd.scd2Build(log(
      (1L, "2020-01-01", 2L, "B"),
      (1L, "2020-01-01", 1L, "A")), "k", "ts", "seq", Seq("v"))
    assert(dimRows(d) == Set(
      (1L, "A", "2020-01-01", "2020-01-01", 1L, false),
      (1L, "B", "2020-01-01", "-", 2L, true)))
  }

  test("incremental apply equals a full rebuild") {
    val old = log(
      (1L, "2020-01-01", 1L, "A"), (1L, "2020-02-01", 2L, "B"),
      (2L, "2020-01-01", 3L, "X"), (3L, "2020-01-01", 4L, "Y"))
    val batch = log(
      (1L, "2020-03-01", 5L, "C"), // new value for key 1
      (2L, "2020-03-01", 6L, "X"), // unchanged value → collapses away
      (4L, "2020-03-01", 7L, "Z")) // brand-new key
    val applied = Scd.scd2Apply(Scd.scd2Build(old, "k", "ts", "seq",
      Seq("v")), batch, "k", "ts", "seq", Seq("v"))
    val rebuilt = Scd.scd2Build(old.unionByName(batch), "k", "ts", "seq",
      Seq("v"))
    assert(dimRows(applied) == dimRows(rebuilt))
    // untouched key 3 passes through; batch precondition held (all
    // batch rows strictly later than every touched open row)
    assert(dimRows(applied).exists(r => r._1 == 3L && r._6))
  }

  test("pitJoin: inclusive from, exclusive to, null before history") {
    val dim = Scd.scd2Build(log(
      (1L, "2020-01-01", 1L, "A"),
      (1L, "2020-02-01", 2L, "B")), "k", "ts", "seq", Seq("v"))
    val fact = Seq(
      (10L, 1L, ts("2019-12-31")), // before first interval → null
      (11L, 1L, ts("2020-01-01")), // from is inclusive → A
      (12L, 1L, ts("2020-01-31")), // inside → A
      (13L, 1L, ts("2020-02-01")), // to is exclusive → B
      (14L, 1L, ts("2021-01-01")), // open interval → B
      (15L, 2L, ts("2020-06-01"))) // unknown key → null
      .toDF("fid", "k", "at")
    val got = Scd.pitJoin(fact, dim, "k", "at", Seq("v"))
      .select(col("fid"), coalesce(col("v"), lit("-")))
      .as[(Long, String)].collect().toSet
    assert(got == Set(10L -> "-", 11L -> "A", 12L -> "A", 13L -> "B",
      14L -> "B", 15L -> "-"))
    // disjoint intervals → at-most-1:1, row count preserved
    assert(Scd.pitJoin(fact, dim, "k", "at", Seq("v")).count() == 6L)
  }

  test("ivmAggDelta: delta propagation matches hand recompute, " +
      "zero-count group dropped, new group appears, negative count " +
      "and bad op refuse loudly") {
    val view = Seq(("a", 2L, 10L), ("b", 1L, 5L)).toDF("g", "cnt", "sum_v")
    val delta = Seq(("D", "a", 4L), ("I", "a", 7L), ("D", "b", 5L),
      ("I", "c", 3L)).toDF("op", "g", "v")
    val got = Scd.ivmAggDelta(view, delta, Seq("g"))
      .as[(String, Long, Long)].collect().toSet
    // a: 2 rows, 10−4+7 = 13; b deleted to count 0 → dropped; c new
    assert(got == Set(("a", 2L, 13L), ("c", 1L, 3L)), s"got $got")
    intercept[IllegalArgumentException] {
      Scd.ivmAggDelta(view, Seq(("D", "zz", 1L)).toDF("op", "g", "v"),
        Seq("g"))
    }
    intercept[IllegalArgumentException] {
      Scd.ivmAggDelta(view, Seq(("X", "a", 1L)).toDF("op", "g", "v"),
        Seq("g"))
    }
    intercept[IllegalArgumentException] {
      Scd.ivmAggDelta(view, delta, Seq.empty)
    }
  }
}
