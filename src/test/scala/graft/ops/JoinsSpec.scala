package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class JoinsSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("asofJoin: latest right at-or-before left; inclusive tie; null before first") {
    val quotes = Seq( // (key, time, price)
      (1L, 10L, 100.0), (1L, 20L, 110.0), (1L, 30L, 120.0),
      (2L, 15L, 50.0))
      .toDF("sym", "t", "price")
    val trades = Seq( // (key, time, qty)
      (1L, 5L, 7L),   // before any quote -> null price
      (1L, 20L, 8L),  // exactly at a quote -> inclusive, 110
      (1L, 25L, 9L),  // between quotes -> 110
      (1L, 35L, 10L), // after last -> 120
      (2L, 16L, 11L)) // other key isolated -> 50
      .toDF("sym", "t", "qty")
    val out = Joins.asofJoin(trades, quotes, "sym", "t",
        Seq(("price", "quote_price"), ("t", "quote_t")))
      .select("sym", "t", "qty", "quote_price", "quote_t")
      .as[(Long, Long, Long, Option[Double], Option[Long])].collect()
      .sortBy(r => (r._1, r._2)).toSeq
    assert(out == Seq(
      (1L, 5L, 7L, None, None),
      (1L, 20L, 8L, Some(110.0), Some(20L)),
      (1L, 25L, 9L, Some(110.0), Some(20L)),
      (1L, 35L, 10L, Some(120.0), Some(30L)),
      (2L, 16L, 11L, Some(50.0), Some(15L))))
  }

  test("rangeJoin: exact containment, exclusive upper edge, one match per pair") {
    val facts = Seq((1L, 0.0), (2L, 9.99), (3L, 10.0), (4L, 25.0), (5L, 39.99), (6L, 40.0))
      .toDF("id", "v")
    val dims = Seq(("a", 0.0, 10.0), ("b", 10.0, 40.0), ("wide", 0.0, 40.0))
      .toDF("band", "lo", "hi")
    // binSize 7 deliberately misaligned with the interval edges
    val out = Joins.rangeJoin(facts, dims, "v", "lo", "hi", binSize = 7.0)
      .select("id", "band").as[(Long, String)].collect().toSet
    assert(out == Set(
      (1L, "a"), (2L, "a"),            // [0,10)
      (3L, "b"), (4L, "b"), (5L, "b"), // [10,40): 40.0 excluded
      (1L, "wide"), (2L, "wide"), (3L, "wide"), (4L, "wide"), (5L, "wide")))
  }

  test("rangeJoin plan: equi-join on bins, not a cross-product") {
    val facts = Seq((1L, 5.0)).toDF("id", "v")
    val dims = Seq(("a", 0.0, 10.0)).toDF("band", "lo", "hi")
    val plan = Joins.rangeJoin(facts, dims, "v", "lo", "hi", 5.0)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"),
      s"range join must not plan a cross-product:\n$plan")
  }

  test("ensureBucketedTable: fingerprint change rebuilds; unowned dir refused") {
    val wh = spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:")
    val tbl = "bk_spec_fp"
    try {
      Joins.ensureBucketedTable(
        Seq((1L, "v1")).toDF("k", "v"), tbl, "k", buckets = 2, fingerprint = "fpA")
      assert(spark.table(tbl).select("v").as[String].head() == "v1")
      // same fingerprint -> skip (stale df content never written)
      Joins.ensureBucketedTable(
        Seq((1L, "v2")).toDF("k", "v"), tbl, "k", buckets = 2, fingerprint = "fpA")
      assert(spark.table(tbl).select("v").as[String].head() == "v1")
      // changed fingerprint (source regenerated) -> rebuild
      Joins.ensureBucketedTable(
        Seq((1L, "v2")).toDF("k", "v"), tbl, "k", buckets = 2, fingerprint = "fpB")
      assert(spark.table(tbl).select("v").as[String].head() == "v2")
    } finally spark.sql(s"DROP TABLE IF EXISTS $tbl")

    // a warehouse dir NOT carrying the graft marker must never be deleted
    val alien = new java.io.File(wh, "bk_spec_alien")
    alien.mkdirs()
    val payload = new java.io.File(alien, "data.txt")
    java.nio.file.Files.write(payload.toPath, "not ours".getBytes("UTF-8"))
    try {
      intercept[IllegalStateException] {
        Joins.ensureBucketedTable(
          Seq((1L, "x")).toDF("k", "v"), "bk_spec_alien", "k", buckets = 2)
      }
      assert(payload.isFile, "unowned data must survive the refusal")
    } finally { payload.delete(); alien.delete() }

    // a marker-LESS dir holding only Spark output files is a pre-marker
    // graft orphan: migrated (deleted + rewritten), not refused
    val orphan = new java.io.File(wh, "bk_spec_orphan")
    orphan.mkdirs()
    java.nio.file.Files.write(new java.io.File(orphan, "_SUCCESS").toPath,
      Array.emptyByteArray)
    java.nio.file.Files.write(
      new java.io.File(orphan, "part-00000-old.snappy.parquet").toPath,
      "stale".getBytes("UTF-8"))
    try {
      Joins.ensureBucketedTable(
        Seq((1L, "fresh")).toDF("k", "v"), "bk_spec_orphan", "k", buckets = 2)
      assert(spark.table("bk_spec_orphan").select("v").as[String].head() == "fresh")
    } finally spark.sql("DROP TABLE IF EXISTS bk_spec_orphan")
  }

  test("dataFingerprint: stable on identical tree, changes with content size") {
    val dir = java.nio.file.Files.createTempDirectory("fp_spec").toFile
    try {
      val f = new java.io.File(dir, "part-0")
      java.nio.file.Files.write(f.toPath, "abc".getBytes("UTF-8"))
      val fp1 = Joins.dataFingerprint(dir.getPath)
      assert(fp1 == Joins.dataFingerprint(dir.getPath))
      java.nio.file.Files.write(f.toPath, "abcd".getBytes("UTF-8"))
      assert(Joins.dataFingerprint(dir.getPath) != fp1)
    } finally {
      Option(dir.listFiles()).foreach(_.foreach(_.delete())); dir.delete()
    }
  }

  test("skyline2d: dominated rows drop, equal twins both survive, " +
      "equal-b larger-a dominates, nulls excluded") {
    val df = Seq(
      (1L, Some(5L), Some(5L)),  // frontier
      (2L, Some(5L), Some(3L)),  // dominated by 1 (same a, smaller b)
      (3L, Some(3L), Some(7L)),  // frontier
      (4L, Some(6L), Some(2L)),  // frontier (best a)
      (5L, Some(5L), Some(5L)),  // twin of 1 — equals don't dominate
      (6L, Some(2L), Some(7L)),  // dominated by 3 (equal b, larger a)
      (7L, Some(1L), Some(9L)),  // frontier (best b)
      (8L, None, Some(9L)))      // null dim → excluded
      .toDF("id", "a", "b")
    val got = graft.ops.Joins.skyline2d(df, "id", "a", "b")
      .as[(Long, Long, Long)].collect().map(_._1).toSet
    assert(got == Set(1L, 3L, 4L, 5L, 7L), s"got $got")
  }

  test("selingerJoinOrder: hand chain A-B-C — System-R sizes with " +
      "fixed division order, disconnected subset absent, DP picks the " +
      "small side, deterministic ties, guards") {
    // A: 4 rows, ndv(k1)=2; B: 6 rows, ndv(k1)=3, ndv(k2)=6;
    // C: 2 rows, ndv(k2)=2. Sizes: AB = 24//3 = 8; BC = 12//6 = 2;
    // ABC = 48//3//6 = 2. cost(ABC) = 2 + min(cost(BC)=2, cost(AB)=8)
    // → 4 via removing A last; {A,C} has no edge → absent.
    val a = Seq(1L, 1L, 2L, 2L).toDF("k1")
    val b = Seq((1L, 10L), (2L, 11L), (3L, 12L), (1L, 13L), (2L, 14L),
      (3L, 15L)).toDF("k1", "k2")
    val c = Seq(10L, 11L).toDF("k2")
    val got = Joins.selingerJoinOrder(
        Seq("A" -> a, "B" -> b, "C" -> c),
        Seq((0, "k1", 1, "k1"), (1, "k2", 2, "k2")))
      .as[(Long, String, Long, Long, String)].collect().toSet
    val want = Set(
      (3L, "A,B", 8L, 8L, "A"),   // pair ties break to the lower index
      (6L, "B,C", 2L, 2L, "B"),
      (7L, "A,B,C", 2L, 4L, "A"))
    assert(got == want, s"got $got")
    intercept[IllegalArgumentException] {
      Joins.selingerJoinOrder(Seq("A" -> a), Seq((0, "k1", 0, "k1")))
    }
    intercept[IllegalArgumentException] {
      Joins.selingerJoinOrder(Seq("A" -> a, "B" -> b), Seq.empty)
    }
    intercept[IllegalArgumentException] {
      Joins.selingerJoinOrder(Seq("A" -> a, "B" -> b),
        Seq((0, "k1", 2, "k2")))
    }
  }
}
