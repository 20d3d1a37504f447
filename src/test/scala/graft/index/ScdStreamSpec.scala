package graft.index

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** Streaming SCD2 maintenance over versioned snapshots: one pinned
  * dimension version per micro-batch, history PIT-joinable mid-stream,
  * replay convergence, stream end-state ≡ batch rebuild. */
class ScdStreamSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s + " 00:00:00")

  private def dimRows(d: DataFrame): Set[(Long, String, String, String, Long)] =
    d.select(col("k"), col("v"),
        date_format(col("effective_from"), "yyyy-MM-dd").as("f"),
        coalesce(date_format(col("effective_to"), "yyyy-MM-dd"), lit("-")),
        col("version"))
      .as[(Long, String, String, String, Long)].collect().toSet

  test("one dim version per batch; pinned version serves PIT; replay " +
      "converges; end state equals the batch rebuild") {
    val base = Files.createTempDirectory("graft_scd_stream").toString
    val src = s"$base/src"
    val (dim, log) = (s"$base/dim", s"$base/log")
    val b1 = Seq((1L, ts("2020-01-01"), 1L, "A"),
      (2L, ts("2020-01-01"), 2L, "X"))
    val b2 = Seq((1L, ts("2020-02-01"), 3L, "B"), // key 1 changes
      (2L, ts("2020-02-01"), 4L, "X"),            // no-op value
      (3L, ts("2020-02-01"), 5L, "Y"))            // new key
    b1.toDF("k", "ts", "seq", "v").coalesce(1)
      .write.mode("append").parquet(src)
    b2.toDF("k", "ts", "seq", "v").coalesce(1)
      .write.mode("append").parquet(src)
    val schema = spark.read.parquet(src).schema

    def run(checkpoint: String): Unit = {
      val stream = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(src)
      val q = ScdStream.streamApply(spark, stream, dim, log,
        checkpoint = checkpoint, keyCol = "k", tsCol = "ts",
        seqCol = "seq", attrCols = Seq("v"))
      q.processAllAvailable(); q.stop()
    }
    run(s"$base/cp1")

    assert(Snapshots.versions(spark, dim) == Seq(1L, 2L))
    // pinned v1: first batch only, both keys current
    assert(dimRows(ScdStream.dimAt(spark, dim, 1)) == Set(
      (1L, "A", "2020-01-01", "-", 1L),
      (2L, "X", "2020-01-01", "-", 1L)))
    // latest == full batch rebuild over all observations
    val rebuilt = graft.ops.Scd.scd2Build(
      (b1 ++ b2).toDF("k", "ts", "seq", "v"), "k", "ts", "seq", Seq("v"))
    assert(dimRows(ScdStream.dimAt(spark, dim)) == dimRows(rebuilt))
    // a pinned historical version PIT-joins: at v1, key 1 is still A
    val fact = Seq((9L, 1L, ts("2020-03-01"))).toDF("fid", "k", "at")
    val atV1 = graft.ops.Scd.pitJoin(fact,
      ScdStream.dimAt(spark, dim, 1), "k", "at", Seq("v"))
      .select("fid", "v").as[(Long, String)].collect().toSeq
    assert(atV1 == Seq((9L, "A")), s"v1 serves the old value: $atV1")
    // fresh-checkpoint replay over the same source changes nothing
    val before = dimRows(ScdStream.dimAt(spark, dim))
    val vBefore = Snapshots.versions(spark, dim)
    run(s"$base/cp2")
    assert(Snapshots.versions(spark, dim) == vBefore,
      "fully-logged batches must not commit new versions")
    assert(dimRows(ScdStream.dimAt(spark, dim)) == before)
  }
}
