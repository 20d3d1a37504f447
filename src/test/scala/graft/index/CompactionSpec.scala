package graft.index

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** IndexWriter.compact: small-file maintenance for both table layouts.
  * Content must be row-identical before/after; file counts shrink to the
  * per-layout budget; the op is re-runnable (idempotent on content). */
class CompactionSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def tmp(): String =
    Files.createTempDirectory("graft_compact").toString + "/idx"

  test("plain layout: fragments merge to the byte-budget file count, rows identical") {
    val path = tmp()
    val pts = (1 to 2000).map(i => (s"id_$i", s"payload_$i")).toDF("id", "payload")
    pts.repartition(40).write.parquet(path)
    val before = spark.read.parquet(path).orderBy("id").collect()

    val report = IndexWriter.compact(spark, path, targetFileBytes = 1L << 30)
    assert(report.filesBefore == 40L, s"fixture wrote 40 fragments: $report")
    assert(report.filesAfter == 1L, s"1 GiB budget swallows the table: $report")
    assert(report.bytesTotal > 0L)
    assert(spark.read.parquet(path).orderBy("id").collect().toSeq == before.toSeq,
      "compaction must not change a single row")

    // re-running is content-idempotent and keeps the compacted shape
    val again = IndexWriter.compact(spark, path, targetFileBytes = 1L << 30)
    assert(again.filesBefore == 1L && again.filesAfter == 1L)
    assert(spark.read.parquet(path).count() == 2000L)
  }

  test("plain layout: a small byte budget yields multiple files") {
    val path = tmp()
    (1 to 5000).map(i => (s"id_$i", "x" * 100)).toDF("id", "payload")
      .repartition(25).write.parquet(path)
    val total = IndexWriter.compact(spark, path, targetFileBytes = 1L << 30).bytesTotal
    // recompact the single file with a budget of ~1/4 the bytes
    val report = IndexWriter.compact(spark, path, targetFileBytes = total / 4)
    assert(report.filesAfter >= 2L && report.filesAfter < 25L,
      s"quarter-budget must split without re-fragmenting: $report")
    assert(spark.read.parquet(path).count() == 5000L)
  }

  test("bucketed layout: per-bucket compaction, partition dirs preserved, rows identical") {
    val path = tmp()
    // fragmented fixture: 10 writer tasks × 4 buckets ≈ 40 small files
    // (the shape many tiny upsertPartitioned batches converge to)
    (1 to 2000).map(i => (s"id_$i", "payload"))
      .toDF("id", "payload")
      .withColumn("bucket", pmod(xxhash64(col("id")), lit(4L)))
      .repartition(10)
      .write.partitionBy("bucket").parquet(path)
    val before = spark.read.parquet(path).orderBy("id").collect()
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(path), spark.sparkContext.hadoopConfiguration)

    val report = IndexWriter.compact(spark, path, targetFileBytes = 1L << 30)
    assert(report.filesBefore > 4L, s"fixture must be fragmented: $report")
    assert(report.filesAfter == 4L, s"one file per bucket at the big budget: $report")
    val dirs = fs.listStatus(new org.apache.hadoop.fs.Path(path))
      .filter(_.isDirectory).map(_.getPath.getName).toSet
    assert(dirs == Set("bucket=0", "bucket=1", "bucket=2", "bucket=3"),
      s"partition layout must survive compaction: $dirs")
    assert(spark.read.parquet(path).orderBy("id").collect().toSeq == before.toSeq)
    // the pruned-read contract still holds after compaction
    val one = spark.read.parquet(path).filter(col("bucket") === 0)
    assert(one.count() > 0L)
  }
}
