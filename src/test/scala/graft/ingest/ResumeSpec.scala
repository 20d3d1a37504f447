package graft.ingest

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase
import graft.index.IndexWriter
import graft.streaming.EventsPipeline.{CursorCheckpoint, CursorState}
import CourtListenerSource._

/** End-to-end resume: the ST2 cursor checkpoint composed with the S7
  * idempotent sink — the Spark analog of the reference's
  * broken-then-fixed Q1 recovery (`qdrant_manager.py:46-107`, where the
  * cursor was saved under one field/format and read under another, so a
  * restart silently re-ingested from page 1).
  *
  * Scenario: ingest pages 1-2, checkpoint the cursor, "crash"; a fresh
  * run resumes from the checkpoint, ingests the remaining page, and the
  * index holds every opinion exactly once. A deliberate page-2 replay
  * then proves the sink absorbs at-least-once delivery.
  */
class ResumeSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  // Three pages; docket ids 1..5; one cluster + one opinion per docket,
  // opinion id = docket id * 100.
  private def fetcher: Fetcher = {
    def docket(id: Long) = Docket(id, Seq(s"c/$id"), "scotus")
    new Fetcher {
      def fetchDocketPage(court: String, cursor: Option[String]): DocketPage =
        cursor match {
          case None       => DocketPage(Seq(docket(1), docket(2)), Some("c2"))
          case Some("c2") => DocketPage(Seq(docket(3)), Some("c3"))
          case Some("c3") => DocketPage(Seq(docket(4), docket(5)), None)
          case other      => fail(s"unexpected cursor $other")
        }
      def fetchCluster(url: String): Option[Cluster] = {
        val id = url.stripPrefix("c/").toLong
        Some(Cluster(id, Seq(s"o/$id"), "2020-01-01", "J", "Published"))
      }
      def fetchOpinion(url: String): Option[OpinionJson] =
        Some(OpinionJson(url.stripPrefix("o/").toLong * 100, Map()))
    }
  }

  /** One page batch → index rows (deterministic id per opinion). */
  private def pageToPoints(f: Fetcher, page: DocketPage) = {
    val rows = page.dockets.flatMap(d => expandDocket(f, d))
      .map { case (d, c, o) => (s"op_${o.id}", d.id, c.id, o.id) }
    rows.toDF("id", "docket_id", "cluster_id", "opinion_id")
  }

  test("crash between pages: checkpointed resume ingests the tail exactly once") {
    val tmp = java.nio.file.Files.createTempDirectory("resume").toString
    val indexPath = s"$tmp/index"
    val ckptPath = s"$tmp/cursor"
    val f = fetcher

    // --- run 1: pages 1-2, checkpoint after each, then "crash" ---------
    val run1 = docketPages(f, "scotus", None, maxPages = 2)
    var cursor: Option[String] = None
    run1.foreach { page =>
      IndexWriter.upsertPartitioned(spark, pageToPoints(f, page), indexPath, buckets = 8)
      cursor = page.nextCursor
      CursorCheckpoint.save(spark, ckptPath,
        CursorState("scotus", cursor.getOrElse(""), java.sql.Timestamp.valueOf("2020-01-01 00:00:00")))
    }
    assert(spark.read.parquet(indexPath).count() == 3) // opinions 100,200,300

    // --- run 2: a fresh process resumes from the checkpoint ------------
    val restored = CursorCheckpoint.load(spark, ckptPath)
    assert(restored.map(_.lastCursor).contains("c3"),
      "checkpoint must hand the NEXT cursor to the resumed run")
    val run2 = docketPages(f, "scotus", restored.map(_.lastCursor).filter(_.nonEmpty), maxPages = 10)
    run2.foreach { page =>
      IndexWriter.upsertPartitioned(spark, pageToPoints(f, page), indexPath, buckets = 8)
      CursorCheckpoint.save(spark, ckptPath,
        CursorState("scotus", page.nextCursor.getOrElse(""), java.sql.Timestamp.valueOf("2020-01-01 00:00:01")))
    }

    val index = spark.read.parquet(indexPath)
    assert(index.count() == 5, "resume must ingest exactly the missing tail")
    assert(index.select("opinion_id").as[Long].collect().sorted.toSeq ==
      Seq(100L, 200L, 300L, 400L, 500L))
    assert(IndexWriter.duplicateAudit(index).isEmpty, "no id ingested twice")
    assert(CursorCheckpoint.load(spark, ckptPath).exists(_.lastCursor == ""),
      "final checkpoint records exhaustion (no cursor)")

    // --- at-least-once replay: re-deliver page 2, nothing changes ------
    val replay = f.fetchDocketPage("scotus", Some("c2"))
    val n = IndexWriter.upsertPartitioned(spark, pageToPoints(f, replay), indexPath, buckets = 8)
    assert(n == 5, "replaying an already-ingested page is a no-op on row count")
  }
}
