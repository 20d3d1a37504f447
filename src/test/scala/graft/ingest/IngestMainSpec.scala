package graft.ingest

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase
import graft.streaming.EventsPipeline.CursorCheckpoint
import CourtListenerSource._

/** The §3.1 lifecycle as one command: pages → expand → chunk/embed →
  * partitioned MERGE → cursor checkpoint — including the kill-mid-run /
  * resume path and duplicate-free convergence on replays. */
class IngestMainSpec extends AnyFunSuite with SparkTestBase {

  /** Wrap the demo fetcher to throw on the Nth docket-page fetch. */
  private def dyingFetcher(dieOnCall: Int): Fetcher = new Fetcher {
    private val inner = IngestMain.demoFetcher()
    private var calls = 0
    def fetchDocketPage(court: String, cursor: Option[String]): DocketPage = {
      calls += 1
      if (calls >= dieOnCall) throw new RuntimeException("simulated network death")
      inner.fetchDocketPage(court, cursor)
    }
    def fetchCluster(url: String): Option[Cluster] = inner.fetchCluster(url)
    def fetchOpinion(url: String): Option[OpinionJson] = inner.fetchOpinion(url)
  }

  test("kill mid-run, resume: cursor advanced, tail ingested, no duplicate ids") {
    val tmp = java.nio.file.Files.createTempDirectory("ingest_e2e").toString
    val cfg = IngestMain.Config(court = "scotus", maxPages = 10,
      indexPath = s"$tmp/index", cursorPath = s"$tmp/cursor")

    // run 1: page 1 lands, the page-2 fetch dies AFTER page 1 committed
    val e = intercept[RuntimeException] {
      IngestMain.runIngest(spark, dyingFetcher(dieOnCall = 2), cfg)
    }
    assert(e.getMessage.contains("simulated"))
    val afterCrash = CursorCheckpoint.load(spark, cfg.cursorPath)
    assert(afterCrash.map(_.lastCursor) == Some("p2"), "cursor must sit at page 2")
    val idx1 = spark.read.parquet(cfg.indexPath)
    val dockets1 = idx1.select("docket_id").distinct().collect().map(_.getLong(0)).toSet
    assert(dockets1 == Set(1L, 2L), "only page-1 dockets before the crash")

    // run 2: fresh fetcher resumes from the checkpoint and finishes
    val stats = IngestMain.runIngest(spark, IngestMain.demoFetcher(), cfg)
    assert(stats.pages == 2, "resume must fetch only pages 2 and 3")
    val idx2 = spark.read.parquet(cfg.indexPath)
    val dockets2 = idx2.select("docket_id").distinct().collect().map(_.getLong(0)).toSet
    assert(dockets2 == Set(1L, 2L, 3L, 4L, 5L))
    assert(idx2.select("id").distinct().count() == idx2.count(), "no duplicate ids")

    // run 3: full replay from the saved cursor — existing dockets are
    // skipped and the id-keyed MERGE keeps the index byte-identical in
    // cardinality
    val n2 = idx2.count()
    val stats3 = IngestMain.runIngest(spark, IngestMain.demoFetcher(), cfg)
    assert(stats3.pointsUpserted == 0, "every docket already ingested")
    assert(spark.read.parquet(cfg.indexPath).count() == n2)
  }

  test("opinionDocs coalesces text by the reference priority and tracks source_field") {
    val triples = Seq(
      (Docket(1, Seq("c/1"), "scotus"), Cluster(1, Seq("o/1"), "2020-01-01", "J", "P"),
        OpinionJson(100, Map("plain_text" -> "plain body", "html" -> "<p>html body</p>"))),
      (Docket(2, Seq("c/2"), "scotus"), Cluster(2, Seq("o/2"), "2020-01-02", "J", "P"),
        OpinionJson(200, Map("html" -> "<p>only html</p>"))))
    val out = IngestMain.opinionDocs(spark, triples).collect()
      .map(r => r.getAs[Long]("doc_id") -> (r.getAs[String]("text"), r.getAs[String]("source_field")))
      .toMap
    assert(out(100L) == ("plain body", "plain_text")) // beats html in priority
    assert(out(200L) == ("<p>only html</p>", "html"))
  }
}

/** HTTP layer above the socket: URL construction, JSON mapping, cursor
  * extraction, retry — via an injected transport, no network. */
class HttpFetcherSpec extends AnyFunSuite {

  private val pageJson =
    """{"count": 3, "next": "https://api.test/v4/dockets/?court=scotus&cursor=cD0yMDIw&ordering=id",
      |"results": [
      |  {"id": 11, "court_id": "scotus", "clusters": ["https://api.test/c/1/"]},
      |  {"id": 12, "court_id": "scotus", "clusters": []},
      |  {"absolute_url": "/no/id/docket"}
      |]}""".stripMargin

  test("docket page: url params, results mapping, cursor extracted from next") {
    var seenUrl = ""
    val f = new HttpFetcher(baseUrl = "https://api.test/v4", sleep = _ => (),
      transport = { url => seenUrl = url; pageJson })
    val page = f.fetchDocketPage("scotus", Some("abc xyz"))
    assert(seenUrl == "https://api.test/v4/dockets/?court=scotus&ordering=id&cursor=abc+xyz")
    assert(page.dockets.map(_.id) == Seq(11L, 12L), "id-less docket dropped")
    assert(page.dockets.head.clusterUrls == Seq("https://api.test/c/1/"))
    assert(page.nextCursor == Some("cD0yMDIw"))
  }

  test("cluster and opinion mapping: sub_opinions, date, text-field priority") {
    val f = new HttpFetcher(sleep = _ => (), transport = {
      case u if u.contains("/c/") =>
        """{"id": 7, "sub_opinions": ["https://api.test/o/9/"],
          |"date_filed": "2019-06-01", "judges": "Roberts",
          |"precedential_status": "Published"}""".stripMargin
      case u if u.contains("/o/") =>
        """{"id": 9, "plain_text": "the text", "html": "<p>x</p>", "html_lawbox": null}"""
      case u => fail(s"unexpected $u")
    })
    val c = f.fetchCluster("https://api.test/c/7/").get
    assert(c.id == 7 && c.subOpinionUrls == Seq("https://api.test/o/9/"))
    assert(c.dateFiled == "2019-06-01" && c.judges == "Roberts")
    val o = f.fetchOpinion("https://api.test/o/9/").get
    assert(o.fields == Map("plain_text" -> "the text", "html" -> "<p>x</p>"))
  }

  test("retry: transient transport failures are retried, exhaustion skips cluster but aborts page") {
    var calls = 0
    val flaky: String => String = { _ =>
      calls += 1
      if (calls < 3) throw new RuntimeException("boom")
      """{"id": 1, "sub_opinions": []}"""
    }
    val f = new HttpFetcher(policy = RetryPolicy(maxRetries = 3, retryDelayMs = 1),
      sleep = _ => (), transport = flaky)
    assert(f.fetchCluster("https://api.test/c/1/").isDefined)
    assert(calls == 3)

    val dead = new HttpFetcher(policy = RetryPolicy(maxRetries = 2, retryDelayMs = 1),
      sleep = _ => (), transport = _ => throw new RuntimeException("down"))
    assert(dead.fetchCluster("u").isEmpty, "cluster failure skips (reference contract)")
    intercept[RuntimeException] { dead.fetchDocketPage("scotus", None) }
  }

  test("cursorOf handles encoded and absent cursors") {
    assert(HttpFetcher.cursorOf("https://x/v4/dockets/?cursor=cD0x&o=id") == Some("cD0x"))
    assert(HttpFetcher.cursorOf("https://x/v4/dockets/?cursor=a%3Db") == Some("a=b"))
    assert(HttpFetcher.cursorOf("https://x/v4/dockets/?o=id") == None)
  }
}
