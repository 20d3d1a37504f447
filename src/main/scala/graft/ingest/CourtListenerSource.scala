package graft.ingest

import scala.annotation.tailrec

/** S1-S4 — cursor-paginated REST source with retry, rate-limit, and
  * resumable cursor state, re-expressed from the reference's ingestion
  * loop (`/root/reference/data-ingestion/data_extraction.py:67-130`,
  * `opinion_utills.py:14-40`).
  *
  * The HTTP boundary is a trait so the pipeline is testable with zero
  * network (this environment has no egress; production would plug a real
  * client in). Page fetching is driver-side by design — CourtListener's
  * cursor pagination is inherently sequential — while everything *per
  * page* (cluster/opinion expansion, clean, chunk, embed) fans out as a
  * Spark job per page batch (§3.1). At scale the per-URL lookups (S2/S3)
  * run in `mapPartitions` with one rate-limited client per executor.
  */
object CourtListenerSource {

  /** Minimal JSON-ish API record: raw payload + the fields the pipeline
    * projects (SURVEY §1.1). */
  final case class DocketPage(dockets: Seq[Docket], nextCursor: Option[String])
  final case class Docket(id: Long, clusterUrls: Seq[String], courtId: String,
      raw: String = "")
  final case class Cluster(id: Long, subOpinionUrls: Seq[String],
      dateFiled: String, judges: String, precedentialStatus: String, raw: String = "")
  final case class OpinionJson(id: Long, fields: Map[String, String], raw: String = "")

  /** The network boundary (one per executor / driver). */
  trait Fetcher extends Serializable {
    def fetchDocketPage(court: String, cursor: Option[String]): DocketPage
    def fetchCluster(url: String): Option[Cluster]
    def fetchOpinion(url: String): Option[OpinionJson]
  }

  /** S4 — retry + rate-limit policy (reference defaults: 0.5 s delay per
    * request, 3 attempts, linear backoff `retryDelay * attempt`). */
  final case class RetryPolicy(
      maxRetries: Int = 3,
      retryDelayMs: Long = 2000,
      requestDelayMs: Long = 500)

  /** Wrap any fetch thunk with the S4 policy. Returns None on exhaustion
    * (the reference logs and skips). */
  def withRetry[T](policy: RetryPolicy, sleep: Long => Unit = Thread.sleep)(
      thunk: => T): Option[T] = {
    @tailrec def attempt(n: Int): Option[T] = {
      sleep(policy.requestDelayMs)
      val r = try Some(thunk) catch { case scala.util.control.NonFatal(_) => None }
      r match {
        case some @ Some(_) => some
        case None if n < policy.maxRetries - 1 =>
          sleep(policy.retryDelayMs * (n + 1))
          attempt(n + 1)
        case None => None
      }
    }
    if (policy.maxRetries <= 0) None else attempt(0)
  }

  /** S1 — the driver-side page loop: stream pages from `startCursor`
    * until exhaustion or `maxPages`, skipping docket ids for which
    * `existingIds` returns true (P2). NOTE the production ingest
    * ([[graft.ingest.IngestMain.runIngest]]) does NOT use this
    * predicate: it filters pages caller-side through a Bloom filter
    * plus a per-page exact confirmation, because a probabilistic
    * predicate here could false-positive-skip a genuinely new docket
    * with no later rescue. Pass only EXACT membership tests. */
  def docketPages(fetcher: Fetcher, court: String,
      startCursor: Option[String], maxPages: Int,
      existingIds: Long => Boolean = _ => false): Iterator[DocketPage] =
    new Iterator[DocketPage] {
      private var cursor = startCursor
      private var pages = 0
      private var exhausted = false
      def hasNext: Boolean = !exhausted && pages < maxPages
      def next(): DocketPage = {
        val page = fetcher.fetchDocketPage(court, cursor)
        val filtered = page.copy(dockets = page.dockets.filterNot(d => existingIds(d.id)))
        cursor = page.nextCursor
        pages += 1
        if (page.nextCursor.isEmpty) exhausted = true
        filtered
      }
    }

  /** S2/S3 — expand one docket to its opinions (the 1-N FK lookups). */
  def expandDocket(fetcher: Fetcher, d: Docket): Seq[(Docket, Cluster, OpinionJson)] =
    for {
      cUrl <- d.clusterUrls
      cluster <- fetcher.fetchCluster(cUrl).toSeq
      oUrl <- cluster.subOpinionUrls
      op <- fetcher.fetchOpinion(oUrl).toSeq
    } yield (d, cluster, op)
}
