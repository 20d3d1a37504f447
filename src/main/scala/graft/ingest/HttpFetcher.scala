package graft.ingest

import java.net.{URI, URLDecoder, URLEncoder}
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets.UTF_8
import java.time.Duration

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

import CourtListenerSource._

/** The production [[CourtListenerSource.Fetcher]]: `java.net.http
  * .HttpClient` against the public CourtListener REST v4 API, mirroring
  * the reference's request layer (`data-ingestion/opinion_utills.py:14-40`
  * — retry with linear backoff and a per-request delay — and the URL /
  * JSON shapes of `data_extraction.py:67-130,133-215`).
  *
  * Always compiled; actually reaching the network requires egress (none
  * in the build sandbox), so integration runs gate on the caller (e.g.
  * [[IngestMain]] requires `GRAFT_INGEST_LIVE=1`). Everything above the
  * socket — URL construction, cursor extraction, JSON mapping, retry —
  * is pure and covered by HttpFetcherSpec via an injected transport.
  *
  * @param transport the HTTP boundary (url, headers) → body; swap for a
  *   stub in tests. The default performs a real GET.
  */
final class HttpFetcher(
    baseUrl: String = "https://www.courtlistener.com/api/rest/v4",
    apiToken: Option[String] = None,
    policy: RetryPolicy = RetryPolicy(),
    sleep: Long => Unit = Thread.sleep,
    transport: String => String = HttpFetcher.defaultTransport) extends Fetcher {

  private val mapper = new ObjectMapper()

  private def getJson(url: String): Option[JsonNode] =
    withRetry(policy, sleep) { mapper.readTree(transport(url)) }

  override def fetchDocketPage(court: String, cursor: Option[String]): DocketPage = {
    val params = Seq("court" -> court, "ordering" -> "id") ++
      cursor.map("cursor" -> _)
    val qs = params.map { case (k, v) =>
      s"$k=${URLEncoder.encode(v, UTF_8)}" }.mkString("&")
    val node = getJson(s"$baseUrl/dockets/?$qs").getOrElse(
      // the reference aborts the whole run on a failed PAGE (unlike
      // cluster/opinion fetches, which it skips) — same contract here
      throw new RuntimeException(s"docket page fetch failed (cursor=$cursor)"))
    val dockets = arr(node, "results").flatMap { d =>
      Option(d.get("id")).filter(_.isNumber).map { id =>
        Docket(
          id = id.asLong(),
          clusterUrls = arr(d, "clusters").map(_.asText()),
          courtId = Option(d.get("court_id")).map(_.asText("")).getOrElse(""),
          raw = d.toString)
      }
    }
    DocketPage(dockets, Option(node.get("next")).filterNot(_.isNull)
      .map(_.asText()).flatMap(HttpFetcher.cursorOf))
  }

  override def fetchCluster(url: String): Option[Cluster] =
    getJson(url).flatMap { c =>
      Option(c.get("id")).filter(_.isNumber).map { id =>
        Cluster(
          id = id.asLong(),
          subOpinionUrls = arr(c, "sub_opinions").map(_.asText()),
          dateFiled = text(c, "date_filed"),
          judges = text(c, "judges"),
          precedentialStatus = text(c, "precedential_status"),
          raw = c.toString)
      }
    }

  override def fetchOpinion(url: String): Option[OpinionJson] =
    getJson(url).flatMap { o =>
      Option(o.get("id")).filter(_.isNumber).map { id =>
        OpinionJson(
          id = id.asLong(),
          fields = HttpFetcher.TextFieldPriority.flatMap { f =>
            Option(o.get(f)).filterNot(_.isNull).map(_.asText())
              .filter(_.nonEmpty).map(f -> _)
          }.toMap,
          raw = o.toString)
      }
    }

  private def arr(n: JsonNode, field: String): Seq[JsonNode] =
    Option(n.get(field)).filter(_.isArray)
      .map(_.elements().asScala.toSeq).getOrElse(Seq.empty)

  private def text(n: JsonNode, field: String): String =
    Option(n.get(field)).filterNot(_.isNull).map(_.asText("")).getOrElse("")
}

object HttpFetcher {

  /** Opinion text fields in the reference's priority order
    * (`config.yml:26-34` `citation_types`). */
  val TextFieldPriority: Seq[String] = Seq(
    "html_with_citations", "plain_text", "html_columbia", "html_lawbox",
    "html_anon_2020", "html")

  /** Extract the bare cursor value from a `next` page URL — the
    * reference stores only the cursor, not the URL
    * (`data_extraction.py:102-108`). */
  def cursorOf(nextUrl: String): Option[String] =
    Option(URI.create(nextUrl).getRawQuery).flatMap {
      _.split("&").toSeq
        .find(_.startsWith("cursor="))
        .map(kv => URLDecoder.decode(kv.drop("cursor=".length), UTF_8))
    }

  /** Real GET; non-2xx raises (→ the retry wrapper backs off). */
  def defaultTransport: String => String = { url =>
    val client = HttpClient.newBuilder()
      .connectTimeout(Duration.ofSeconds(30)).build()
    val req = HttpRequest.newBuilder(URI.create(url))
      .timeout(Duration.ofSeconds(60)).GET().build()
    val resp = client.send(req, HttpResponse.BodyHandlers.ofString())
    if (resp.statusCode() / 100 != 2)
      throw new RuntimeException(s"HTTP ${resp.statusCode()} for $url")
    resp.body()
  }

  /** Fetcher with the API token header applied (the reference sends
    * `Authorization: Token <key>` when configured). */
  def withToken(token: String,
      baseUrl: String = "https://www.courtlistener.com/api/rest/v4"): HttpFetcher =
    new HttpFetcher(baseUrl, Some(token), transport = { url =>
      val client = HttpClient.newBuilder()
        .connectTimeout(Duration.ofSeconds(30)).build()
      val req = HttpRequest.newBuilder(URI.create(url))
        .header("Authorization", s"Token $token")
        .timeout(Duration.ofSeconds(60)).GET().build()
      val resp = client.send(req, HttpResponse.BodyHandlers.ofString())
      if (resp.statusCode() / 100 != 2)
        throw new RuntimeException(s"HTTP ${resp.statusCode()} for $url")
      resp.body()
    })
}
