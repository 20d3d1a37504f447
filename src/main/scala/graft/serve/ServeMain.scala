package graft.serve

import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.ingest.ChunkPipeline
import graft.index.IndexWriter

/** The serving lifecycle as one runnable command — the counterpart of
  * [[graft.ingest.IngestMain]] for the query side, mirroring the
  * reference's `app.py` startup (load collection → serve Flask):
  *
  *   `runMain graft.serve.ServeMain <sfDir> [port] [--smoke]`
  *
  * Builds the chunk index from `<sfDir>/documents.parquet` through the
  * full pipeline, persists it (the q54 prebuilt-index latency regime:
  * per-request work is only the top-k scans), prepares BM25 corpus
  * stats, and starts [[HttpApi]]. With `--smoke` it round-trips
  * `/health` and `/query` against itself and exits — the offline
  * self-check; otherwise it blocks serving until killed. */
object ServeMain {

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val port = args.lift(1).map(_.toInt).getOrElse(0)
    val smoke = args.contains("--smoke")
    val spark = GraftSession.build()

    val docs = GraftSession.table(spark, sfDir, "documents")
    val index = ChunkPipeline.chunkPoints(spark, docs)
      .select("id", "doc_id", "chunk_text", "dense_vec", "tokens")
      .persist()
    val n = index.count() // materialize once, up front
    val stats = IndexWriter.docFrequencies(index).persist()
    stats.count()
    val avgLen = index.select(avg(size(col("tokens")))).head().getDouble(0)
    val indexPath = s"/tmp/graft_serve_index_${sfDir.replaceAll("[^A-Za-z0-9]", "_")}"
    index.write.mode("overwrite").parquet(indexPath)

    // the full serving matrix, prebuilt once at startup (every build is
    // one pass over the chunk index; per-request work is then lookups):
    // sparse ladder (postings + MaxScore + block-max bounds), positional
    // tier (phrase/proximity), and both ANN indexes (IVF incl. the int8
    // rerank route, HNSW graph walk)
    val postings = IndexWriter.postings(index).persist()
    postings.count()
    val blocks = IndexWriter.blockBounds(postings).persist()
    blocks.count()
    val positions = IndexWriter.positionalPostings(index).persist()
    positions.count()
    val ivf = new graft.ops.Similarity.IvfIndex(index,
      nCentroids = math.max(2, math.min(64, (n / 256).toInt)),
      vecCol = "dense_vec", idCol = "id")
    ivf.assigned.persist().count()
    val hnsw = graft.search.HybridSearch.buildHnswServing(index)
    hnsw.hnsw.graph.count()

    val server = HttpApi.start(HttpApi.Engine(
      spark, index, stats, corpusSize = n, avgDocLen = avgLen,
      indexPath = indexPath,
      ivf = Some(ivf), hnsw = Some(hnsw),
      postings = Some(postings), blockBounds = Some(blocks),
      posPostings = Some(positions)), port)
    println(s"""{"serving":true,"port":${server.port},"points":$n}""")

    if (smoke) {
      val client = java.net.http.HttpClient.newHttpClient()
      def send(req: java.net.http.HttpRequest) =
        client.send(req, java.net.http.HttpResponse.BodyHandlers.ofString())
      val base = s"http://127.0.0.1:${server.port}"
      val health = send(java.net.http.HttpRequest
        .newBuilder(java.net.URI.create(s"$base/health")).GET().build())
      val query = send(java.net.http.HttpRequest
        .newBuilder(java.net.URI.create(s"$base/query"))
        .POST(java.net.http.HttpRequest.BodyPublishers.ofString(
          """{"question":"court filing and docket review","max_results":3}"""))
        .build())
      // one request per serving mode: the smoke proves the whole matrix
      def mode(body: String) = send(java.net.http.HttpRequest
        .newBuilder(java.net.URI.create(s"$base/search"))
        .POST(java.net.http.HttpRequest.BodyPublishers.ofString(body))
        .build()).statusCode()
      val modes = Seq(
        "ivf" -> """{"query":"court filing","limit":3,"ann":"ivf"}""",
        "hnsw" -> """{"query":"court filing","limit":3,"ann":"hnsw"}""",
        "int8" -> """{"query":"court filing","limit":3,"ann":"ivf","rerank":"int8"}""",
        "maxsim" -> """{"query":"court filing","limit":3,"rerank":"maxsim"}""",
        "phrase" -> """{"phrase":"the court","limit":3}""",
        "near" -> """{"near":["court","review"],"max_span":30,"limit":3}""")
        .map { case (m, b) => s""""$m":${mode(b)}""" }.mkString(",")
      println(s"""{"smoke":{"health":${health.statusCode()},""" +
        s""""query":${query.statusCode()},$modes,""" +
        s""""found":${query.body().contains("documents_found")}}}""")
      server.stop()
      spark.stop()
    } else {
      // serve until the process is killed
      Thread.currentThread().join()
    }
  }
}
