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

    val server = HttpApi.start(HttpApi.Engine(
      spark, index, stats, corpusSize = n, avgDocLen = avgLen,
      indexPath = indexPath), port)
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
      println(s"""{"smoke":{"health":${health.statusCode()},""" +
        s""""query":${query.statusCode()},""" +
        s""""found":${query.body().contains("documents_found")}}}""")
      server.stop()
      spark.stop()
    } else {
      // serve until the process is killed
      Thread.currentThread().join()
    }
  }
}
