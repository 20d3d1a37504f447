package graft.index

import scala.annotation.tailrec
import scala.util.control.NonFatal

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** S7's bulk-export variant: stream index points from executors into an
  * external vector store (the reference pushes every batch through
  * `qdrant_client.upsert`, `data-ingestion/qdrant_manager.py:38-43`,
  * with points built in `data_extraction.py:284-312`).
  *
  * The engine side is a `foreachPartition` writer over the narrow
  * chunk-point pipeline: no shuffle is introduced — each task opens one
  * client, sends its partition in bounded batches with retry, and
  * closes. Correctness under Spark task retries comes from the SINK's
  * contract, not coordination: upserts are keyed by point id, so a
  * replayed batch (task retry, speculative task, network retry) lands
  * on the same ids — exactly the reference's Qdrant semantics. The
  * store client itself is out-of-engine (no egress here); any client is
  * a ~10-line [[PointSink.Sink]] impl, and the in-memory double in the
  * spec exercises the full writer path.
  */
object PointSink {

  /** One index point: stable id, dense vector, string payload (the
    * reference's payload is a flat dict of strings, `Chunk.to_dict`). */
  final case class Point(id: String, vector: Array[Float],
      payload: Map[String, String])

  /** The store boundary. Implementations must be idempotent per point
    * id (an upsert, not an insert) — the writer RELIES on this to be
    * exactly-once-per-id under retries. */
  trait Sink {
    def upsertBatch(points: Seq[Point]): Unit
    def close(): Unit = ()
  }

  /** One sink per partition/task (a client per executor-slot, mirroring
    * the reference's one global client per process). */
  trait SinkFactory extends Serializable {
    def open(partitionId: Int): Sink
  }

  final case class RetryPolicy(maxRetries: Int = 3, retryDelayMs: Long = 1000)

  /** Export `points` to the sink. Expects the pipeline's column names
    * ([[graft.ingest.ChunkPipeline.chunkPoints]]): `idCol` string,
    * `vecCol` array<float>, every `payloadCols` column stringified.
    *
    * Plan shape: one narrow projection over the input — callers feeding
    * the chunk pipeline get scan→clean→chunk→embed→export with no
    * exchange anywhere (asserted in PointSinkSpec). */
  def write(points: DataFrame, factory: SinkFactory,
      batchSize: Int = 64, retry: RetryPolicy = RetryPolicy(),
      idCol: String = "id", vecCol: String = "dense_vec",
      payloadCols: Seq[String] = Seq("doc_id", "chunk_text"),
      sleep: Long => Unit = Thread.sleep): Unit = {
    require(batchSize > 0, "batchSize must be positive")
    val projected = narrow(points, idCol, vecCol, payloadCols)
    val pcols = payloadCols // avoid closing over the DataFrame
    projected.foreachPartition { (rows: Iterator[org.apache.spark.sql.Row]) =>
      val pid = org.apache.spark.TaskContext.getPartitionId()
      val sink = factory.open(pid)
      try {
        rows.grouped(batchSize).foreach { batch =>
          val pts = batch.map { r =>
            Point(
              id = r.getString(0),
              vector = r.getSeq[Float](1).toArray,
              payload = pcols.zipWithIndex.map { case (c, i) =>
                c -> Option(r.get(i + 2)).map(_.toString).getOrElse("")
              }.toMap)
          }
          sendWithRetry(sink, pts, retry, sleep)
        }
      } finally sink.close()
    }
  }

  /** The projection the writer runs over — exposed so tests (and plan
    * audits) can check it stays exchange-free. */
  def narrow(points: DataFrame, idCol: String, vecCol: String,
      payloadCols: Seq[String]): DataFrame =
    points.select(
      (Seq(col(idCol).cast("string"), col(vecCol)) ++
        payloadCols.map(c => col(c).cast("string"))): _*)

  /** Linear-backoff resend of the SAME batch (same ids — safe because
    * sinks are upserts). Exhaustion rethrows: the Spark task retry then
    * replays the partition, which is again id-idempotent. */
  @tailrec
  private def sendWithRetry(sink: Sink, batch: Seq[Point],
      retry: RetryPolicy, sleep: Long => Unit, attempt: Int = 0): Unit = {
    val r = try { sink.upsertBatch(batch); None } catch {
      case NonFatal(e) => Some(e)
    }
    r match {
      case None => ()
      case Some(e) if attempt >= retry.maxRetries - 1 => throw e
      case Some(_) =>
        sleep(retry.retryDelayMs * (attempt + 1))
        sendWithRetry(sink, batch, retry, sleep, attempt + 1)
    }
  }
}
