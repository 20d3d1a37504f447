package graft.index

import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicInteger

import scala.jdk.CollectionConverters._

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** In-memory store double: shared JVM state (local mode) keyed by run id
  * so parallel suites can't collide. Stores upserts by point id — the
  * same idempotence contract as the real store. */
object InMemoryStore {
  val points = new ConcurrentHashMap[String, ConcurrentHashMap[String, PointSink.Point]]()
  val batchSizes = new ConcurrentHashMap[String, java.util.Queue[Integer]]()
  val failuresToInject = new ConcurrentHashMap[String, AtomicInteger]()
  val attempts = new ConcurrentHashMap[String, AtomicInteger]()

  def reset(run: String, failures: Int = 0): Unit = {
    points.put(run, new ConcurrentHashMap())
    batchSizes.put(run, new java.util.concurrent.ConcurrentLinkedQueue[Integer]())
    failuresToInject.put(run, new AtomicInteger(failures))
    attempts.put(run, new AtomicInteger(0))
  }

  final class Factory(run: String) extends PointSink.SinkFactory {
    def open(partitionId: Int): PointSink.Sink = new PointSink.Sink {
      def upsertBatch(batch: Seq[PointSink.Point]): Unit = {
        attempts.get(run).incrementAndGet()
        if (failuresToInject.get(run).getAndDecrement() > 0)
          throw new RuntimeException("injected transient store failure")
        failuresToInject.get(run).compareAndSet(-1, 0) // clamp
        batchSizes.get(run).add(batch.size)
        batch.foreach(p => points.get(run).put(p.id, p))
      }
    }
  }
}

class PointSinkSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def samplePoints(n: Int) =
    (1 to n).map(i => (s"id$i", Array.fill(4)(i.toFloat), i.toLong, s"text $i"))
      .toDF("id", "dense_vec", "doc_id", "chunk_text")

  test("writes every point in bounded batches through foreachPartition") {
    InMemoryStore.reset("basic")
    PointSink.write(samplePoints(137).repartition(3),
      new InMemoryStore.Factory("basic"), batchSize = 16)
    val stored = InMemoryStore.points.get("basic")
    assert(stored.size() == 137)
    val p = stored.get("id7")
    assert(p.vector.toSeq == Seq(7f, 7f, 7f, 7f))
    assert(p.payload == Map("doc_id" -> "7", "chunk_text" -> "text 7"))
    val sizes = InMemoryStore.batchSizes.get("basic").asScala.map(_.toInt).toSeq
    assert(sizes.forall(_ <= 16), s"oversized batch: $sizes")
    assert(sizes.sum == 137)
  }

  test("transient failure: same batch is re-sent, result has no duplicates") {
    InMemoryStore.reset("retry", failures = 2)
    PointSink.write(samplePoints(20).coalesce(1),
      new InMemoryStore.Factory("retry"), batchSize = 10,
      retry = PointSink.RetryPolicy(maxRetries = 3, retryDelayMs = 1),
      sleep = _ => ())
    assert(InMemoryStore.points.get("retry").size() == 20)
    // 2 batches + 2 failed attempts on the first one
    assert(InMemoryStore.attempts.get("retry").get() == 4)
    assert(InMemoryStore.batchSizes.get("retry").asScala.map(_.toInt).sum == 20)
  }

  test("retry exhaustion surfaces the store error") {
    InMemoryStore.reset("dead", failures = 1000)
    val e = intercept[org.apache.spark.SparkException] {
      PointSink.write(samplePoints(5).coalesce(1),
        new InMemoryStore.Factory("dead"), batchSize = 5,
        retry = PointSink.RetryPolicy(maxRetries = 2, retryDelayMs = 1),
        sleep = _ => ())
    }
    assert(e.getMessage.contains("injected") ||
      Option(e.getCause).exists(_.getMessage.contains("injected")))
  }

  test("the writer's projection introduces no exchange (narrow export)") {
    val plan = PointSink.narrow(samplePoints(10), "id", "dense_vec",
      Seq("doc_id", "chunk_text")).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"export plan must stay narrow:\n$plan")
  }

  test("full pipeline feed: chunkPoints → sink, ids are uuid5, vectors 384-d") {
    InMemoryStore.reset("pipe")
    val docs = Seq(
      (1L, "The court held that the statute applies. " * 20),
      (2L, "A contract dispute over delivery terms arose. " * 20))
      .toDF("doc_id", "text")
    val pts = graft.ingest.ChunkPipeline.chunkPoints(spark, docs)
    PointSink.write(pts, new InMemoryStore.Factory("pipe"), batchSize = 8)
    val stored = InMemoryStore.points.get("pipe")
    assert(stored.size() > 0)
    stored.values().asScala.foreach { p =>
      assert(p.id.matches("[0-9a-f]{8}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{12}"))
      assert(p.vector.length == 384)
      assert(p.payload.contains("chunk_text") && p.payload("chunk_text").nonEmpty)
    }
  }
}
