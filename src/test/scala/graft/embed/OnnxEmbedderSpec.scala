package graft.embed

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase
import graft.ingest.ChunkPipeline

/** Test double for the ONNX boundary: a "session" that records batch
  * shapes and emits deterministic UN-normalized vectors (so the spec can
  * prove the EMBEDDER performs the reference's normalization). Static
  * recorders: the session runs inside executor tasks (same JVM in local
  * mode). A production runtime differs from this only in what
  * `createSession` wraps — that is the swap-in surface. */
object FakeOnnxRuntime {
  private val sizes = new java.util.concurrent.ConcurrentLinkedQueue[Integer]()
  private val queryPrefixSeen = new java.util.concurrent.atomic.AtomicBoolean(false)
  def reset(): Unit = { sizes.clear(); queryPrefixSeen.set(false) }
  def batchSizes(): Seq[Int] = {
    import scala.jdk.CollectionConverters._
    sizes.asScala.map(_.toInt).toSeq
  }
  def sawQueryPrefix(): Boolean = queryPrefixSeen.get()
  private[embed] def record(batch: Seq[String]): Unit = {
    sizes.add(batch.size)
    if (batch.exists(_.startsWith("Represent this query"))) queryPrefixSeen.set(true)
  }
}

final class FakeOnnxRuntime extends OnnxRuntime {
  override def createSession(modelPath: String, dim: Int,
      maxSeqLen: Int): Seq[String] => Seq[Array[Float]] = { texts =>
    FakeOnnxRuntime.record(texts)
    texts.map { t =>
      val v = new Array[Float](dim)
      var i = 0
      while (i < t.length) { v(math.floorMod(t.charAt(i) * 31 + i, dim)) += 3.0f; i += 1 }
      v // deliberately not normalized
    }
  }
}

/** The embedder slot: swapping implementations must not change the
  * pipeline's plan — only the vectors. (Vector parity for the hashing
  * impl is covered in HybridSearchSpec; this proves the ONNX slot is a
  * true drop-in at the plan level even with no weights present.) */
class OnnxEmbedderSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def docs = Seq(
    (1L, "spark plans joins and aggregates over a distributed corpus of legal documents. " * 12),
    (2L, "another legal opinion text long enough to clear the minimum raw length filter easily. " * 12))
    .toDF("doc_id", "text")

  /** Operator-name sequence with expression ids and literals stripped. */
  private def shape(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.queryExecution.executedPlan.toString
      .linesIterator.map(_.dropWhile(!_.isLetter).takeWhile(_.isLetter).mkString)
      .filter(_.nonEmpty).toSeq

  test("fromConf reads model path and dim from the session conf") {
    spark.conf.set("graft.embed.model.path", "/tmp/nonexistent-model.onnx")
    spark.conf.set("graft.embed.model.dim", "256")
    val e = OnnxEmbedder.fromConf(spark)
    assert(e.dim == 256)
    spark.conf.unset("graft.embed.model.path")
    spark.conf.unset("graft.embed.model.dim")
  }

  test("missing model fails loudly at first use, not at plan time") {
    val e = new OnnxEmbedder("/tmp/nonexistent-model.onnx")
    val ex = intercept[IllegalStateException](e.embed("text"))
    assert(ex.getMessage.contains("no model at"))
  }

  test("fake runtime proves the slot end-to-end: batches, dims, L2 norms, full pipeline") {
    FakeOnnxRuntime.reset()
    // a "model file" must exist — the embedder validates the path before
    // asking the runtime for a session
    val model = java.nio.file.Files.createTempFile("fake-bge", ".onnx")
    java.nio.file.Files.write(model, "not real weights".getBytes)
    spark.conf.set("graft.embed.model.path", model.toString)
    try {
      val e = OnnxEmbedder.fromConf(spark, runtime = new FakeOnnxRuntime)
      // direct batch: shapes + normalization (fake emits UN-normalized)
      val vecs = e.embedBatch(Seq("alpha text", "beta text", "alpha text"))
      assert(vecs.size == 3 && vecs.forall(_.length == 384))
      vecs.foreach { v =>
        val n = math.sqrt(v.map(x => x.toDouble * x).sum)
        assert(math.abs(n - 1.0) < 1e-5, s"embedder must L2-normalize, got $n")
      }
      assert(vecs(0).toSeq == vecs(2).toSeq, "deterministic per text")
      assert(vecs(0).toSeq != vecs(1).toSeq)

      // whole pipeline executes through the ONNX slot (minus weights):
      // mapPartitions batches of <= 16 reach the session
      val out = ChunkPipeline.chunkPoints(spark, docs, embedder = e)
      assert(out.count() > 0)
      val sizes = FakeOnnxRuntime.batchSizes()
      assert(sizes.nonEmpty && sizes.forall(s => s >= 1 && s <= 16),
        s"batch sizes through the slot: $sizes")
      // query path applies the BGE instruction prefix
      assert(e.embedQuery("q").length == 384)
      assert(FakeOnnxRuntime.sawQueryPrefix())
    } finally {
      spark.conf.unset("graft.embed.model.path")
      java.nio.file.Files.deleteIfExists(model)
    }
  }

  test("Embedders.detect selection order: configured fake runtime + " +
      "model → ONNX live; broken config fails loudly; bare env falls " +
      "back to hashing with the precise reason") {
    // 3) bare environment (no conf, no ORT jar in this build): hashing
    // fallback naming the failed probe
    val (fallback, why) = Embedders.detect(spark)
    assert(fallback eq HashingEmbedder.default)
    assert(why.contains("no ONNX runtime jar on the classpath"), why)

    // 1) configured runtime class + model file: the ONNX slot goes live
    // and vectors flow through the injected session — the self-heal
    // path a production jar takes with zero code change
    FakeOnnxRuntime.reset()
    val model = java.nio.file.Files.createTempFile("fake-bge", ".onnx")
    java.nio.file.Files.write(model, "not real weights".getBytes)
    spark.conf.set(Embedders.RuntimeClassKey,
      classOf[FakeOnnxRuntime].getName)
    spark.conf.set("graft.embed.model.path", model.toString)
    try {
      val (live, reason) = Embedders.detect(spark)
      assert(reason.startsWith("onnx (configured)"), reason)
      assert(live.isInstanceOf[OnnxEmbedder])
      val vecs = live.embedBatch(Seq("alpha", "beta"))
      assert(vecs.size == 2 && vecs.forall(_.length == 384))
      assert(FakeOnnxRuntime.batchSizes().nonEmpty,
        "vectors must flow through the configured runtime")

      // configured but the MODEL is missing: loud, with the path named
      spark.conf.set("graft.embed.model.path", "/tmp/nope-model.onnx")
      val exm = intercept[IllegalStateException](Embedders.detect(spark))
      assert(exm.getMessage.contains("/tmp/nope-model.onnx"), exm.getMessage)

      // configured but the CLASS is unloadable: loud, with the recipe
      spark.conf.set(Embedders.RuntimeClassKey, "com.example.NoSuchRuntime")
      val exc = intercept[IllegalStateException](Embedders.detect(spark))
      assert(exc.getMessage.contains("could not be loaded") &&
        exc.getMessage.contains("classpath"), exc.getMessage)
    } finally {
      spark.conf.unset(Embedders.RuntimeClassKey)
      spark.conf.unset("graft.embed.model.path")
      java.nio.file.Files.deleteIfExists(model)
    }
  }

  test("pipeline plan shape is identical under HashingEmbedder and OnnxEmbedder") {
    val withHashing = ChunkPipeline.chunkPoints(spark, docs,
      embedder = HashingEmbedder.default)
    // plan-time only — the ONNX session would be created inside the task
    val withOnnx = ChunkPipeline.chunkPoints(spark, docs,
      embedder = new OnnxEmbedder("/tmp/nonexistent-model.onnx"))
    assert(shape(withOnnx) == shape(withHashing),
      "swapping the embedder implementation must not alter the plan")
    // and the hashing plan actually executes
    assert(withHashing.count() > 0)
  }
}
