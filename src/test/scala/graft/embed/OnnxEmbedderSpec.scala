package graft.embed

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase
import graft.ingest.ChunkPipeline

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
