package graft.embed

/** V1/V2 — the production embedder slot: a BGE-style transformer served
  * through ONNX Runtime, configured by model path.
  *
  * The reference loads `BAAI/bge-small-en-v1.5` once per process and
  * encodes in batches (`/root/reference/data-ingestion/
  * data_extraction.py:253-276,364-367`). The Spark-side contract this
  * class fills is already fixed by [[Embedder]] + `ChunkPipeline
  * .embedBatched`: one lazily-initialized instance per executor task,
  * batched `embedBatch` calls, L2-normalized `dim`-vector out — and the
  * PLAN is identical whichever implementation fills it (asserted by
  * `OnnxEmbedderSpec`), so dropping real weights in changes no query
  * shape, only the vectors.
  *
  * This build ships neither model weights nor an ONNX runtime jar (and
  * adding dependencies is out of scope for the sandbox), so the session
  * loader below is the honest boundary: it validates the configured
  * path, then fails loudly where a production build would create the
  * runtime session. Everything around it — config plumbing, batching,
  * serializable-lazy per-executor init — is the real shape.
  */
final class OnnxEmbedder(
    modelPath: String,
    val dim: Int = 384,
    val maxSeqLen: Int = 512) extends Embedder {

  /** BGE query instruction (reference applies it to queries only,
    * `chatbot/app.py:96-99`). */
  override val queryPrefix: String =
    "Represent this query for searching relevant legal passages: "

  /** Per-executor lazy init: serialized closed-over config is just the
    * path/dims; the heavy session object is created on first use on each
    * executor and never shipped. */
  @transient private lazy val session: Nothing = {
    val f = new java.io.File(modelPath)
    if (!f.isFile)
      throw new IllegalStateException(
        s"OnnxEmbedder: no model at '$modelPath'. Provide an exported " +
          "ONNX encoder (e.g. BAAI/bge-small-en-v1.5) and run on a build " +
          "with the ONNX Runtime jar on the executor classpath.")
    throw new UnsupportedOperationException(
      "OnnxEmbedder: this build bundles no ONNX runtime; the inference " +
        "session would be created here (OrtEnvironment → createSession " +
        s"($modelPath) → tokenizer). Use HashingEmbedder for deterministic " +
        "runs in this environment.")
  }

  override def embedBatch(texts: Seq[String]): Seq[Array[Float]] = session

  def embed(text: String): Array[Float] = embedBatch(Seq(text)).head
}

object OnnxEmbedder {
  /** Config-driven construction: `graft.embed.model.path` (plus optional
    * `.dim`) from the session conf, mirroring the reference's
    * `config.yml` model block. */
  def fromConf(spark: org.apache.spark.sql.SparkSession): OnnxEmbedder =
    new OnnxEmbedder(
      modelPath = spark.conf.get("graft.embed.model.path", "/models/bge-small-en-v1.5.onnx"),
      dim = spark.conf.get("graft.embed.model.dim", "384").toInt)
}
