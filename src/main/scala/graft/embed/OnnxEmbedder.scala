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
  * The runtime itself sits behind [[OnnxRuntime]]: this build ships
  * neither model weights nor an ONNX runtime jar, so the default
  * [[OnnxRuntime.Unavailable]] validates the configured path and then
  * fails loudly exactly where a production build would create the
  * inference session. A production swap-in is a jar + model file + a
  * ~10-line [[OnnxRuntime]] impl wrapping `OrtEnvironment`; everything
  * else — config plumbing, per-executor lazy init, batching, the L2
  * normalization the reference applies (`normalize_embeddings=True`) —
  * already runs, demonstrated end-to-end by the spec's fake runtime.
  */
final class OnnxEmbedder(
    modelPath: String,
    val dim: Int = 384,
    val maxSeqLen: Int = 512,
    runtime: OnnxRuntime = OnnxRuntime.Unavailable) extends Embedder {

  /** BGE query instruction (reference applies it to queries only,
    * `chatbot/app.py:96-99`). */
  override val queryPrefix: String =
    "Represent this query for searching relevant legal passages: "

  /** Per-executor lazy init: serialized closed-over config is just the
    * path/dims/runtime handle; the heavy session object is created on
    * first use on each executor and never shipped. */
  @transient private lazy val session: Seq[String] => Seq[Array[Float]] = {
    val f = new java.io.File(modelPath)
    if (!f.isFile)
      throw new IllegalStateException(
        s"OnnxEmbedder: no model at '$modelPath'. Provide an exported " +
          "ONNX encoder (e.g. BAAI/bge-small-en-v1.5) and run on a build " +
          "with the ONNX Runtime jar on the executor classpath.")
    runtime.createSession(modelPath, dim, maxSeqLen)
  }

  override def embedBatch(texts: Seq[String]): Seq[Array[Float]] = {
    val raw = session(texts)
    require(raw.size == texts.size,
      s"runtime returned ${raw.size} vectors for ${texts.size} texts")
    raw.map(l2Normalize)
  }

  def embed(text: String): Array[Float] = embedBatch(Seq(text)).head

  /** The reference encodes with `normalize_embeddings=True` — enforced
    * HERE so any runtime impl yields unit vectors (cosine ≡ dot). */
  private def l2Normalize(v: Array[Float]): Array[Float] = {
    require(v.length == dim, s"runtime produced ${v.length}-d vector, want $dim")
    var n = 0.0
    var i = 0
    while (i < v.length) { n += v(i).toDouble * v(i); i += 1 }
    if (n > 0) {
      val inv = (1.0 / math.sqrt(n)).toFloat
      i = 0
      while (i < v.length) { v(i) *= inv; i += 1 }
    }
    v
  }
}

/** The inference-runtime boundary: given a model path, produce the
  * batch-inference function. Serializable so an embedder can ship its
  * runtime HANDLE to executors (the session itself is created lazily
  * per executor, never serialized). */
trait OnnxRuntime extends Serializable {
  def createSession(modelPath: String, dim: Int, maxSeqLen: Int): Seq[String] => Seq[Array[Float]]
}

object OnnxRuntime {
  /** The honest default for this build: no ONNX runtime jar is bundled,
    * so session creation fails loudly with the exact production recipe. */
  object Unavailable extends OnnxRuntime {
    override def createSession(modelPath: String, dim: Int,
        maxSeqLen: Int): Seq[String] => Seq[Array[Float]] =
      throw new UnsupportedOperationException(
        "OnnxEmbedder: this build bundles no ONNX runtime; the inference " +
          "session would be created here (OrtEnvironment → createSession " +
          s"($modelPath) → tokenizer). Use HashingEmbedder for deterministic " +
          "runs in this environment.")
  }
}

object OnnxEmbedder {
  /** Config-driven construction: `graft.embed.model.path` (plus optional
    * `.dim`) from the session conf, mirroring the reference's
    * `config.yml` model block. */
  def fromConf(spark: org.apache.spark.sql.SparkSession,
      runtime: OnnxRuntime = OnnxRuntime.Unavailable): OnnxEmbedder =
    new OnnxEmbedder(
      modelPath = spark.conf.get("graft.embed.model.path", "/models/bge-small-en-v1.5.onnx"),
      dim = spark.conf.get("graft.embed.model.dim", "384").toInt,
      runtime = runtime)
}
