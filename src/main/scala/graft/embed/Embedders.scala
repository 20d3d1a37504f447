package graft.embed

import org.apache.spark.sql.SparkSession

/** Embedder AUTO-DETECTION (r11 stretch ask): the production embedder
  * is env-blocked in this build (no ONNX runtime jar, no weights — see
  * [[OnnxEmbedder]]), so the selection seam must SELF-HEAL the moment a
  * runtime appears on the classpath, instead of requiring a code
  * change. Selection order, most explicit first:
  *
  *  1. `graft.embed.runtime.class` set in the session conf → load that
  *     class reflectively (must implement [[OnnxRuntime]] with a no-arg
  *     constructor) and serve [[OnnxEmbedder.fromConf]] through it.
  *     A SET-BUT-BROKEN config FAILS LOUDLY — the operator asked for
  *     ONNX vectors, and silently hashing instead would poison every
  *     embedding in the index (the q202-class corruption no audit
  *     downstream would attribute). The failure message carries the
  *     exact remediation (jar on classpath / class name / model path).
  *  2. `ai.onnxruntime.OrtEnvironment` present on the classpath AND the
  *     conventional bridge class `graft.embed.OrtBridgeRuntime` loadable
  *     (a production jar ships both together) AND the configured model
  *     file present → auto-detected ONNX, no config needed.
  *  3. Otherwise → [[HashingEmbedder.default]], with the PRECISE reason
  *     (which probe failed) in the returned message — logged by
  *     [[graft.GraftSession.build]] so every session states which
  *     embedder is live.
  */
object Embedders {

  /** Conf key naming an [[OnnxRuntime]] implementation to load. */
  val RuntimeClassKey = "graft.embed.runtime.class"

  /** The conventional bridge an ONNX-enabled production jar provides
    * next to the ORT jar itself (a ~10-line OrtEnvironment wrapper). */
  val BridgeClass = "graft.embed.OrtBridgeRuntime"

  private val OrtProbe = "ai.onnxruntime.OrtEnvironment"

  private def classPresent(name: String): Boolean =
    try { Class.forName(name); true }
    catch { case _: Throwable => false }

  private def loadRuntime(name: String): OnnxRuntime =
    try Class.forName(name).getDeclaredConstructor()
      .newInstance().asInstanceOf[OnnxRuntime]
    catch {
      case e: Throwable =>
        throw new IllegalStateException(
          s"$RuntimeClassKey='$name' is configured but the class could " +
            "not be loaded as an OnnxRuntime (no-arg constructor, " +
            "implements graft.embed.OnnxRuntime). Put the jar providing " +
            "it (plus the ONNX Runtime jar) on the executor classpath, " +
            "or unset the key to fall back to HashingEmbedder. " +
            s"Cause: ${e.getClass.getSimpleName}: ${e.getMessage}", e)
    }

  /** The selection decision plus a human-readable reason — the spec's
    * and the session log's shared surface. */
  def detect(spark: SparkSession): (Embedder, String) = {
    val configured = spark.conf.get(RuntimeClassKey, "")
    val modelPath = spark.conf.get("graft.embed.model.path",
      "/models/bge-small-en-v1.5.onnx")
    if (configured.nonEmpty) {
      val rt = loadRuntime(configured)
      if (!new java.io.File(modelPath).isFile)
        throw new IllegalStateException(
          s"$RuntimeClassKey='$configured' is configured but no model " +
            s"file exists at graft.embed.model.path='$modelPath'. Export " +
            "an ONNX encoder (e.g. BAAI/bge-small-en-v1.5) to that path.")
      (OnnxEmbedder.fromConf(spark, rt),
        s"onnx (configured): runtime=$configured model=$modelPath")
    } else if (classPresent(OrtProbe) && classPresent(BridgeClass) &&
        new java.io.File(modelPath).isFile) {
      (OnnxEmbedder.fromConf(spark, loadRuntime(BridgeClass)),
        s"onnx (auto-detected): runtime=$BridgeClass model=$modelPath")
    } else {
      val why =
        if (!classPresent(OrtProbe))
          s"no ONNX runtime jar on the classpath ($OrtProbe absent)"
        else if (!classPresent(BridgeClass))
          s"ONNX runtime jar present but no bridge ($BridgeClass absent " +
            s"and $RuntimeClassKey unset)"
        else s"no model file at '$modelPath'"
      (HashingEmbedder.default, s"hashing (deterministic fallback): $why")
    }
  }

  /** [[detect]] with the decision logged — the entrypoint surface. */
  def select(spark: SparkSession): Embedder = {
    val (e, reason) = detect(spark)
    org.slf4j.LoggerFactory.getLogger("graft.embed")
      .info(s"embedder live: $reason")
    e
  }
}
