package graft.embed

/** V1/V2 — the pipeline's pluggable embedding boundary.
  *
  * The reference embeds chunks with a sentence-transformer model loaded
  * once per process and invoked in batches of ≤16
  * (`/root/reference/data-ingestion/data_extraction.py:253-276`), and
  * prefixes *queries* (not documents) with an instruction string when the
  * model is a BGE variant (`chatbot/app.py:96-99,139`).
  *
  * In Spark the embedder runs inside `mapPartitions` with one lazily
  * initialized instance per executor; the trait keeps that boundary
  * swappable (deterministic hashing impl for tests/bench; an ONNX BGE
  * impl would slot in here on a real cluster without touching the plan).
  */
trait Embedder extends Serializable {
  def dim: Int
  def embed(text: String): Array[Float]
  /** Batch hook — impls with real batched inference override this. */
  def embedBatch(texts: Seq[String]): Seq[Array[Float]] = texts.map(embed)
  /** Query-side prefix (reference applies it only for BGE models). */
  def queryPrefix: String = ""
  def embedQuery(text: String): Array[Float] = embed(queryPrefix + text)
}

/** Deterministic hashed bag-of-ngrams embedder (pure JVM).
  *
  * Tokens + token 3-grams are hashed (FNV-1a, platform-stable) into
  * `dim` buckets with ±1 signs; the vector is L2-normalized so cosine ≡
  * dot product, matching the reference's cosine-distance collection
  * config (`qdrant_manager.py:24`). Same text ⇒ same vector on every JVM,
  * which keeps t1/t2/bench reproducible.
  */
final class HashingEmbedder(val dim: Int = 384) extends Embedder {

  override val queryPrefix: String =
    "Represent this query for searching relevant legal passages: "

  @inline private def fnv1a(s: String, seed: Int): Int = {
    var h = 0x811c9dc5 ^ seed
    var i = 0
    while (i < s.length) {
      h ^= s.charAt(i)
      h *= 0x01000193
      i += 1
    }
    h
  }

  def embed(text: String): Array[Float] = {
    val v = new Array[Float](dim)
    if (text != null && text.nonEmpty) {
      val tokens = graft.text.Bm25.tokenize(text)
      def add(feature: String): Unit = {
        val h = fnv1a(feature, 0)
        val bucket = math.floorMod(h, dim)
        val sign = if ((h >>> 31) == 0) 1.0f else -1.0f
        v(bucket) += sign
      }
      tokens.foreach(add)
      tokens.sliding(3).foreach(g => if (g.length == 3) add(g.mkString("")))
    }
    var norm = 0.0
    var i = 0
    while (i < dim) { norm += v(i).toDouble * v(i); i += 1 }
    if (norm > 0) {
      val inv = (1.0 / math.sqrt(norm)).toFloat
      i = 0
      while (i < dim) { v(i) *= inv; i += 1 }
    }
    v
  }
}

object HashingEmbedder {
  /** Reference vector geometry: 384-d (`config.yml:25`). */
  val default = new HashingEmbedder(384)
}
