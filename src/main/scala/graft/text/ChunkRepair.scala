package graft.text

import java.util.regex.Pattern
import scala.collection.mutable.ArrayBuffer

/** C2-C5 — sentence-boundary chunk repair.
  *
  * Semantics re-derived from
  * `/root/reference/data-ingestion/opinion_utills.py:182-317`
  * (`fix_chunk_overlaps` / `fix_chunk_start` / `fix_chunk_end` /
  * `starts_at_sentence_boundary`), including the near-dead lowercase
  * connective checks (SURVEY.md Q4) which we replicate as-written for
  * behavioral parity.
  */
object ChunkRepair {

  private val sentenceThenCap = Pattern.compile("""[.!?]\s+[A-Z]""")
  private val paragraphCap    = Pattern.compile("""\n\s*[A-Z]""")
  private val startsCap       = Pattern.compile("""^[A-Z]""")
  private val sentenceEnd     = Pattern.compile("""[.!?]""")

  private val badStartPunct  = Seq(".", ",", ";", ":")
  private val badConnectives = Seq("moreover,", "however,", "furthermore,", "additionally,")
  private val goodBrackets   = Seq("(", "[", "\"", "'")
  private val goodArticles   = Seq("a ", "an ", "the ", "and ", "or ", "but ")

  /** C5 — heuristic "does this chunk start at a sentence boundary". */
  def startsAtSentenceBoundary(text: String): Boolean = {
    if (text == null || text.isEmpty) return false
    if (badStartPunct.exists(text.startsWith)) return false
    if (badConnectives.exists(text.startsWith)) return false
    if (Character.isUpperCase(text.charAt(0))) return true
    if (goodBrackets.exists(text.startsWith)) return true
    if (goodArticles.exists(text.startsWith)) return true
    false
  }

  /** C3 — advance a mid-sentence chunk start to the next boundary capital. */
  def fixChunkStart(chunk: String): String = {
    if (chunk == null || chunk.isEmpty) return chunk
    if (startsAtSentenceBoundary(chunk)) return chunk
    for (p <- Seq(sentenceThenCap, paragraphCap, startsCap)) {
      val m = p.matcher(chunk)
      if (m.find()) return chunk.substring(m.end() - 1).trim
    }
    chunk
  }

  /** C4 — cut a chunk back to its last complete sentence; fall back to a
    * `;`/`:` break if it lies in the final 20%. */
  def fixChunkEnd(chunk0: String): String = {
    if (chunk0 == null || chunk0.isEmpty) return chunk0
    val chunk = chunk0.replaceAll("\\s+$", "") // rstrip
    if (chunk.endsWith(".") || chunk.endsWith("!") || chunk.endsWith("?")) return chunk
    val m = sentenceEnd.matcher(chunk)
    var lastEnd = -1
    while (m.find()) lastEnd = m.end()
    if (lastEnd >= 0) return chunk.substring(0, lastEnd).replaceAll("\\s+$", "")
    for (punct <- Seq(';', ':')) {
      val idx = chunk.lastIndexOf(punct)
      if (idx > chunk.length * 0.8) return chunk.substring(0, idx + 1).replaceAll("\\s+$", "")
    }
    chunk
  }

  /** C2 — full repair pass: trim, drop tiny (<50), fix start, fix end,
    * keep only chunks ≥ minChunkSizeChars (reference default 400). */
  def fixChunkOverlaps(chunks: Seq[String], minChunkSizeChars: Int = 400): Seq[String] = {
    if (chunks == null || chunks.isEmpty) return Seq.empty
    val out = ArrayBuffer.empty[String]
    for (c0 <- chunks) {
      val c = if (c0 == null) "" else c0.trim
      if (c.nonEmpty && c.length >= 50) {
        val fixed = fixChunkEnd(fixChunkStart(c))
        if (fixed != null && fixed.trim.length >= minChunkSizeChars) out += fixed
      }
    }
    out.toSeq
  }

  /** C6 — the full per-document chunking driver (split → repair → final
    * trim + min-size filter), as composed at
    * `/root/reference/data-ingestion/data_extraction.py:225-250`. */
  def chunkDocument(
      text: String,
      splitter: RecursiveSplitter = RecursiveSplitter.default,
      minChunkSizeChars: Int = 400): Seq[String] = {
    if (text == null || text.trim.length < 50) return Seq.empty
    fixChunkOverlaps(splitter.split(text), minChunkSizeChars)
      .map(_.trim)
      .filter(_.length >= minChunkSizeChars)
  }
}
