package graft.text

import scala.collection.mutable.ArrayBuffer

/** C1 — recursive character text splitter.
  *
  * Re-implementation (from published algorithm descriptions and observed
  * behavior) of the recursive-split strategy the reference configures at
  * `/root/reference/data-ingestion/data_extraction.py:47-52`
  * (`chunk_size=1536, chunk_overlap=300, length=chars`, separators
  * `["\n\n", ". ", "? ", "! ", "\n", " ", ""]`):
  *
  *  1. Pick the first separator in the hierarchy that occurs in the text
  *     (the empty separator — per-character split — is the fallback).
  *  2. Split on it, keeping each separator attached to the *start* of the
  *     following piece (so no characters are lost).
  *  3. Pieces shorter than `chunkSize` are greedily merged into chunks of
  *     at most `chunkSize` chars; when a chunk closes, pieces are re-used
  *     from its tail until at most `chunkOverlap` chars remain → overlap.
  *  4. Pieces still longer than `chunkSize` recurse with the remaining
  *     separators.
  *
  * Pure Scala; exposed to Spark as an array-returning UDF + `posexplode`
  * (a Catalyst `Generator` comes free that way — SURVEY.md §2.9).
  */
final class RecursiveSplitter(
    val chunkSize: Int = 1536,
    val chunkOverlap: Int = 300,
    val separators: Seq[String] = Seq("\n\n", ". ", "? ", "! ", "\n", " ", "")) {

  require(chunkOverlap < chunkSize, "overlap must be < chunk size")

  /** Split retaining the separator at the start of the following piece. */
  private def splitKeepSeparator(text: String, sep: String): Seq[String] = {
    if (sep.isEmpty) return text.map(_.toString)
    val pieces = ArrayBuffer.empty[String]
    var start = 0
    var idx = text.indexOf(sep)
    var first = true
    while (idx >= 0) {
      val piece = if (first) text.substring(start, idx)
                  else sep + text.substring(start, idx)
      if (piece.nonEmpty) pieces += piece
      first = false
      start = idx + sep.length
      idx = text.indexOf(sep, start)
    }
    val tail = if (first) text.substring(start) else sep + text.substring(start)
    if (tail.nonEmpty) pieces += tail
    pieces.toSeq
  }

  /** Greedy merge of sub-chunk pieces into ≤ chunkSize chunks with
    * ≥ chunkOverlap carried between consecutive chunks. */
  private def mergeSplits(splits: Seq[String]): Seq[String] = {
    val docs = ArrayBuffer.empty[String]
    var current = scala.collection.immutable.Queue.empty[String]
    var total = 0
    def emit(): Unit = {
      val doc = current.mkString("").trim
      if (doc.nonEmpty) docs += doc
    }
    for (d <- splits) {
      val len = d.length
      if (total + len > chunkSize) {
        if (current.nonEmpty) {
          emit()
          // drop from the front until within overlap budget
          while (total > chunkOverlap || (total + len > chunkSize && total > 0)) {
            total -= current.head.length
            current = current.tail
          }
        }
      }
      current = current.enqueue(d)
      total += len
    }
    if (current.nonEmpty) emit()
    docs.toSeq
  }

  private def splitRec(text: String, seps: Seq[String]): Seq[String] = {
    // first separator present in the text ("" always matches)
    var sep = seps.last
    var remaining: Seq[String] = Nil
    val it = seps.zipWithIndex.iterator
    var found = false
    while (it.hasNext && !found) {
      val (s, i) = it.next()
      if (s.isEmpty || text.contains(s)) {
        sep = s; remaining = seps.drop(i + 1); found = true
      }
    }
    val pieces = splitKeepSeparator(text, sep)
    val out = ArrayBuffer.empty[String]
    val good = ArrayBuffer.empty[String]
    for (p <- pieces) {
      if (p.length < chunkSize) good += p
      else {
        if (good.nonEmpty) { out ++= mergeSplits(good.toSeq); good.clear() }
        if (remaining.isEmpty) out += p
        else out ++= splitRec(p, remaining)
      }
    }
    if (good.nonEmpty) out ++= mergeSplits(good.toSeq)
    out.toSeq
  }

  def split(text: String): Seq[String] =
    if (text == null || text.isEmpty) Nil else splitRec(text, separators)
}

object RecursiveSplitter {
  /** Reference geometry: 1536 chars / 300 overlap (`config.yml:6-8`). */
  val default = new RecursiveSplitter()
}
