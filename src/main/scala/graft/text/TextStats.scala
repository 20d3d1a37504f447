package graft.text

/** F8 `text_stats` — `{length, word_count, citation_count}`.
  * Word count follows Python `str.split()` semantics: split on whitespace
  * runs, ignoring leading/trailing whitespace; empty → 0.
  * (Reference: `/root/reference/data-ingestion/opinion_utills.py:174-178`.)
  */
object TextStats {
  final case class Stats(length: Long, wordCount: Long, citationCount: Long)

  def wordCount(s: String): Long = {
    if (s == null) return 0L
    val t = s.trim
    if (t.isEmpty) 0L else t.split("\\s+").length.toLong
  }

  def apply(cleaned: String, citationCount: Int): Stats = {
    val len = if (cleaned == null) 0L else cleaned.length.toLong
    Stats(len, wordCount(cleaned), citationCount.toLong)
  }
}
