package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines: language ID,
  * quality scoring, token counting, document fingerprinting.
  *
  * All pure `functions._` expressions (codegen'd, prunable) except the
  * langId scorer's stopword tables, which are literal arrays — no UDFs,
  * no shuffles; every operator is a narrow per-row map.
  */
object TextAnalysis {

  // Minimal per-language stopword lists (public common function words).
  private val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "a", "in", "is", "that", "for", "it", "with", "as", "was", "on", "be"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "un", "los", "se", "del", "las", "por", "con", "una", "es"),
    "fr" -> Seq("le", "la", "de", "et", "les", "des", "un", "une", "du", "en", "est", "que", "pour", "dans", "qui"),
    "de" -> Seq("der", "die", "und", "das", "in", "von", "zu", "den", "mit", "ist", "des", "auf", "für", "dem", "nicht"))

  private def toks(textCol: Column): Column = split(lower(trim(textCol)), "\\s+")

  /** Stopword-hit count for one language over a token array. */
  def stopwordHits(textCol: Column, lang: String): Column =
    size(filter(toks(textCol), t => t.isin(stopwords(lang): _*)))

  /** Language-ID heuristic: argmax of per-language stopword-hit rates,
    * `und` when nothing matches. Deterministic tie-break by language
    * code order. */
  def langId(textCol: Column): Column = {
    val t = toks(textCol)
    val scores = stopwords.toSeq.sortBy(_._1).map { case (lang, words) =>
      (lang, size(filter(t, x => x.isin(words: _*))))
    }
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    scores.foldRight(lit("und")) { case ((lang, s), acc) =>
      when(s > 0 && s === best, lit(lang)).otherwise(acc)
    }
  }

  /** Quality-score struct: char length, word count, mean word length,
    * punctuation ratio, uppercase ratio, stopword ratio (en), and a
    * composite [0,1] quality heuristic. */
  def qualityScore(textCol: Column): Column = {
    val t = toks(textCol)
    val nChars = length(textCol)
    val nWords = when(length(trim(textCol)) === 0, 0).otherwise(size(t))
    val nPunct = length(textCol) - length(regexp_replace(textCol, "[\\p{Punct}]", ""))
    val nUpper = length(textCol) - length(regexp_replace(textCol, "[A-Z]", ""))
    val nStop = size(filter(t, x => x.isin(stopwords("en"): _*)))
    val meanWordLen = when(nWords > 0, (nChars - nWords + 1).cast("double") / nWords).otherwise(lit(0.0))
    val punctRatio = when(nChars > 0, nPunct.cast("double") / nChars).otherwise(lit(0.0))
    val upperRatio = when(nChars > 0, nUpper.cast("double") / nChars).otherwise(lit(0.0))
    val stopRatio = when(nWords > 0, nStop.cast("double") / nWords).otherwise(lit(0.0))
    // composite: long enough, not punctuation soup, some function words
    val composite =
      when(nWords < 5, lit(0.0)).otherwise(
        least(lit(1.0), nWords.cast("double") / 100.0) * (lit(1.0) - punctRatio) *
          (lit(0.5) + least(stopRatio * 2.0, lit(0.5))))
    struct(
      nChars.cast("long").as("n_chars"),
      nWords.cast("long").as("n_words"),
      meanWordLen.as("mean_word_len"),
      punctRatio.as("punct_ratio"),
      upperRatio.as("upper_ratio"),
      stopRatio.as("stopword_ratio"),
      composite.as("quality"))
  }

  /** Whitespace token count (fast path). */
  def tokenCountWhitespace(textCol: Column): Column =
    when(length(trim(textCol)) === 0, 0L)
      .otherwise(size(split(trim(textCol), "\\s+")).cast("long"))

  /** BPE-ish token count: word pieces + digits + punctuation as separate
    * tokens (a regex approximation of byte-pair tokenizers — the usual
    * "tokens ≈ 0.75 × words" accounting for budget estimation). */
  def tokenCountBpe(textCol: Column): Column =
    size(regexp_extract_all(textCol,
      lit("[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]"), lit(0))).cast("long")

  /** Document fingerprint: min xxhash64 over word 5-gram shingles
    * (a 1-hash MinHash — stable rolling-window content fingerprint,
    * robust to small edits at the tail). */
  def fingerprint(textCol: Column, k: Int = 5): Column = {
    val sh = Dedup.shingles(textCol, k)
    when(size(sh) > 0, array_min(transform(sh, s => xxhash64(s))))
      .otherwise(xxhash64(textCol))
  }
}
