package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-curation operators a large-scale training-data pipeline needs
  * beyond dedup/similarity: per-domain caps, PII redaction, repetition
  * quality (Gopher-style), eval-set contamination, TF-IDF keywords, and
  * context-window sequence packing.
  *
  * Every operator is expressed so a second engine can re-derive it from
  * the same parquet (the DuckDB oracle in SparkEntry does exactly that):
  * regexes stay inside the RE2 ∩ java.util.regex common subset, ratios
  * are rounded to 6 decimals before any comparison, and all ordering is
  * tie-broken on ids.
  */
object Curation {

  /** Tokens as non-whitespace runs — `regexp_extract_all` keeps the
    * whole expression codegen-compatible (no interpreted HOF chain). */
  def tokens(text: Column): Column = regexp_extract_all(text, lit("\\S+"), lit(0))

  // -------------------------------------------------------------------
  // Per-domain cap (CommonCrawl-style): no source may contribute more
  // than `cap` documents; keep the largest docs first. Executed with the
  // TopKPerKey custom plan (bounded per-key heaps + spill fallback), not
  // a row_number window: the window's WindowExec SORTS every partition's
  // full row set to keep `cap` rows per key — at 100 TB that's a sort of
  // the corpus. The heap plan shuffles the same (source) key but retains
  // only cap rows per source in memory; per-source partitions are
  // bounded by natural domain skew (salt a mega-domain if one appears;
  // caps make the output bounded regardless).
  // -------------------------------------------------------------------
  def domainCap(docs: DataFrame, sourceCol: String, idCol: String,
      sizeCol: String, cap: Int): DataFrame =
    graft.plans.TopK.perKey(docs, Seq(sourceCol),
      Seq((sizeCol, false), (idCol, true)), cap)

  // -------------------------------------------------------------------
  // PII redaction. Patterns deliberately sit in the RE2 ∩ Java subset
  // (no lookarounds) so any engine audits the same result. SSN first:
  // the phone pattern's \d{3}[-.]\d{3} prefix would otherwise eat it.
  // -------------------------------------------------------------------
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val SsnRe = "\\b\\d{3}-\\d{2}-\\d{4}\\b"
  val PhoneRe = "\\b\\d{3}[-.]\\d{3}[-.]\\d{4}\\b"

  /** Redacted text plus per-category match counts. Each category is
    * counted on the text state its replacement actually sees (emails on
    * the original, SSNs after email redaction, phones after SSN
    * redaction), so counts always equal the number of substitutions made
    * — a pre-existing literal `[PHONE]` in the source can't inflate
    * `phones_found`, and the SSN pattern can't double-count as a phone. */
  def piiRedact(df: DataFrame, textCol: String): DataFrame = {
    val t = col(textCol)
    val afterEmail = regexp_replace(t, EmailRe, "[EMAIL]")
    val afterSsn = regexp_replace(afterEmail, SsnRe, "[SSN]")
    df.withColumn("emails_found", size(regexp_extract_all(t, lit(EmailRe), lit(0))))
      .withColumn("ssns_found", size(regexp_extract_all(afterEmail, lit(SsnRe), lit(0))))
      .withColumn("phones_found", size(regexp_extract_all(afterSsn, lit(PhoneRe), lit(0))))
      .withColumn("redacted", regexp_replace(afterSsn, PhoneRe, "[PHONE]"))
  }

  // -------------------------------------------------------------------
  // Repetition / quality signals (the Gopher-rules family): duplicate-
  // line fraction, symbol-to-char ratio, mean word length. One narrow
  // projection per row — no shuffle, scales embarrassingly.
  // -------------------------------------------------------------------

  final case class RepStats(n_words: Int, mean_word_len: Double,
      dup_line_frac: Double, symbol_ratio: Double)

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** All four signals in one compiled pass over the text. A single
    * scalar UDF, not `filter`/`array_distinct` HOF chains: higher-order
    * functions evaluate interpreted per element and never enter
    * whole-stage codegen (the repo-wide rule — see Dedup.simHash).
    * Char classes mirror the java-regex semantics the previous
    * column-expression form used (`\s`, `[A-Za-z0-9]`), so the DuckDB
    * oracle is unchanged. */
  private val repStatsUdf = udf { text: String =>
    val t = if (text == null) "" else text
    def isWs(c: Char): Boolean = // java regex \s
      c == ' ' || c == '\t' || c == '\n' || c == 11.toChar || c == '\f' || c == '\r'
    var nWords = 0; var nonWs = 0; var symbols = 0
    var i = 0; var inWord = false
    while (i < t.length) {
      val c = t.charAt(i)
      if (isWs(c)) inWord = false
      else {
        if (!inWord) { nWords += 1; inWord = true }
        nonWs += 1
        val alnum = (c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z') ||
          (c >= '0' && c <= '9')
        if (!alnum) symbols += 1
      }
      i += 1
    }
    // lines: split on \n, keep lines with any non-space char (the
    // space-only-trim semantics of SQL trim), distinct over raw strings
    var nLines = 0
    val seen = new java.util.HashSet[String]()
    var start = 0
    while (start <= t.length) {
      val nl = t.indexOf('\n', start)
      val end = if (nl < 0) t.length else nl
      val line = t.substring(start, end)
      var hasNonSpace = false
      var j = 0
      while (j < line.length && !hasNonSpace) {
        if (line.charAt(j) != ' ') hasNonSpace = true; j += 1
      }
      if (hasNonSpace) { nLines += 1; seen.add(line) }
      start = end + 1
      if (nl < 0) start = t.length + 1
    }
    RepStats(
      n_words = nWords,
      mean_word_len = if (nWords > 0) round6(nonWs.toDouble / nWords) else 0.0,
      dup_line_frac = if (nLines > 0) round6(1.0 - seen.size.toDouble / nLines) else 0.0,
      symbol_ratio = if (t.nonEmpty) round6(symbols.toDouble / t.length) else 0.0)
  }

  def repetitionQuality(df: DataFrame, textCol: String,
      idCol: String = "doc_id"): DataFrame =
    df.select(col(idCol), repStatsUdf(col(textCol)).as("s"))
      .select(col(idCol), col("s.n_words").as("n_words"),
        col("s.mean_word_len").as("mean_word_len"),
        col("s.dup_line_frac").as("dup_line_frac"),
        col("s.symbol_ratio").as("symbol_ratio"))

  // -------------------------------------------------------------------
  // URL canonicalization (the CommonCrawl re-crawl dedup shape): crawls
  // of the same page arrive under cosmetically different URLs — case-
  // shifted hosts, default ports, tracking params, trailing slashes,
  // fragments. Canonicalize, then keep the latest crawl per canonical
  // URL. The whole normalization is a regexp_replace/extract chain in
  // the RE2 ∩ Java subset (no lookarounds), so it stays codegen'd in
  // Spark AND byte-identically re-derivable by the oracle; the dedup
  // shuffles once, on the canonical-url key.
  // -------------------------------------------------------------------
  private val TrackingParams = "(utm_[a-z]+|fbclid|gclid)"

  /** Canonical form of an http(s) URL column:
    * fragment stripped → host lowercased, default :80/:443 dropped →
    * tracking params removed → trailing slash trimmed. Non-URL strings
    * pass through the host regexes unchanged (extract misses → empty
    * host part + original rest).
    *
    * Each tracking param is removed together with ITS OWN leading
    * delimiter — the `[?&]` anchor means a tracking name appearing as a
    * substring of a longer param ("?xutm_source=1") is untouched, and a
    * run of consecutive tracking params ("?utm_source=a&utm_medium=b")
    * disappears in one pass because every member carries its own
    * delimiter. When the removed run consumed the '?' itself, the first
    * surviving '&' is promoted back to '?' (guarded on the original
    * rest having had a query, so a raw '&' in a query-less path is
    * never rewritten). */
  def canonicalizeUrl(u: Column): Column = {
    val noFrag = regexp_replace(u, "#.*", "")
    val host = regexp_replace(
      lower(regexp_extract(noFrag, "^(https?://[^/?]+)", 1)),
      ":(80|443)$", "")
    val rest = regexp_replace(noFrag, "^https?://[^/?]+", "")
    val stripped = regexp_replace(rest, "[?&]" + TrackingParams + "=[^&#]*", "")
    val noParams = when(instr(rest, "?") > 0 && instr(stripped, "?") === 0,
      regexp_replace(stripped, "^([^&]*)&", "$1?")).otherwise(stripped)
    val noSlash = regexp_replace(noParams, "/$", "")
    concat(host, noSlash)
  }

  /** Latest crawl per canonical URL: canonicalize, then argmax by
    * (tsCol desc, idCol asc) within each canonical key — one shuffle on
    * the canonical-url hash. Output keeps every input column plus
    * `canonical_url`. */
  def latestByCanonicalUrl(crawls: DataFrame, urlCol: String, tsCol: String,
      idCol: String): DataFrame = {
    val w = Window.partitionBy("canonical_url")
      .orderBy(col(tsCol).desc, col(idCol).asc)
    crawls.withColumn("canonical_url", canonicalizeUrl(col(urlCol)))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
  }

  // -------------------------------------------------------------------
  // Domain blocklist filtering with dot-boundary suffix matching: a
  // blocklist entry "site.com" must block "a.cdn.site.com" but NOT
  // "evilsite.com" — so matching is on the set of dot-suffixes of the
  // host, never substring LIKE (which both over- and under-matches and
  // can't use a join). Each host explodes into ≤ label-count suffixes
  // ("a.b.com" → a.b.com, b.com, com), the blocklist broadcasts (block
  // tables are small by nature), and blocked ids come back as one
  // ids-only anti-join. The corpus never shuffles.
  // -------------------------------------------------------------------

  /** All dot-boundary suffixes of a host column (by name) as an array. */
  def hostSuffixes(hostCol: String): Column =
    expr(s"transform(sequence(1, size(split(`$hostCol`, '[.]'))), " +
      s"i -> array_join(slice(split(`$hostCol`, '[.]'), i, 1000), '.'))")

  /** Rows whose host matches NO blocklist entry at a dot boundary.
    * `blocklist` is a one-column frame of blocked suffixes. */
  def blocklistFilter(docs: DataFrame, idCol: String, hostCol: String,
      blocklist: DataFrame, blockHostCol: String): DataFrame = {
    val blockedIds = docs
      .select(col(idCol), explode(hostSuffixes(hostCol)).as("__sfx"))
      .join(broadcast(blocklist.select(col(blockHostCol).as("__sfx"))),
        Seq("__sfx"), "left_semi")
      .select(idCol).distinct()
    docs.join(blockedIds, Seq(idCol), "left_anti")
  }

  // -------------------------------------------------------------------
  // Linear quality classifier (fastText-filter shape): a trained
  // model reduced to per-feature weights, applied as one narrow
  // projection. Weights and features are integers and the score is the
  // raw logit — sigmoid is monotone, so "p(keep) ≥ τ" is exactly
  // "logit ≥ ln(τ/(1-τ))" and the integer comparison is bit-exact on
  // every engine (no libm exp in the pipeline at all). At 100 TB this
  // is the cheapest possible classifier inference: no shuffle, no UDF,
  // all four feature extractions codegen'd into the scan projection.
  // -------------------------------------------------------------------
  final case class QualityWeights(words: Long, chars: Long, exclaim: Long,
      digits: Long, bias: Long)

  /** Per-doc integer feature vector and logit. Features: whitespace-run
    * word count, char count, '!' count, digit count — the cheap
    * lexical-quality family (Gopher/C4 use the same signals). */
  def linearQualityScore(docs: DataFrame, idCol: String, textCol: String,
      w: QualityWeights): DataFrame = {
    val t = col(textCol)
    docs.select(col(idCol),
        size(tokens(t)).cast("long").as("n_words"),
        length(t).cast("long").as("n_chars"),
        size(regexp_extract_all(t, lit("!"), lit(0))).cast("long").as("n_exclaim"),
        size(regexp_extract_all(t, lit("[0-9]"), lit(0))).cast("long").as("n_digits"))
      .withColumn("logit",
        lit(w.words) * col("n_words") + lit(w.chars) * col("n_chars") +
          lit(w.exclaim) * col("n_exclaim") + lit(w.digits) * col("n_digits") +
          lit(w.bias))
  }

  /** Keep docs whose logit clears the decision threshold. */
  def linearQualityFilter(docs: DataFrame, idCol: String, textCol: String,
      w: QualityWeights, threshold: Long): DataFrame =
    linearQualityScore(docs, idCol, textCol, w)
      .filter(col("logit") >= threshold)

  /** TRAIN the linear quality gate — distributed batch perceptron in
    * EXACT integers (the fastText-filter story: fit the gate on labeled
    * seed documents instead of hand-tuning [[QualityWeights]]): labels
    * are ±1, features the same integer (words, chars, '!', digits,
    * bias-1) vector as [[linearQualityScore]], and each unrolled
    * iteration adds Σ y·x over the rows the CURRENT weights misclassify
    * (y·(w·x) ≤ 0, zero-margin counts as wrong so iteration 1 moves off
    * the zero vector) — all-integer updates, so both engines replay
    * every step bit-for-bit (the k-means/PageRank unrolled-iteration
    * discipline, q219).
    *
    * Scale shape: the feature table is extracted once
    * (localCheckpoint) and each iteration is ONE map-side-combinable
    * aggregate — six longs cross the exchange per iteration, the
    * driver holds five weights; iterations are a constant, never
    * per-row. Returns the weight HISTORY: one row per iteration with
    * the weights AFTER its update and `n_wrong`, the misclassified
    * count under the PRE-update weights (a training curve the caller
    * can gate on). */
  def perceptronTrain(docs: DataFrame, labelCol: String, textCol: String,
      iters: Int = 3): DataFrame = {
    require(iters >= 1, s"iters must be positive, got $iters")
    val spark = docs.sparkSession
    import spark.implicits._
    val t = col(textCol)
    val feats = docs.select(
        col(labelCol).cast("long").as("y"),
        size(tokens(t)).cast("long").as("fw"),
        length(t).cast("long").as("fc"),
        size(regexp_extract_all(t, lit("!"), lit(0))).cast("long").as("fe"),
        size(regexp_extract_all(t, lit("[0-9]"), lit(0))).cast("long").as("fd"))
      .localCheckpoint()
    var w = Array(0L, 0L, 0L, 0L, 0L) // words, chars, exclaim, digits, bias
    val hist = scala.collection.mutable.ArrayBuffer
      .empty[(Long, Long, Long, Long, Long, Long, Long)]
    for (it <- 1 to iters) {
      val margin = col("y") * (lit(w(0)) * col("fw") + lit(w(1)) * col("fc") +
        lit(w(2)) * col("fe") + lit(w(3)) * col("fd") + lit(w(4)))
      val u = feats.filter(margin <= 0)
        .agg(count(lit(1)).as("n"),
          coalesce(sum(col("y") * col("fw")), lit(0L)),
          coalesce(sum(col("y") * col("fc")), lit(0L)),
          coalesce(sum(col("y") * col("fe")), lit(0L)),
          coalesce(sum(col("y") * col("fd")), lit(0L)),
          coalesce(sum(col("y")), lit(0L)))
        .head
      val nWrong = u.getLong(0)
      w = Array(w(0) + u.getLong(1), w(1) + u.getLong(2),
        w(2) + u.getLong(3), w(3) + u.getLong(4), w(4) + u.getLong(5))
      hist += ((it.toLong, nWrong, w(0), w(1), w(2), w(3), w(4)))
    }
    hist.toSeq.toDF("iter", "n_wrong", "w_words", "w_chars", "w_exclaim",
      "w_digits", "w_bias")
  }

  // -------------------------------------------------------------------
  // Eval-set contamination: fraction of a training doc's distinct word
  // n-grams that appear anywhere in the eval split. The eval gram set is
  // small by nature (eval sets are), so Spark broadcasts it; the train
  // side stays a streaming scan — the 100 TB shape of decontamination.
  // Gram construction is a compiled UDF (HOF transform chains stay
  // interpreted per element).
  // -------------------------------------------------------------------
  private def gramUdf(n: Int) = udf { ws: Seq[String] =>
    if (ws == null || ws.length < n) Seq.empty[String]
    else ws.iterator.map(_.toLowerCase(java.util.Locale.ROOT))
      .sliding(n).map(_.mkString(" ")).toSeq
  }

  /** @param isEval predicate splitting the corpus (e.g. `doc_id % 50 === 0`)
    * @return one row per NON-eval doc: total distinct grams, matched
    *         grams, contamination fraction (0 when the doc is shorter
    *         than `n` words). */
  def contamination(docs: DataFrame, idCol: String, textCol: String,
      isEval: Column, n: Int = 5): DataFrame = {
    val grams = docs.select(col(idCol).as("doc_id"), isEval.as("is_eval"),
        explode(gramUdf(n)(tokens(col(textCol)))).as("gram"))
      .distinct()
    val evalGrams = grams.filter(col("is_eval")).select("gram").distinct()
    val trainGrams = grams.filter(!col("is_eval"))
    val matched = trainGrams.join(broadcast(evalGrams), Seq("gram"), "left_semi")
      .groupBy("doc_id").agg(count(lit(1)).as("matched_grams"))
    val totals = trainGrams.groupBy("doc_id").agg(count(lit(1)).as("total_grams"))
    // right side of the totals join is every short doc too: docs with no
    // grams never appear in `totals`, so re-anchor on the doc table
    docs.filter(!isEval).select(col(idCol).as("doc_id"))
      .join(totals, Seq("doc_id"), "left")
      .join(matched, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("total_grams"), lit(0L)).as("total_grams"),
        coalesce(col("matched_grams"), lit(0L)).as("matched_grams"))
      .withColumn("contamination",
        when(col("total_grams") > 0,
          round(col("matched_grams").cast("double") / col("total_grams"), 6))
          .otherwise(lit(0.0)))
  }

  /** FUZZY eval-set decontamination — the companion [[contamination]]
    * needs: exact n-gram overlap misses paraphrased or lightly-edited
    * benchmark leaks (the case decontamination actually worries about —
    * a word swapped every few tokens kills most 5-grams while leaving
    * the document obviously derived from the eval row). MinHash
    * signatures over word `shingleK`-shingles degrade gracefully under
    * such edits, so this gate runs [[Dedup.minHashAgainst]] with the
    * EVAL split as the stored side: the eval set keeps only its
    * (id, signature) table — numHashes strings per row, the q91
    * admission discipline — and flagging a 100 TB train corpus reads
    * that table once; the only cross-side shuffle is the (band, hash)
    * candidate join.
    *
    * Returns (doc_id, eval_id, agree) for every train doc whose
    * signature agreement with some eval doc reaches `minAgree`
    * (agreement estimates shingle-Jaccard; md5-keyed hashes so a second
    * engine reproduces every value). Anti-join the corpus on doc_id to
    * decontaminate; run alongside [[contamination]] — exact catches
    * verbatim inclusions with certainty, this catches the edited
    * ones. */
  def fuzzyContamination(docs: DataFrame, idCol: String, textCol: String,
      isEval: Column, shingleK: Int = 3, numHashes: Int = 16,
      bands: Int = 4, minAgree: Double = 0.5): DataFrame = {
    def sigs(df: DataFrame) = df
      .withColumn("__sh", Dedup.shingles(col(textCol), shingleK))
      .filter(size(col("__sh")) > 0)
      .select(col(idCol).as("doc_id"),
        Dedup.md5MinHashSignatureUdf(numHashes)(col("__sh")).as("sig"))
    Dedup.minHashAgainst(sigs(docs.filter(!isEval)), sigs(docs.filter(isEval)),
        bands = bands, minAgree = minAgree, numHashes = numHashes)
      .select(col("new_id").as("doc_id"), col("old_id").as("eval_id"),
        col("agree"))
  }

  // -------------------------------------------------------------------
  // Repeated-n-gram (boilerplate) detection: word n-grams occurring in
  // at least `minDocs` DISTINCT documents — the CC-net/C4 shape for
  // finding navigation chrome, disclaimers, and licence blocks that
  // repeat across a crawl. Shuffles only (gram) keys: the distinct
  // collapses per-doc repeats map-side, then one count per gram. At
  // 100 TB the gram strings can be pre-hashed to 64-bit keys; the exact
  // strings here keep the oracle portable.
  // -------------------------------------------------------------------
  def repeatedNgrams(docs: DataFrame, idCol: String, textCol: String,
      n: Int = 5, minDocs: Int = 10): DataFrame =
    docs.select(col(idCol).as("doc_id"),
        explode(gramUdf(n)(tokens(col(textCol)))).as("gram"))
      .distinct() // one vote per (doc, gram)
      .groupBy("gram").agg(count(lit(1)).as("n_docs"))
      .filter(col("n_docs") >= minDocs)

  // -------------------------------------------------------------------
  // Exact repeated-substring accounting (the Lee et al. 2022
  // "Deduplicating Training Data Makes Language Models Better"
  // exact-substring pass, re-expressed relationally): a token position
  // is part of a repeated substring when its k-token window appears in
  // >= minDocs distinct documents. Per doc, repeated positions expand
  // to [pos, pos+k) intervals and overlapping/touching intervals merge
  // through the verified gaps-and-islands primitive — the output is
  // exact integer accounting (total tokens, covered tokens, span
  // count), the removal worklist of the suffix-array construction
  // without materializing cleaned text.
  //
  // Scale shape: the wide shuffle is keyed by the GRAM (one vote per
  // (doc, gram), then a semi-join back), intervals merge per doc under
  // a doc-keyed window over only the repeated positions — document
  // text never crosses an exchange.
  // -------------------------------------------------------------------

  /** @return (doc_id, n_tokens, repeated_tokens, n_spans) per doc —
    *   `repeated_tokens` = tokens covered by merged repeated-k-gram
    *   spans, `n_spans` = merged span count (0/0 for clean docs). */
  def repeatedSpanStats(docs: DataFrame, idCol: String, textCol: String,
      k: Int = 8, minDocs: Int = 2): DataFrame =
    repeatedSpanStatsMultiK(docs, idCol, textCol, Seq(k), minDocs)

  /** Multi-k composition of [[repeatedSpanStats]], one step closer to
    * the paper's arbitrary-length construction (Lee et al. 2022 use a
    * suffix array; fixed-k windows are the cheap screening pass — the
    * construction proper, with the arbitrary-length guarantee, is
    * [[SuffixArray.repeatedSpanStatsExact]]):
    * mine cross-doc repeated k-grams at EVERY window size in `ks`, then
    * merge all hit intervals through the one verified gaps-and-islands
    * primitive — so a long verbatim repeat flagged by several window
    * sizes (and by many overlapping windows within each size) is
    * accounted ONCE in `repeated_tokens`/`n_spans`, never per-window or
    * per-k. Larger k adds precision on long boilerplate (a 32-gram
    * match is much stronger evidence than 25 chained 8-gram matches);
    * the union keeps small-k recall.
    *
    * Scale shape unchanged from the single-k form, repeated per k: the
    * wide shuffles are gram-keyed (distinct + count >= minDocs, then a
    * semi-join back); document text never crosses an exchange — only
    * (gram-hash, doc_id, pos) triples do. The interval merge is keyed
    * by doc_id. */
  def repeatedSpanStatsMultiK(docs: DataFrame, idCol: String,
      textCol: String, ks: Seq[Int], minDocs: Int = 2): DataFrame = {
    require(ks.nonEmpty && ks.forall(_ >= 1) && minDocs >= 2,
      s"need ks nonempty, all >= 1, minDocs >= 2")
    require(ks.distinct.size == ks.size, s"duplicate window sizes in $ks")
    val toks = docs.select(col(idCol).as("doc_id"),
      tokens(col(textCol)).as("ws"))
    val hitsPerK = ks.map { k =>
      val grams = toks.select(col("doc_id"),
        posexplode(gramUdf(k)(col("ws"))).as(Seq("pos", "gram")))
      val repeated = grams.select("gram", "doc_id").distinct()
        .groupBy("gram").agg(count(lit(1)).as("n_docs"))
        .filter(col("n_docs") >= minDocs)
        .select("gram")
      grams.join(repeated, Seq("gram"), "left_semi")
        .select(col("doc_id"), col("pos").cast("long").as("s"),
          (col("pos") + k).cast("long").as("e"))
    }
    val hits = hitsPerK.reduce(_ unionByName _)
    val spans = Cleaning.mergeIntervals(hits, "doc_id", "s", "e")
      .groupBy("doc_id")
      .agg(sum(col("e") - col("s")).as("repeated_tokens"),
        count(lit(1)).as("n_spans"))
    toks.select(col("doc_id"), size(col("ws")).cast("long").as("n_tokens"))
      .join(spans, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"),
        coalesce(col("repeated_tokens"), lit(0L)).as("repeated_tokens"),
        coalesce(col("n_spans"), lit(0L)).as("n_spans"))
  }

  /** Materialized REMOVAL form of [[repeatedSpanStats]] — the Lee et
    * al. 2022 ExactSubstr dedup pass that actually edits the corpus:
    * tokens covered by any merged repeated-k-gram span are excised from
    * every document holding them (all copies go — the paper's policy;
    * a keep-one variant is a rank gate away), survivors rejoin in
    * position order. Returns (doc_id, text, n_tokens, kept_tokens)
    * with `text` the cleaned document ('' when fully covered).
    *
    * Scale shape: identical to [[repeatedSpanStatsMultiK]] (gram-keyed
    * wide shuffles, doc-keyed interval merge) plus one doc-keyed join
    * of the merged spans back onto the token arrays; spans collect
    * in-row only for docs that HAVE them (≤ n_tokens/k per doc by
    * construction), and the excision is a single higher-order `filter`
    * over the token array — cleaned text never crosses an exchange. */
  def removeRepeatedSpans(docs: DataFrame, idCol: String, textCol: String,
      k: Int = 8, minDocs: Int = 2): DataFrame = {
    require(k >= 1 && minDocs >= 2, s"need k >= 1, minDocs >= 2")
    val toks = docs.select(col(idCol).as("doc_id"),
      tokens(col(textCol)).as("ws"))
    val grams = toks.select(col("doc_id"),
      posexplode(gramUdf(k)(col("ws"))).as(Seq("pos", "gram")))
    val repeated = grams.select("gram", "doc_id").distinct()
      .groupBy("gram").agg(count(lit(1)).as("n_docs"))
      .filter(col("n_docs") >= minDocs)
      .select("gram")
    val hits = grams.join(repeated, Seq("gram"), "left_semi")
      .select(col("doc_id"), col("pos").cast("long").as("s"),
        (col("pos") + k).cast("long").as("e"))
    val spans = Cleaning.mergeIntervals(hits, "doc_id", "s", "e")
      .groupBy("doc_id")
      .agg(collect_list(struct(col("s"), col("e"))).as("__spans"))
    val kept = filter(col("ws"), (_, i) =>
      !exists(col("__spans"), sp =>
        i.cast("long") >= sp.getField("s") &&
          i.cast("long") < sp.getField("e")))
    toks.join(spans, Seq("doc_id"), "left")
      .select(col("doc_id"),
        when(col("__spans").isNull, col("ws")).otherwise(kept).as("__kept"),
        size(col("ws")).cast("long").as("n_tokens"))
      .select(col("doc_id"), concat_ws(" ", col("__kept")).as("text"),
        col("n_tokens"), size(col("__kept")).cast("long").as("kept_tokens"))
  }

  /** Semantic eval-set decontamination — the third member of the
    * decontamination family (exact 5-gram [[contamination]] catches
    * verbatim, MinHash [[fuzzyContamination]] catches edits; this
    * catches PARAPHRASES that share no shingles): flag train docs whose
    * embedding cosine against ANY eval doc reaches `minCos`. Eval sets
    * are serving-sized by nature, so the eval (id, vector) table rides
    * a BROADCAST into one codegen cosine pass over the train corpus —
    * flagging 100 TB of train is one map-side scan, no shuffle of
    * train rows at all; at larger eval sets `mode = "ivf"` runs the
    * same contract over an IVF candidate stream
    * ([[semanticContaminationPruned]]). Cosines round to 6 before the
    * threshold (engine-portable). Returns (doc_id, eval_id, cos) for
    * every flagged (train, eval) pair. */
  def semanticContamination(train: DataFrame, eval: DataFrame,
      idCol: String, vecCol: String, minCos: Double,
      mode: String = "broadcast", nCentroids: Int = 16,
      nProbe: Int = 4): DataFrame = mode match {
    case "broadcast" =>
      import graft.functions.GraftFunctions.vecCosine
      val ev = eval.select(col(idCol).as("eval_id"), col(vecCol).as("__ev"))
      train.select(col(idCol).as("doc_id"), col(vecCol).as("__tv"))
        .crossJoin(broadcast(ev))
        .withColumn("cos", round(vecCosine(col("__tv"), col("__ev")), 6))
        .filter(col("cos") >= minCos)
        .select("doc_id", "eval_id", "cos")
    case "ivf" =>
      semanticContaminationPruned(train, eval, idCol, vecCol, minCos,
        nCentroids, nProbe)
    case other => throw new IllegalArgumentException(
      s"semanticContamination mode must be 'broadcast' or 'ivf', got '$other'")
  }

  /** [[semanticContamination]]'s corpus×corpus path — the candidate
    * stream the broadcast form can't serve once BOTH sides are
    * corpus-sized (train×train self-audits, corpus-overlap checks): an
    * IVF coarse quantizer fit on `train` (frozen centroids — k·d
    * doubles on the driver, the [[graft.ops.Similarity.IvfIndex]]
    * discipline) assigns every train row to its nearest cell and every
    * eval row to its `nProbe` nearest cells, both as map-side passes;
    * candidate pairs are the rows meeting in a cell — one id-keyed
    * equi-join on `centroid`, so NOTHING data-proportional broadcasts
    * and no cross join exists anywhere in the plan (CurationSpec
    * asserts both). Output contract matches the broadcast path —
    * (doc_id, eval_id, cos) with cos round6'd before the `minCos`
    * threshold — restricted to candidate pairs: every emitted pair is
    * TRUE (its cosine really clears the bar); only misses are possible,
    * and q339 grades per-eval candidate recall against the brute
    * contract. Each (train, eval) pair meets in at most one cell (a
    * train row has exactly one cell, probes are distinct), so no
    * dedup pass is needed. */
  def semanticContaminationPruned(train: DataFrame, eval: DataFrame,
      idCol: String, vecCol: String, minCos: Double,
      nCentroids: Int = 16, nProbe: Int = 4): DataFrame = {
    import graft.functions.GraftFunctions.vecCosine
    val ivf = new Similarity.IvfIndex(train, nCentroids, vecCol, idCol)
    val tr = ivf.assigned.select(col(idCol).as("doc_id"),
      col(vecCol).as("__tv"), col("centroid"))
    val ev = ivf.probeAssign(
        eval.select(col(idCol).as("eval_id"), col(vecCol)), nProbe)
      .select(col("eval_id"), col(vecCol).as("__ev"), col("centroid"))
    tr.join(ev, Seq("centroid"))
      .withColumn("cos", round(vecCosine(col("__tv"), col("__ev")), 6))
      .filter(col("cos") >= minCos)
      .select("doc_id", "eval_id", "cos")
  }

  /** DSIR-style importance selection (Xie et al. 2023, "Data Selection
    * for Language Models via Importance Resampling") — pick the raw
    * documents whose hashed-n-gram distribution looks most like a
    * TARGET corpus. The published method fits hashed n-gram bag models
    * p̂_target and p̂_raw and resamples ∝ the importance weight
    * log p̂_target(doc) − log p̂_raw(doc); this is the deterministic
    * top-budget variant (the house derandomization — Gumbel noise adds
    * nothing an oracle can replay): both profiles are
    * [[TextAnalysis.langIdTrain]] models over the SAME hashed
    * char-bigram buckets (additive counts — profiles maintain
    * incrementally), each raw doc's weight is the exact micro-log
    * integer score difference from [[TextAnalysis.langIdScores]], and
    * the budget keeps the top docs by (w6 desc, id).
    *
    * Scale shape: profiles broadcast (buckets·2 rows); scoring is one
    * gram-keyed pass with map-side-combinable sums; the selection is a
    * TakeOrderedAndProject over (w6, id) — per-partition heaps, never
    * a global sort. Docs with no grams are absent (they cannot be
    * scored — the langIdClassify boundary).
    *
    * @return one row per scorable raw doc:
    *         (doc_id, w6, n_grams, selected 0/1) */
  def dsirSelect(raw: DataFrame, target: DataFrame, idCol: String,
      textCol: String, budgetDocs: Int, buckets: Int = 1024): DataFrame = {
    require(budgetDocs >= 1 && buckets >= 2,
      s"need budgetDocs >= 1, buckets >= 2, got $budgetDocs/$buckets")
    val labeled = raw.select(lit("raw").as("lang"), col(textCol).as("text"))
      .unionByName(
        target.select(lit("target").as("lang"), col(textCol).as("text")))
    val profile = TextAnalysis.langIdTrain(labeled, buckets = buckets)
    val sc = TextAnalysis.langIdScores(
      raw.select(col(idCol).as("doc_id"), col(textCol).as("text")),
      profile, buckets = buckets)
    val w = sc.groupBy("id").agg(
        (sum(when(col("lang") === "target", col("score6"))
          .otherwise(-col("score6")))).as("w6"),
        max("n_grams").as("n_grams"))
      .select(col("id").as("doc_id"), col("w6"), col("n_grams"))
    val picked = w.orderBy(desc("w6"), col("doc_id")).limit(budgetDocs)
      .select(col("doc_id")).withColumn("__sel", lit(1L))
    w.join(picked, Seq("doc_id"), "left")
      .select(col("doc_id"), col("w6"), col("n_grams"),
        coalesce(col("__sel"), lit(0L)).as("selected"))
  }

  /** Deterministic T5-style span corruption — denoising-pretraining
    * example construction with NO RNG (the house derandomization:
    * masking decisions come from `md5(doc_id || '_' || span_idx)`, the
    * [[Sampling.hexKey]] idiom, so a re-run — or a second engine —
    * rebuilds the identical corpus): tokens tile into fixed `spanLen`
    * spans, a span masks iff its first 8 md5 hex digits fall below
    * `maskPm/1000 · 16^8`, masked spans collapse to `<extra_id_K>`
    * sentinels numbered left to right, and the TARGET is the sentinel
    * sequence with the masked tokens (T5's objective layout; Raffel et
    * al. 2020 §3.1.4 — their span sampling is randomized, the tiling
    * here is the engine-replayable stand-in, stated plainly).
    * One compiled map-side pass per row; text never crosses an
    * exchange. Returns (doc_id, input_text, target_text, n_masked). */
  def spanCorrupt(docs: DataFrame, idCol: String, textCol: String,
      spanLen: Int = 3, maskPm: Int = 250): DataFrame = {
    require(spanLen >= 1 && maskPm >= 0 && maskPm <= 1000,
      s"bad spanCorrupt params spanLen=$spanLen maskPm=$maskPm")
    // 8-hex-digit threshold for the lexicographic compare; maskPm=1000
    // would format to NINE digits (2^32) and sort before "2"-prefixed
    // hashes — clamp to a sentinel that sorts after every hex string
    val threshold =
      if (maskPm == 1000) "g" else f"${(maskPm.toLong << 32) / 1000}%08x"
    val corrupt = udf { (id: String, text: String) =>
      val ws = (if (text == null) "" else text).trim.split("\\s+")
        .filter(_.nonEmpty)
      val md = java.security.MessageDigest.getInstance("MD5")
      def masked(span: Int): Boolean = {
        val hex = md.digest(s"${id}_$span".getBytes("UTF-8"))
          .map("%02x".format(_)).mkString.substring(0, 8)
        hex < threshold
      }
      val in = new StringBuilder
      val tgt = new StringBuilder
      var k = 0
      var i = 0
      while (i < ws.length) {
        val span = i / spanLen
        if (i % spanLen == 0 && masked(span)) {
          val sentinel = s"<extra_id_$k>"
          if (in.nonEmpty) in.append(' ')
          in.append(sentinel)
          if (tgt.nonEmpty) tgt.append(' ')
          tgt.append(sentinel)
          var j = i
          while (j < math.min(i + spanLen, ws.length)) {
            tgt.append(' ').append(ws(j)); j += 1
          }
          k += 1
          i = math.min(i + spanLen, ws.length)
        } else {
          if (in.nonEmpty) in.append(' ')
          in.append(ws(i))
          i += 1
        }
      }
      (in.toString, tgt.toString, k)
    }
    docs.select(col(idCol),
        corrupt(col(idCol).cast("string"), col(textCol)).as("__c"))
      .select(col(idCol), col("__c._1").as("input_text"),
        col("__c._2").as("target_text"),
        col("__c._3").cast("long").as("n_masked"))
  }

  // -------------------------------------------------------------------
  // C4-style line filtering: keep lines that end in terminal punctuation
  // and carry at least `minWords` words; drop the whole document when it
  // contains code braces (the C4 "{" rule). One compiled pass per row —
  // no shuffle, embarrassingly parallel.
  // -------------------------------------------------------------------
  final case class LineFilterResult(kept_text: String, n_kept: Int,
      n_dropped: Int, has_braces: Boolean)

  private def lineFilterUdf(minWords: Int) = udf { text: String =>
    val t = if (text == null) "" else text
    val hasBraces = t.indexOf('{') >= 0 || t.indexOf('}') >= 0
    val kept = new StringBuilder
    var nKept = 0
    var nDropped = 0
    t.split("\n", -1).foreach { line =>
      val trimmed = line.trim
      if (trimmed.nonEmpty) {
        val words = trimmed.split(" ").count(_.nonEmpty)
        val last = trimmed.charAt(trimmed.length - 1)
        val terminal = last == '.' || last == '!' || last == '?' || last == '"'
        if (words >= minWords && terminal) {
          if (nKept > 0) kept += '\n'
          kept ++= line
          nKept += 1
        } else nDropped += 1
      }
    }
    LineFilterResult(kept.toString, nKept, nDropped, hasBraces)
  }

  /** @return one row per SURVIVING doc (brace docs are dropped whole):
    *         id, cleaned text, kept/dropped line counts. */
  def c4LineFilter(docs: DataFrame, idCol: String, textCol: String,
      minWords: Int = 5): DataFrame =
    docs.select(col(idCol), lineFilterUdf(minWords)(col(textCol)).as("r"))
      .filter(!col("r.has_braces") && col("r.n_kept") > 0)
      .select(col(idCol), col("r.kept_text").as("kept_text"),
        col("r.n_kept").as("n_kept"), col("r.n_dropped").as("n_dropped"))

  // -------------------------------------------------------------------
  // TF-IDF keywords: top-k terms per document. tf is per (doc, term),
  // df is one count-distinct per term, idf = ln(N/df). The shuffles are
  // all on (term) or (doc, term) — narrow keys; N is a scalar. The
  // window ranks within a doc (bounded partition), never globally.
  // -------------------------------------------------------------------
  def tfidfKeywords(docs: DataFrame, idCol: String, textCol: String,
      k: Int = 3, minLen: Int = 4): DataFrame = {
    val terms = docs.select(col(idCol).as("doc_id"),
      explode(regexp_extract_all(lower(col(textCol)),
        lit(s"[a-z]{$minLen,}"), lit(0))).as("term"))
    val tf = terms.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val docCount = docs.select(countDistinct(col(idCol)).as("n_docs"))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val w = Window.partitionBy("doc_id")
      .orderBy(col("score").desc, col("term").asc)
    tf.join(dfreq, "term")
      .crossJoin(broadcast(docCount))
      .withColumn("score",
        round(col("tf") * log(col("n_docs").cast("double") / col("df")), 6))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("doc_id", "term", "tf", "df", "score", "rank")
  }

  // -------------------------------------------------------------------
  // Training-pair generation: (chunk_i, chunk_i+1) pairs per document —
  // the next-chunk/next-sentence pair construction contrastive and
  // retrieval training sets are built from. Chunks are fixed token
  // windows; the pairing is one lead window per document (partition
  // bounded by chunks-per-doc), and the emitted pair carries md5
  // digests, not the text — at 100 TB the pair table is the training
  // manifest and re-joins text by digest only where needed.
  // -------------------------------------------------------------------
  def adjacentChunkPairs(docs: DataFrame, idCol: String, textCol: String,
      chunkTokens: Int = 50): DataFrame = {
    require(chunkTokens >= 1, "chunkTokens must be positive")
    val chunks = docs.select(col(idCol),
      posexplode(expr(
        s"""transform(
           |  sequence(0, CAST(floor((size(split(`$textCol`, ' ')) - 1) / $chunkTokens) AS INT)),
           |  i -> array_join(slice(split(`$textCol`, ' '), i * $chunkTokens + 1, $chunkTokens), ' '))
           |""".stripMargin)).as(Seq("idx", "chunk")))
    val w = Window.partitionBy(idCol).orderBy("idx")
    chunks
      .withColumn("next_chunk", lead(col("chunk"), 1).over(w))
      .filter(col("next_chunk").isNotNull)
      .select(col(idCol), col("idx").cast("long").as("idx"),
        md5(col("chunk").cast("binary")).as("chunk_digest"),
        md5(col("next_chunk").cast("binary")).as("next_digest"))
  }

  // -------------------------------------------------------------------
  // Sequence packing: streaming-fill docs into fixed token windows
  // (training-batch assembly). Deterministic shard-local packing: the
  // shard key bounds every window partition, so 100 TB packs as W
  // independent running sums — no global window, no single-partition
  // choke. (Greedy best-fit packs ~1% tighter but is inherently
  // sequential; streaming fill is the distributed-sane choice.)
  // -------------------------------------------------------------------
  def packSequences(docs: DataFrame, idCol: String, textCol: String,
      windowTokens: Int, shards: Int = 8): DataFrame = {
    val shard = pmod(col(idCol), lit(shards.toLong)).as("shard")
    val w = Window.partitionBy("shard").orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs.select(col(idCol).as("doc_id"), shard,
        size(tokens(col(textCol))).cast("long").as("n_tokens"))
      .withColumn("cum_tokens", sum(col("n_tokens")).over(w))
      .withColumn("bin",
        floor((col("cum_tokens") - col("n_tokens")).cast("double") / windowTokens)
          .cast("long"))
  }

  // -------------------------------------------------------------------
  // k-anonymity risk audit: a released training corpus whose metadata
  // combination (language × source × size bucket × …) isolates fewer
  // than k rows lets those rows be re-identified by joining on the
  // quasi-identifiers alone — the governance check run before any
  // metadata-bearing corpus ships. Rows in groups of size < k are the
  // risk set (suppress, generalize the quasi-columns, or drop).
  //
  // Scale shape: one groupBy on the quasi-key; only the RISKY groups
  // (filtered before the join, and by construction each under k rows)
  // come back — the join side is small and broadcasts under AQE; the
  // corpus never shuffles twice.
  // -------------------------------------------------------------------

  /** Rows whose quasi-identifier combination matches fewer than `k`
    * rows, with the group size attached. Empty result = the corpus is
    * k-anonymous over these columns.
    *
    * The join-back is null-safe (`<=>` per quasi-column): a NULL
    * quasi-identifier value is itself an identifying combination (the
    * groupBy already keys it), so a unique null-keyed row must be
    * flagged, not silently pass. */
  /** BERT-style masked-LM corruption (Devlin et al. 2019 §3.1,
    * hash-derandomized) — the OTHER pretraining-data recipe next to
    * the T5 span corruption (q206): select ~15% of token OCCURRENCES
    * by the md5("doc:pos") coin, then split selections 80/10/10 by
    * the coin's residue mod 10 (0-7 → [MASK], 8 → replace with a
    * "random" vocabulary token — the token whose vocabulary rank is
    * (coin div 10) mod V, a pure function of the corpus — 9 → keep).
    * Every decision replays on any engine with md5; no RNG anywhere,
    * so the corruption is retry-safe and auditable (which single
    * tokens were shown unmasked is re-derivable years later).
    *
    * Scale shape: the coin and branch are map-side codegen; the
    * vocabulary rank table comes from [[graft.ops.Layout
    * .globalRowNumber]] on the token dimension (vocabulary-sized,
    * never corpus-sized) and joins back only to the ~1.5% of
    * positions needing a replacement. Returns selected positions
    * (id, pos, tok, action, repl); unselected positions are absent
    * (the training writer keeps them verbatim). */
  def mlmMasking(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", selPpm: Long = 150000L): DataFrame = {
    require(selPpm >= 1L && selPpm <= 1000000L,
      s"selPpm must be ppm in [1, 1e6], got $selPpm")
    val toks = docs.select(col(idCol).as("id"),
        posexplode(split(lower(trim(col(textCol))), "\\s+"))
          .as(Seq("pos", "tok")))
      .filter(col("tok") =!= "")
      .withColumn("u", conv(substring(md5(concat(
        col("id").cast("string"), lit(":"), col("pos").cast("string"))
        .cast("binary")), 1, 8), 16, 10).cast("long"))
      .filter(col("u") * 1000000L < lit(selPpm * 4294967296L))
      .localCheckpoint()
    val vocab = graft.ops.Layout.globalRowNumber(
        docs.select(explode(split(lower(trim(col(textCol))), "\\s+"))
          .as("tok")).filter(col("tok") =!= "").distinct(),
        "tok")
      .select(col("tok").as("repl"), (col("rn") - 1).as("vr"))
      .localCheckpoint()
    val vRow = vocab.agg(count(lit(1)).as("v"))
    val branched = toks.crossJoin(broadcast(vRow))
      .withColumn("action", when(col("u") % 10 < 8, lit("mask"))
        .when(col("u") % 10 === 8, lit("random"))
        .otherwise(lit("keep")))
      .withColumn("vr", when(col("action") === "random",
        expr("(u div 10) % v")))
    branched.join(vocab, Seq("vr"), "left")
      .select(col("id"), col("pos").cast("long").as("pos"), col("tok"),
        col("action"),
        when(col("action") === "random", col("repl")).as("repl"))
  }

  /** Mondrian k-anonymization (LeFevre et al. ICDE 2006, strict
    * deterministic variant) — the GENERALIZATION member of the privacy
    * tier: [[kAnonymityRisk]] tells you which quasi-identifier cells
    * are unsafe; this one produces the safe cells, recursively
    * median-splitting the 2-D quasi-identifier space on the wider
    * dimension until a cut would leave a side below k. Determinism:
    * the split dimension is range-argmax with ties to `a`, the cut is
    * the LOWER MEDIAN as a count-based order statistic (min value
    * whose cumulative count reaches ⌊(n+1)/2⌋ — never a sort), left
    * takes ≤ median, child ids are 2·pid / 2·pid+1 (the cut path IS
    * the id). A partition whose cut would starve a side — including
    * the all-equal-values case, where the right side is empty —
    * finalizes and stops. `rounds` bounds the tree depth explicitly
    * (the k-means unrolled-iteration discipline; depth log(n/k)
    * suffices).
    *
    * Scale shape per round: one partition-dimension stats aggregate,
    * one (partition, VALUE)-dimension cumulative window (value-domain
    * bounded, the q267 rule), one broadcast-sized split-plan join back
    * to rows; `localCheckpoint` truncates lineage per round. Returns
    * the anonymized release map (pid, n, a_lo, a_hi, b_lo, b_hi) —
    * every cell holds ≥ k rows whenever the root held ≥ k. */
  def mondrian(df: DataFrame, idCol: String, aCol: String, bCol: String,
      k: Int, rounds: Int): DataFrame = {
    require(k >= 1 && rounds >= 1, s"bad k/rounds: $k/$rounds")
    import org.apache.spark.sql.expressions.Window
    var cur = df.select(col(idCol).cast("long").as("id"),
        col(aCol).cast("long").as("a"), col(bCol).cast("long").as("b"))
      .withColumn("pid", lit(1L)).withColumn("fin", lit(false))
      .localCheckpoint()
    for (_ <- 1 to rounds) {
      val stats = cur.filter(!col("fin")).groupBy("pid")
        .agg(count(lit(1)).as("n"),
          min("a").as("amin"), max("a").as("amax"),
          min("b").as("bmin"), max("b").as("bmax"))
        .withColumn("dim", when(col("amax") - col("amin") >=
          col("bmax") - col("bmin"), lit("a")).otherwise(lit("b")))
      val vals = cur.filter(!col("fin"))
        .join(stats.select("pid", "dim", "n"), "pid")
        .withColumn("v",
          when(col("dim") === "a", col("a")).otherwise(col("b")))
      val wc = Window.partitionBy("pid").orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val plan = vals.groupBy("pid", "n", "v").agg(count(lit(1)).as("c"))
        .withColumn("cum", sum("c").over(wc))
        .filter(col("cum") >= expr("CAST((n + 1) div 2 AS BIGINT)"))
        .groupBy("pid", "n")
        .agg(min(struct(col("v"), col("cum"))).as("m"))
        .select(col("pid"), col("m.v").as("med"),
          (col("m.cum") >= k && col("n") - col("m.cum") >= k)
            .as("split"))
        .join(stats.select("pid", "dim"), "pid")
      cur = cur.join(broadcast(plan), Seq("pid"), "left")
        .select(col("id"), col("a"), col("b"),
          when(coalesce(col("split"), lit(false)),
            lit(2L) * col("pid") +
              when((when(col("dim") === "a", col("a"))
                .otherwise(col("b"))) > col("med"), 1L).otherwise(0L))
            .otherwise(col("pid")).as("pid"),
          (col("fin") || coalesce(!col("split"), lit(false))).as("fin"))
        .localCheckpoint()
    }
    cur.groupBy("pid").agg(count(lit(1)).as("n"),
      min("a").as("a_lo"), max("a").as("a_hi"),
      min("b").as("b_lo"), max("b").as("b_hi"))
  }

  def kAnonymityRisk(df: DataFrame, quasiCols: Seq[String],
      k: Int): DataFrame = {
    require(k >= 2, s"k-anonymity needs k >= 2, got $k")
    require(quasiCols.nonEmpty, "need at least one quasi-identifier column")
    val riskyGroups = df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("group_n"))
      .filter(col("group_n") < k)
    nullSafeJoinBack(df, riskyGroups, quasiCols)
  }

  /** Null-safe equivalent of `df.join(groups, quasiCols)`: keeps one
    * copy of the quasi-columns plus the aggregate columns from
    * `groups`, but matches NULL quasi-values to their own group. */
  private def nullSafeJoinBack(df: DataFrame, groups: DataFrame,
      quasiCols: Seq[String]): DataFrame = {
    val renamed = quasiCols.foldLeft(groups) { (g, c) =>
      g.withColumnRenamed(c, s"__rg_$c")
    }
    val cond = quasiCols
      .map(c => df(c) <=> renamed(s"__rg_$c"))
      .reduce(_ && _)
    quasiCols.foldLeft(df.join(renamed, cond))((j, c) =>
      j.drop(s"__rg_$c"))
  }

  /** l-diversity risk — the [[kAnonymityRisk]] complement: a
    * quasi-identifier group can be large (k-anonymous) yet still leak
    * if nearly everyone in it shares the same SENSITIVE value; this
    * flags rows whose group carries fewer than `l` distinct sensitive
    * values. Same shape as the k-audit: one distinct-count aggregate,
    * risky groups filtered before the join-back. */
  def lDiversityRisk(df: DataFrame, quasiCols: Seq[String],
      sensitiveCol: String, l: Int): DataFrame = {
    require(l >= 2, s"l-diversity needs l >= 2, got $l")
    require(quasiCols.nonEmpty, "need at least one quasi-identifier column")
    val riskyGroups = df.groupBy(quasiCols.map(col): _*)
      .agg(countDistinct(col(sensitiveCol)).as("distinct_sensitive"))
      .filter(col("distinct_sensitive") < l)
    nullSafeJoinBack(df, riskyGroups, quasiCols)
  }

  /** Disparate-impact (4/5-rule) fairness audit for a selection
    * decision — the curation-gate check the privacy tier's k/l/t
    * audits don't cover: a quality/length/perplexity filter that
    * admits one language or source at a far lower rate than another
    * silently skews the corpus. Per group: selection rate, and the
    * ratio of that rate to the HIGHEST-rate group's (the reference),
    * in exact per-mille cross-multiplication
    *
    *   di_pm = (sel_g · n_ref) · 1000 div (n_g · sel_ref)
    *
    * `flagged` = di_pm < 800 (the EEOC four-fifths rule). Reference =
    * max rate by cross-multiplied comparison, ties → lexicographically
    * smallest group. One map-side aggregate; ratio arithmetic on the
    * group-dimension table driver-side. Groups with zero selections
    * report di_pm 0 (flagged unless every group is zero). */
  def disparateImpact(df: DataFrame, groupCol: String,
      selectedCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val agg = df.groupBy(col(groupCol).cast("string").as("grp"))
      .agg(count(lit(1)).as("n"),
        sum(when(col(selectedCol).cast("boolean"), 1L).otherwise(0L))
          .as("n_sel"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    require(agg.nonEmpty, "empty input")
    // reference: max rate via cross-multiplied compare (no doubles)
    val reference = agg.reduce { (x, y) =>
      val cmp = BigInt(x._3) * y._2 - BigInt(y._3) * x._2
      if (cmp > 0) x else if (cmp < 0) y
      else if (x._1 <= y._1) x else y
    }
    agg.map { case (g, n, s) =>
      val di =
        if (reference._3 == 0L) 1000L // every group zero: vacuously fair
        else (BigInt(s) * reference._2 * 1000L /
          (BigInt(n) * reference._3)).toLong
      (g, n, s, s * 1000L / n, reference._1, di, di < 800L)
    }.toSeq.toDF("grp", "n", "n_sel", "rate_pm", "ref_grp", "di_pm",
      "flagged")
  }

  /** Subject-access export (the GDPR/CCPA READ side, next to the
    * takedown/purge WRITE side in [[graft.index.Snapshots]]): for every
    * requested subject, each table's row count and a deterministic
    * content digest — the "here is everything we hold about you"
    * manifest an access request answers with, and the audit artifact
    * proving two exports of the same data are identical.
    *
    * `parts` are (table_name, df) pairs where each df carries
    * `subject_id` and a STRING `repr` column (caller-built, ASCII-safe
    * — both engines sort it bytewise). The digest is md5 over the
    * subject's reprs sorted and joined with a U+0001 separator — order-
    * insensitive to the scan, reproducible by any engine.
    *
    * Shape: one semi-join + one subject-keyed aggregate per table; a
    * subject's rows collect within their group only (request-sized,
    * never the corpus). */
  def subjectExport(parts: Seq[(String, DataFrame)],
      subjects: DataFrame): DataFrame = {
    require(parts.nonEmpty, "need at least one table")
    parts.map { case (nm, df) =>
      df.join(subjects.select(col("subject_id")), Seq("subject_id"),
          "left_semi")
        .groupBy(col("subject_id"))
        .agg(count(lit(1)).as("n_rows"),
          md5(concat_ws("\u0001",
            array_sort(collect_list(col("repr")))).cast("binary"))
            .as("digest"))
        .withColumn("table_name", lit(nm))
        .select("subject_id", "table_name", "n_rows", "digest")
    }.reduce(_ unionByName _)
  }

  /** Ordered (EMD) t-closeness — [[tClosenessRisk]]'s companion for
    * NUMERIC sensitive attributes, the variant Li et al. 2007
    * recommend there: total variation treats salary bands 1 vs 2 the
    * same as 1 vs 10; the ordered-distance Earth-Mover's metric counts
    * how far probability mass must TRAVEL across the ordered domain,
    *
    *   EMD = (1/(m−1)) · Σ_i |P_g(≤ v_i) − P(≤ v_i)|
    *
    * over the m distinct global values. All-integer cross-
    * multiplication on cumulative counts (the final boundary's term is
    * identically 0, so summing all m is exact); rows with NULL
    * sensitive values are excluded from both distributions (ordered
    * distance to "missing" is undefined — audit nulls separately).
    * Flags groups with EMD > tNum/tDen; reports
    * `emd_pm = Σ·1000 div ((m−1)·n_g·N)`.
    *
    * Shape: the global cumulative table is value-domain-sized; the
    * group×domain grid (cumulative counts need every boundary, absent
    * values included) lives on the groups·m dimension — never the
    * corpus; windows partition by group. Same Long bound as the
    * unordered audit (counts·N < 2⁶³). */
  def tClosenessOrderedRisk(df: DataFrame, quasiCols: Seq[String],
      sensitiveCol: String, tNum: Long, tDen: Long): DataFrame = {
    require(tNum >= 0 && tDen > 0 && tNum <= tDen,
      s"t must be a fraction in [0,1], got $tNum/$tDen")
    require(quasiCols.nonEmpty, "need at least one quasi-identifier column")
    import org.apache.spark.sql.expressions.Window
    val base = df.filter(col(sensitiveCol).isNotNull)
    val gv = base.groupBy(col(sensitiveCol).as("__v"))
      .agg(count(lit(1)).as("__c_v"))
      .withColumn("__cum_v",
        sum(col("__c_v")).over(Window.orderBy(col("__v"))
          .rowsBetween(Window.unboundedPreceding, 0)))
      .select("__v", "__cum_v")
    val m = gv.count()
    require(m >= 2, s"ordered EMD needs >= 2 distinct values, got $m")
    val total = base.count()
    val groups = base.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("group_n"))
    val gcnt = base.groupBy((quasiCols.map(col) :+
        col(sensitiveCol).as("__v")): _*)
      .agg(count(lit(1)).as("__c_gv"))
    // group × full ordered domain: cumulative counts need every
    // boundary, including values the group never takes
    val grid = groups.crossJoin(broadcast(gv))
    val joinCond = quasiCols.map(c => grid(c) <=> gcnt(c))
      .reduce(_ && _) && grid("__v") === gcnt("__v")
    val filled = grid.join(gcnt, joinCond, "left")
      .select((quasiCols.map(grid(_)) ++ Seq(grid("__v"), grid("__cum_v"),
        grid("group_n"),
        coalesce(gcnt("__c_gv"), lit(0L)).as("__c_gv"))): _*)
    val wg = Window.partitionBy(quasiCols.map(col): _*)
      .orderBy(col("__v")).rowsBetween(Window.unboundedPreceding, 0)
    val perGroup = filled
      .withColumn("__cum_g", sum(col("__c_gv")).over(wg))
      .groupBy((quasiCols.map(col) :+ col("group_n")): _*)
      .agg(sum(abs(col("__cum_g") * total - col("__cum_v") * col("group_n")))
        .as("__emd_num"))
      .withColumn("emd_pm", expr(
        s"CAST(__emd_num * 1000 div ((${m - 1}) * group_n * $total) AS BIGINT)"))
    val risky = perGroup
      .filter(col("__emd_num") * tDen >
        lit(tNum) * (m - 1) * col("group_n") * total)
      .drop("__emd_num")
    nullSafeJoinBack(base, risky, quasiCols)
  }

  /** Cohen's kappa inter-annotator agreement — the labeling-QA summary
    * next to [[graft.ops.Similarity.labelConflictAudit]]'s per-item
    * review queue: how much better two annotators agree than chance
    * would predict (raw agreement alone rewards skewed label
    * distributions). Exact integers via cross-multiplication:
    *
    *   kappa = (p_o − p_e)/(1 − p_e)
    *         = (n·agree − S) / (n² − S),  S = Σ_c nA_c · nB_c
    *
    * emitted in per-mille (truncating division, negative kappa — worse
    * than chance — truncates toward zero in both engines). Returns the
    * full confusion matrix (label_a, label_b, n_pair) with the corpus
    * scalars (n, n_agree, kappa_pm) on every row.
    *
    * Shape: ONE map-side-combinable (a, b) aggregate over the corpus;
    * the scalar arithmetic runs on the label-domain² confusion table
    * driver-side (the Bradley-Terry dimension boundary). Overflow:
    * n·agree and n² must fit a Long — fine to ~3·10⁹ pairs. */
  def cohenKappa(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val conf = df.groupBy(col(aCol).cast("string").as("label_a"),
        col(bCol).cast("string").as("label_b"))
      .agg(count(lit(1)).as("n_pair"))
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .sortBy(t => (t._1, t._2))
    require(conf.nonEmpty, "empty input")
    val n = conf.map(_._3).sum
    val agree = conf.filter(t => t._1 == t._2).map(_._3).sum
    val margA = conf.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    val margB = conf.groupBy(_._2).view.mapValues(_.map(_._3).sum).toMap
    val s = (margA.keySet ++ margB.keySet).toSeq
      .map(c => margA.getOrElse(c, 0L) * margB.getOrElse(c, 0L)).sum
    val den = n * n - s
    val kappaPm = if (den == 0L) 1000L // degenerate: all one label pair
                  else 1000L * (n * agree - s) / den
    conf.map { case (a, b, np) => (a, b, np, n, agree, kappaPm) }.toSeq
      .toDF("label_a", "label_b", "n_pair", "n", "n_agree", "kappa_pm")
  }

  /** t-closeness risk (Li, Li & Venkatasubramanian 2007) — the third
    * rung of the privacy ladder after [[kAnonymityRisk]] and
    * [[lDiversityRisk]]: a group can be k-anonymous AND l-diverse yet
    * still leak when its SENSITIVE-value distribution skews far from
    * the corpus-wide one (20 distinct diseases in the group, but 90%
    * one disease vs 2% globally). Flags rows whose quasi-group's
    * total-variation distance from the global distribution exceeds
    * `tNum/tDen`.
    *
    * All-integer cross-multiplication (no floating division anywhere):
    * with group size n_g, corpus size N, group value counts c_gv and
    * global counts c_v,
    *
    *   TV > t  ⟺  tvNum · tDen > tNum · 2 · n_g · N, where
    *   tvNum = Σ_{v∈group} |c_gv·N − c_v·n_g| + n_g·(N − Σ_{v∈group} c_v)
    *
    * (the second term folds every globally-present-but-group-absent
    * value in closed form — the sum never touches the full value
    * domain per group). Reported `tv_pm` = tvNum·1000 div (2·n_g·N).
    * Overflow bound: c_gv·N must fit a Long — fine while N < ~3·10⁹
    * rows; shard or pre-aggregate the audit beyond that.
    *
    * Shape: one (quasi × sensitive) aggregate, a broadcast join
    * against the sensitive-domain-sized global table, group-frame
    * windows for n_g, and the same null-safe join-back as the k/l
    * audits. */
  def tClosenessRisk(df: DataFrame, quasiCols: Seq[String],
      sensitiveCol: String, tNum: Long, tDen: Long): DataFrame = {
    require(tNum >= 0 && tDen > 0 && tNum <= tDen,
      s"t must be a fraction in [0,1], got $tNum/$tDen")
    require(quasiCols.nonEmpty, "need at least one quasi-identifier column")
    import org.apache.spark.sql.expressions.Window
    val gv = df.groupBy(col(sensitiveCol).as("__v"))
      .agg(count(lit(1)).as("__c_v"))
    val total = df.count()
    val gcnt = df.groupBy((quasiCols.map(col) :+
        col(sensitiveCol).as("__v")): _*)
      .agg(count(lit(1)).as("__c_gv"))
      .join(broadcast(gv.withColumnRenamed("__v", "__gv_v")),
        col("__v") <=> col("__gv_v")) // null-safe: a NULL sensitive
      .drop("__gv_v")                 // value is its own category
    val wg = Window.partitionBy(quasiCols.map(col): _*)
    val withNg = gcnt.withColumn("__n_g", sum(col("__c_gv")).over(wg))
    val perGroup = withNg.groupBy(quasiCols.map(col): _*)
      .agg(first(col("__n_g")).as("group_n"),
        sum(abs(col("__c_gv") * total - col("__c_v") * col("__n_g")))
          .as("__abs_in"),
        sum(col("__c_v")).as("__cov"))
      .withColumn("__tv_num", col("__abs_in") +
        col("group_n") * (lit(total) - col("__cov")))
      .withColumn("tv_pm",
        expr(s"CAST(__tv_num * 1000 div (2 * group_n * $total) AS BIGINT)"))
    val risky = perGroup
      .filter(col("__tv_num") * tDen > lit(tNum) * 2 * col("group_n") * total)
      .drop("__abs_in", "__cov", "__tv_num")
    nullSafeJoinBack(df, risky, quasiCols)
  }

  /** Bradley–Terry preference aggregation (Hunter 2004's MM update) —
    * how pairwise human/model preference judgments become per-model
    * scores in an RLHF data pipeline. Exact fixed-point integers, the
    * q88-pagerank discipline: scores carry `scale` (1e6) and every MM
    * step is integer division, so five iterations are bit-identical in
    * any engine (Long division truncates, all quantities positive):
    *
    *   s'_m = (W_m · scale²) / Σ_o (n_mo · scale²) / (s_m + s_o)
    *
    * Execution shape: reducing raw comparisons to the canonical
    * per-pair win matrix is the ONE distributed pass (map-side
    * combine); the matrix is dimension-scale (models², like IVF
    * centroids), so the MM iterations run exactly on the driver — the
    * same boundary as [[Similarity]]'s k-means fit and probe ranking.
    * Bound: n_mo · scale² must fit a Long (n_mo < ~9e6 at scale 1e6);
    * normalize counts upstream past that. */
  def bradleyTerryScores(pairs: DataFrame, aCol: String, bCol: String,
      winsACol: String, winsBCol: String, iters: Int = 5,
      scale: Long = 1000000L): DataFrame = {
    val spark = pairs.sparkSession
    import spark.implicits._
    val canon = pairs.select(
        least(col(aCol), col(bCol)).cast("long").as("i"),
        greatest(col(aCol), col(bCol)).cast("long").as("j"),
        when(col(aCol) < col(bCol), col(winsACol))
          .otherwise(col(winsBCol)).cast("long").as("wi"),
        when(col(aCol) < col(bCol), col(winsBCol))
          .otherwise(col(winsACol)).cast("long").as("wj"))
      .groupBy("i", "j")
      .agg(sum("wi").as("wi"), sum("wj").as("wj"))
      .as[(Long, Long, Long, Long)].collect()
    val wins = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
    val adj = scala.collection.mutable.Map.empty[Long, List[(Long, Long)]]
      .withDefaultValue(Nil)
    canon.foreach { case (i, j, wi, wj) =>
      wins(i) += wi; wins(j) += wj
      val n = wi + wj
      adj(i) = (j, n) :: adj(i); adj(j) = (i, n) :: adj(j)
    }
    val models = adj.keys.toSeq.sorted
    models.foreach { m => require(wins(m) > 0,
      s"Bradley-Terry needs at least one win per model (model $m has 0);" +
        " drop never-winning models upstream") }
    val s2 = scale * scale
    var s: Map[Long, Long] = models.map(_ -> scale).toMap
    (1 to iters).foreach { _ =>
      s = models.map { m =>
        val den = adj(m).map { case (o, n) => n * s2 / (s(m) + s(o)) }.sum
        m -> wins(m) * s2 / den
      }.toMap
    }
    models.map(m => (m, s(m))).toDF("model", "score")
  }
}
