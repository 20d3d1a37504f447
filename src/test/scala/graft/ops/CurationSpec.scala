package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class CurationSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("domainCap keeps at most cap rows per source, largest first") {
    val docs = (1 to 20).map(i => (i.toLong, if (i <= 15) "a" else "b", i * 10L))
      .toDF("doc_id", "source", "n_chars")
    val out = Curation.domainCap(docs, "source", "doc_id", "n_chars", cap = 3)
      .collect()
    val bySource = out.groupBy(_.getString(1))
    assert(bySource("a").length == 3 && bySource("b").length == 3)
    // largest n_chars survive
    assert(bySource("a").map(_.getLong(2)).sorted.toSeq == Seq(130L, 140L, 150L))
  }

  test("piiRedact finds and replaces email/ssn/phone, leaves clean text alone") {
    val df = Seq(
      (1L, "mail me at jo.doe+x@ex-corp.io or call 415-555-1234, ssn 123-45-6789"),
      (2L, "no pii here, just 12345 and a-b-c")).toDF("doc_id", "text")
    val out = Curation.piiRedact(df, "text").orderBy("doc_id").collect()
    val r1 = out(0)
    assert(r1.getAs[Int]("emails_found") == 1)
    assert(r1.getAs[Int]("ssns_found") == 1)
    assert(r1.getAs[Int]("phones_found") == 1)
    val red = r1.getAs[String]("redacted")
    assert(red.contains("[EMAIL]") && red.contains("[SSN]") && red.contains("[PHONE]"))
    assert(!red.contains("@") && !red.contains("123-45-6789"))
    val r2 = out(1)
    assert(r2.getAs[Int]("emails_found") == 0 && r2.getAs[Int]("ssns_found") == 0 &&
      r2.getAs[Int]("phones_found") == 0)
    assert(r2.getAs[String]("redacted") == "no pii here, just 12345 and a-b-c")
  }

  test("piiRedact: pre-existing literal [PHONE] text does not inflate phones_found") {
    val df = Seq(
      (1L, "doc already says [PHONE] but has no real number"),
      (2L, "ssn 123-45-6789 only — the SSN must not also count as a phone"))
      .toDF("doc_id", "text")
    val out = Curation.piiRedact(df, "text").orderBy("doc_id").collect()
    assert(out(0).getAs[Int]("phones_found") == 0)
    assert(out(0).getAs[String]("redacted").contains("[PHONE]")) // untouched source text
    assert(out(1).getAs[Int]("ssns_found") == 1 && out(1).getAs[Int]("phones_found") == 0)
  }

  test("repetitionQuality honors a non-default id column") {
    val df = Seq((7L, "two words")).toDF("my_id", "text")
    val out = Curation.repetitionQuality(df, "text", idCol = "my_id").collect()
    assert(out.head.getAs[Long]("my_id") == 7L && out.head.getAs[Int]("n_words") == 2)
  }

  test("bloomFilteredJoin works on string keys (type-agnostic filter)") {
    val probe = (1 to 200).map(k => (s"key$k", k)).toDF("pk", "pv")
    val build = Seq(("key7", "a"), ("key150", "b")).toDF("bk", "bv")
    val got = Joins.bloomFilteredJoin(probe, build, "pk", "bk", expectedKeys = 10)
      .select("pk", "bv").collect().map(r => (r.getString(0), r.getString(1))).sorted
    assert(got.toSeq == Seq(("key150", "b"), ("key7", "a")))
  }

  test("repetitionQuality flags duplicated lines and symbol soup") {
    val df = Seq(
      (1L, "same line\nsame line\nsame line\nother"),
      (2L, "@@ ## $$ %%"),
      (3L, "plain four word text")).toDF("doc_id", "text")
    val out = Curation.repetitionQuality(df, "text")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getAs[Double]("dup_line_frac") == 0.5) // 2 distinct of 4
    assert(out(2L).getAs[Double]("symbol_ratio") > 0.6)
    assert(out(3L).getAs[Double]("dup_line_frac") == 0.0)
    assert(out(3L).getAs[Int]("n_words") == 4)
  }

  test("repeatedNgrams surfaces only the cross-doc boilerplate grams") {
    val docs = (1L to 12L).map { i =>
      val base = s"unique${i} filler${i} words${i} here${i}"
      val text = if (i <= 6) s"$base join our mailing list now please" else base
      (i, text)
    }.toDF("doc_id", "text")
    val out = Curation.repeatedNgrams(docs, "doc_id", "text", n = 3, minDocs = 5)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // grams fully inside the planted tail repeat in 6 docs; grams that
    // cross into the per-doc unique prefix never repeat
    assert(out == Map(
      "join our mailing" -> 6L, "our mailing list" -> 6L,
      "mailing list now" -> 6L, "list now please" -> 6L))
  }

  test("c4LineFilter keeps punctuated >=minWords lines, drops brace docs whole") {
    val docs = Seq(
      (1L, "A proper sentence with enough words here.\nshort one.\nno punctuation on this long line at all\nAnother full sentence ends with a question mark?"),
      (2L, "Good line that would have survived easily.\nvar x = { y: 1 }"),
      (3L, "nothing survives here"))
      .toDF("doc_id", "text")
    val out = Curation.c4LineFilter(docs, "doc_id", "text", minWords = 5)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out.keySet == Set(1L), "brace doc and no-keeper doc must drop whole")
    val r = out(1L)
    assert(r.getAs[String]("kept_text") ==
      "A proper sentence with enough words here.\nAnother full sentence ends with a question mark?")
    assert(r.getAs[Int]("n_kept") == 2 && r.getAs[Int]("n_dropped") == 2)
  }

  test("contamination: doc sharing a 5-gram with eval is flagged, others are 0") {
    val evalText = "the quick brown fox jumps over the lazy dog"
    val df = Seq(
      (50L, evalText),                                   // eval (id % 50 == 0)
      (1L, "prefix the quick brown fox jumps suffix"),   // shares one 5-gram
      (2L, "completely unrelated words with no overlap at all"),
      (3L, "shorty")                                     // < 5 words → 0 grams
    ).toDF("doc_id", "text")
    val out = Curation.contamination(df, "doc_id", "text",
        isEval = col("doc_id") % 50 === 0, n = 5)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(!out.contains(50L))
    assert(out(1L).getAs[Long]("matched_grams") == 1L)
    assert(out(1L).getAs[Double]("contamination") > 0.0)
    assert(out(2L).getAs[Long]("matched_grams") == 0L)
    assert(out(3L).getAs[Long]("total_grams") == 0L &&
      out(3L).getAs[Double]("contamination") == 0.0)
  }

  test("tfidfKeywords ranks a doc-specific term above corpus-wide ones") {
    val df = Seq(
      (1L, "alpha alpha alpha shared shared words words"),
      (2L, "beta beta shared words other other"),
      (3L, "gamma shared words filler filler")).toDF("doc_id", "text")
    val out = Curation.tfidfKeywords(df, "doc_id", "text", k = 1, minLen = 4)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) == "alpha")
    assert(out(2L) == "beta")  // 'other' appears only in doc 2 too, but tf 2 == tf 2 → term asc... beta < other
    assert(out(3L) == "gamma" || out(3L) == "filler")
  }

  test("packSequences: bins advance once the window fills, per shard") {
    // 10 docs of 1000 tokens each in one shard → cum 1000..10000, window
    // 2048: doc k (1-based) has bin = floor((k-1)*1000/2048)
    val text = Seq.fill(1000)("w").mkString(" ")
    val df = (0 until 10).map(i => (i * 8L, text)).toDF("doc_id", "text") // all shard 0
    val out = Curation.packSequences(df, "doc_id", "text", 2048, shards = 8)
      .orderBy("doc_id").collect()
    assert(out.forall(_.getAs[Long]("shard") == 0L))
    val bins = out.map(_.getAs[Long]("bin")).toSeq
    assert(bins == (0 until 10).map(k => (k * 1000L) / 2048).toSeq)
    // bins are dense and monotone
    assert(bins.sliding(2).forall(p => p(1) - p(0) <= 1 && p(1) >= p(0)))
  }

  test("bloomFilteredJoin equals the plain join exactly") {
    val probe = (1L to 1000L).map(k => (k, s"p$k")).toDF("pk", "pv")
    val build = Seq((10L, "a"), (500L, "b"), (999L, "c")).toDF("bk", "bv")
    val got = Joins.bloomFilteredJoin(probe, build, "pk", "bk", expectedKeys = 10)
      .select("pk", "bk", "pv", "bv").collect().sortBy(_.getLong(0))
    val want = probe.join(build, col("pk") === col("bk"))
      .select("pk", "bk", "pv", "bv").collect().sortBy(_.getLong(0))
    assert(got.toSeq == want.toSeq)
    assert(got.length == 3)
  }

  test("linearQualityScore: integer logit from lexical features; filter cuts at threshold") {
    val docs = Seq(
      (1L, "a clean sentence with several proper words here"), // high quality
      (2L, "buy now!!! 1234567890 !!!"),                       // spam shape
      (3L, "")                                                  // empty
    ).toDF("doc_id", "text")
    val w = Curation.QualityWeights(words = 2, chars = 1, exclaim = -50,
      digits = -10, bias = 0)
    val scored = Curation.linearQualityScore(docs, "doc_id", "text", w)
      .select("doc_id", "n_words", "n_exclaim", "n_digits", "logit")
      .as[(Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    val (_, w1, e1, d1, l1) = scored(1L)
    val chars1 = "a clean sentence with several proper words here".length
    assert(w1 == 8 && e1 == 0 && d1 == 0 && l1 == 2 * 8 + chars1)
    val (_, w2, e2, d2, l2) = scored(2L)
    assert(w2 == 4 && e2 == 6 && d2 == 10)
    assert(l2 == 2 * 4 + 25 - 50 * 6 - 10 * 10)
    assert(scored(3L)._5 == 0L)
    val kept = Curation.linearQualityFilter(docs, "doc_id", "text", w, threshold = 1)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(1L), s"only the clean doc clears the cut: $kept")
  }

  test("perceptronTrain: integer batch updates separate a planted " +
      "labeled set; n_wrong shrinks; deterministic") {
    // +1: wordy clean docs; -1: digit/exclaim spam — linearly separable
    // on the (words, digits, exclaim) features
    val docs = ((1 to 10).map(i =>
        (i.toLong,
          s"clean sentence number with many plain words here now $i word",
          1L)) ++
      (1 to 10).map(i => (i + 100L, s"!!! 99$i 88 !!! 77", -1L)))
      .toDF("doc_id", "text", "label")
    val hist = Curation.perceptronTrain(docs, "label", "text", iters = 4)
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect()
      .sortBy(_._1)
    assert(hist.length == 4)
    // iteration 1 sees everything misclassified (zero weights, margin 0)
    assert(hist.head._2 == 20L, s"iter-1 n_wrong: ${hist.head._2}")
    // training improves: the last round misclassifies fewer than the first
    assert(hist.last._2 < hist.head._2,
      s"n_wrong must shrink: ${hist.map(_._2).toSeq}")
    // deterministic: integer arithmetic, same history every run
    val again = Curation.perceptronTrain(docs, "label", "text", iters = 4)
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(again.toSeq == hist.toSeq)
    // the final weights actually separate the planted set
    val (_, _, ww, wc, we, wd, wb) = hist.last
    val kept = Curation.linearQualityFilter(docs, "doc_id", "text",
        Curation.QualityWeights(ww, wc, we, wd, wb), threshold = 1)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == (1L to 10L).toSet,
      s"learned gate keeps exactly the clean docs: $kept")
    intercept[IllegalArgumentException](
      Curation.perceptronTrain(docs, "label", "text", iters = 0))
  }

  test("canonicalizeUrl: host case/port/tracking/fragment/slash variants collapse") {
    val urls = Seq(
      (1L, "https://Example.COM:443/Path/To/Page/?utm_source=a&utm_medium=b"),
      (2L, "https://example.com/Path/To/Page/"),
      (3L, "https://example.com/Path/To/Page?fbclid=xyz#section-2"),
      (4L, "http://Host.NET:80/a?keep=1&utm_campaign=x&also=2"),
      (5L, "not a url at all"),
      (6L, "https://example.com/")
    ).toDF("id", "url")
    val out = urls.select($"id", Curation.canonicalizeUrl($"url").as("c"))
      .as[(Long, String)].collect().toMap
    assert(out(1L) == "https://example.com/Path/To/Page")
    assert(out(2L) == out(1L) && out(3L) == out(1L),
      s"variants must collapse: ${out(1L)} / ${out(2L)} / ${out(3L)}")
    // mid-query tracking param removed, real params kept in order
    assert(out(4L) == "http://host.net/a?keep=1&also=2", out(4L))
    // non-URL strings pass through un-mangled (no host match -> rest only)
    assert(out(5L) == "not a url at all")
    assert(out(6L) == "https://example.com")
  }

  test("canonicalizeUrl: delimiter-anchored tracking match and ?-promotion") {
    val urls = Seq(
      // tracking name as a SUBSTRING of a longer param — must NOT match
      (1L, "https://example.com/p?xutm_source=1&b=2"),
      // leading run of tracking params consumes the '?' — first real
      // param is promoted back to '?'
      (2L, "https://example.com/p?utm_source=a&utm_medium=b&x=1"),
      // raw '&' in a query-less path is never rewritten
      (3L, "https://example.com/a&b"),
      // full run, nothing left -> no dangling delimiter
      (4L, "https://example.com/p?utm_source=a&utm_medium=b&utm_campaign=c")
    ).toDF("id", "url")
    val out = urls.select($"id", Curation.canonicalizeUrl($"url").as("c"))
      .as[(Long, String)].collect().toMap
    assert(out(1L) == "https://example.com/p?xutm_source=1&b=2", out(1L))
    assert(out(2L) == "https://example.com/p?x=1", out(2L))
    assert(out(3L) == "https://example.com/a&b", out(3L))
    assert(out(4L) == "https://example.com/p", out(4L))
  }

  test("adjacentChunkPairs: consecutive windows pair up, last chunk unpaired") {
    // 7 tokens, chunkTokens=3 -> chunks [t1 t2 t3][t4 t5 t6][t7] -> 2 pairs
    val docs = Seq((1L, "t1 t2 t3 t4 t5 t6 t7"), (2L, "a b")) // doc 2: 1 chunk, 0 pairs
      .toDF("doc_id", "text")
    val pairs = Curation.adjacentChunkPairs(docs, "doc_id", "text", chunkTokens = 3)
      .orderBy("doc_id", "idx").collect()
    assert(pairs.length == 2 && pairs.forall(_.getLong(0) == 1L))
    assert(pairs.map(_.getLong(1)).toSeq == Seq(0L, 1L))
    // digest chain property: pair i's next_digest == pair i+1's chunk_digest
    assert(pairs(0).getString(3) == pairs(1).getString(2))
  }

  test("blocklistFilter: dot-boundary suffix semantics, not substring LIKE") {
    val docs = Seq(
      (1L, "site.com"),          // exact match -> blocked
      (2L, "a.cdn.site.com"),    // subdomain -> blocked
      (3L, "evilsite.com"),      // substring but NOT a dot suffix -> kept
      (4L, "site.com.evil.org"), // blocked name as a PREFIX label -> kept
      (5L, "clean.org")          // unrelated -> kept
    ).toDF("id", "host")
    val block = Seq("site.com").toDF("blocked")
    val kept = Curation.blocklistFilter(docs, "id", "host", block, "blocked")
      .select("id").as[Long].collect().toSet
    assert(kept == Set(3L, 4L, 5L), s"kept: $kept")
    // the blocklist side broadcasts; the corpus side never shuffles
    val plan = Curation.blocklistFilter(docs, "id", "host", block, "blocked")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastQueryStage"),
      s"blocklist must broadcast:\n$plan")
  }

  test("contamination broadcasts the eval gram set (scale contract)") {
    val df = (1L to 60L).map(i => (i, s"token$i words go here padding out five grams minimum"))
      .toDF("doc_id", "text")
    val plan = Curation.contamination(df, "doc_id", "text",
      isEval = col("doc_id") % 50 === 0).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastExchange") || plan.contains("BroadcastQueryStage"),
      s"eval gram side should broadcast:\n$plan")
  }

  test("repeatedSpanStats: shared spans found, overlaps merge, clean docs 0/0") {
    // docs 1 and 2 share two overlapping 3-gram windows ("a b c", "b c d"
    // at positions 1,2) -> ONE merged span covering tokens 1..5 (4 tokens);
    // doc 3 shares nothing
    val df = Seq(
      (1L, "x a b c d y"),
      (2L, "z a b c d w"),
      (3L, "p q r s t u"))
      .toDF("doc_id", "text")
    val got = Curation.repeatedSpanStats(df, "doc_id", "text", k = 3, minDocs = 2)
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    assert(got == Map(
      1L -> ((6L, 4L, 1L)),   // 6 tokens, span [1,5) = 4 tokens, 1 span
      2L -> ((6L, 4L, 1L)),
      3L -> ((6L, 0L, 0L))), got.toString)
    // two DISJOINT shared regions stay two spans
    val df2 = Seq(
      (1L, "a b c XX d e f"),
      (2L, "a b c YY d e f"))
      .toDF("doc_id", "text")
    val got2 = Curation.repeatedSpanStats(df2, "doc_id", "text", k = 3, minDocs = 2)
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    assert(got2 == Map(1L -> ((7L, 6L, 2L)), 2L -> ((7L, 6L, 2L))), got2.toString)
  }

  test("repeatedSpanStatsMultiK: a planted 40-token repeat is ONE span, " +
      "not per-window or per-k") {
    // 40 shared tokens: k=8 alone yields 33 overlapping windows, k=16
    // another 25, k=32 another 9 — 67 hit intervals across three sizes
    // that must merge to exactly one 40-token span per doc
    val repeat = (0 until 40).map(i => s"tok$i").mkString(" ")
    val df = Seq(
      (1L, s"alpha $repeat omega"),
      (2L, s"beta gamma $repeat delta"),
      (3L, "unrelated words only here"))
      .toDF("doc_id", "text")
    val got = Curation.repeatedSpanStatsMultiK(df, "doc_id", "text",
        ks = Seq(8, 16, 32), minDocs = 2)
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    assert(got == Map(
      1L -> ((42L, 40L, 1L)),
      2L -> ((43L, 40L, 1L)),
      3L -> ((4L, 0L, 0L))), got.toString)
    // single-k delegates through the multi-k path: same answer at k=8
    val single = Curation.repeatedSpanStats(df, "doc_id", "text", k = 8)
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    assert(single(1L) == ((42L, 40L, 1L)), single.toString)
    // a repeat visible only to the SMALL window (length 10 < 16) is
    // still recalled by the union
    val df3 = Seq(
      (1L, "a0 a1 a2 a3 a4 a5 a6 a7 a8 a9 filler1"),
      (2L, "a0 a1 a2 a3 a4 a5 a6 a7 a8 a9 filler2"))
      .toDF("doc_id", "text")
    val got3 = Curation.repeatedSpanStatsMultiK(df3, "doc_id", "text",
        ks = Seq(8, 16), minDocs = 2)
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    assert(got3 == Map(1L -> ((11L, 10L, 1L)), 2L -> ((11L, 10L, 1L))),
      got3.toString)
  }

  test("kAnonymityRisk: only sub-k groups flagged, group size attached") {
    val df = Seq(
      (1L, "en", "web"), (2L, "en", "web"), (3L, "en", "web"),
      (4L, "de", "web"),                       // singleton -> risky
      (5L, "en", "pdf"), (6L, "en", "pdf"))    // pair -> risky at k=3
      .toDF("id", "lang", "source")
    val risky = Curation.kAnonymityRisk(df, Seq("lang", "source"), k = 3)
      .select("id", "group_n").as[(Long, Long)].collect().toMap
    assert(risky == Map(4L -> 1L, 5L -> 2L, 6L -> 2L), risky.toString)
    // k = 2: only the singleton remains; a k-anonymous corpus is empty
    assert(Curation.kAnonymityRisk(df, Seq("lang", "source"), k = 2)
      .select("id").as[Long].collect().toSeq == Seq(4L))
    intercept[IllegalArgumentException] {
      Curation.kAnonymityRisk(df, Seq("lang"), k = 1)
    }
  }

  test("kAnonymityRisk: NULL quasi-identifier values are flagged too") {
    // A unique null-keyed row is itself re-identifiable; a plain
    // equality join-back would silently pass it (round-6 ADVICE).
    val df = Seq(
      (1L, Some("en"), "web"), (2L, Some("en"), "web"), (3L, Some("en"), "web"),
      (4L, None, "web"))                       // null lang, singleton
      .toDF("id", "lang", "source")
    val risky = Curation.kAnonymityRisk(df, Seq("lang", "source"), k = 2)
      .select("id", "group_n").as[(Long, Long)].collect().toMap
    assert(risky == Map(4L -> 1L), risky.toString)
    // and a null group of size >= k is NOT flagged
    val df2 = df.union(Seq((5L, Option.empty[String], "web")).toDF("id", "lang", "source"))
    assert(Curation.kAnonymityRisk(df2, Seq("lang", "source"), k = 2).count() == 0)
  }

  test("lDiversityRisk: a big group with one sensitive value still leaks") {
    val df = Seq(
      // group (en, web): 4 rows — k-anonymous at k=3 — but one diagnosis
      (1L, "en", "web", "flu"), (2L, "en", "web", "flu"),
      (3L, "en", "web", "flu"), (4L, "en", "web", "flu"),
      // group (de, web): 2 distinct sensitive values -> passes l=2
      (5L, "de", "web", "flu"), (6L, "de", "web", "cold"))
      .toDF("id", "lang", "source", "dx")
    val risky = Curation.lDiversityRisk(df, Seq("lang", "source"), "dx", l = 2)
      .select("id").as[Long].collect().toSet
    assert(risky == Set(1L, 2L, 3L, 4L), s"uniform-dx group must flag: $risky")
    intercept[IllegalArgumentException] {
      Curation.lDiversityRisk(df, Seq("lang"), "dx", l = 1)
    }
  }

  test("tClosenessRisk: skewed groups flag with exact tv_pm, the " +
      "globally-proportioned group stays silent, strict threshold") {
    // global dx: 6 flu, 6 cold (50/50). Groups g1 all-flu and g2
    // all-cold sit at TV = 1/2 (tv_pm 500); g3 mirrors the global
    // 50/50 exactly (TV = 0).
    val df = Seq(
      (1L, "g1", "flu"), (2L, "g1", "flu"), (3L, "g1", "flu"),
      (4L, "g1", "flu"),
      (5L, "g2", "cold"), (6L, "g2", "cold"), (7L, "g2", "cold"),
      (8L, "g2", "cold"),
      (9L, "g3", "flu"), (10L, "g3", "flu"),
      (11L, "g3", "cold"), (12L, "g3", "cold"))
      .toDF("id", "grp", "dx")
    val risky = Curation.tClosenessRisk(df, Seq("grp"), "dx", 1, 4)
      .select("id", "group_n", "tv_pm")
      .as[(Long, Long, Long)].collect().toSet
    assert(risky == (1L to 8L).map(i => (i, 4L, 500L)).toSet,
      s"both skewed groups flag at tv 500: $risky")
    // threshold is strict >: a group AT tv = 1/2 passes t = 1/2
    assert(Curation.tClosenessRisk(df, Seq("grp"), "dx", 1, 2)
      .count() == 0L)
    // NULL sensitive values are their own category, not dropped
    val withNull = Seq(
      (1L, "a", Option.empty[String]), (2L, "a", Option.empty[String]),
      (3L, "b", Some("flu")), (4L, "b", Some("flu")))
      .toDF("id", "grp", "dx")
    val flaggedNull = Curation.tClosenessRisk(withNull, Seq("grp"), "dx",
      1, 4).select("id").as[Long].collect().toSet
    assert(flaggedNull == Set(1L, 2L, 3L, 4L),
      s"all-null and all-flu groups are both TV=1/2 off global: $flaggedNull")
    intercept[IllegalArgumentException] {
      Curation.tClosenessRisk(df, Seq("grp"), "dx", 3, 2)
    }
  }

  test("disparateImpact: 4/5-rule flags the disadvantaged group, " +
      "rate-tie reference picks the smallest name, zero-selection edge") {
    def rows(g: String, sel: Int, unsel: Int) =
      Seq.fill(sel)((g, true)) ++ Seq.fill(unsel)((g, false))
    // a: 8/10 (800‰), c: 4/5 (800‰ — ties a, 'a' wins by name),
    // b: 3/10 (375 vs ref → flagged), d: 0/2 (di 0 → flagged)
    val df = (rows("a", 8, 2) ++ rows("b", 3, 7) ++ rows("c", 4, 1) ++
      rows("d", 0, 2)).toDF("grp", "sel")
    val got = Curation.disparateImpact(df, "grp", "sel")
      .select("grp", "rate_pm", "ref_grp", "di_pm", "flagged")
      .as[(String, Long, String, Long, Boolean)].collect().toSet
    assert(got == Set(
      ("a", 800L, "a", 1000L, false), ("b", 300L, "a", 375L, true),
      ("c", 800L, "a", 1000L, false), ("d", 0L, "a", 0L, true)),
      s"got $got")
    // every group zero-selected: vacuously fair, nothing flags
    val allZero = (rows("x", 0, 3) ++ rows("y", 0, 2)).toDF("grp", "sel")
    assert(Curation.disparateImpact(allZero, "grp", "sel")
      .filter(col("flagged")).count() == 0L)
  }

  test("subjectExport: per-table counts + order-insensitive digests, " +
      "non-subjects excluded, digest blind to scan order") {
    val subjects = Seq(1L).toDF("subject_id")
    val tbl = Seq((1L, "r1"), (1L, "r2"), (2L, "r3"))
      .toDF("subject_id", "repr")
    val got = Curation.subjectExport(Seq(("t", tbl)), subjects)
      .select("subject_id", "table_name", "n_rows", "digest")
      .as[(Long, String, Long, String)].collect().toSeq
    assert(got.map(t => (t._1, t._2, t._3)) == Seq((1L, "t", 2L)))
    // reversed input order → identical digest (sorted before hashing)
    val rev = Curation.subjectExport(Seq(("t",
      Seq((1L, "r2"), (1L, "r1")).toDF("subject_id", "repr"))), subjects)
      .select("digest").as[String].head()
    assert(rev == got.head._4, "digest must not depend on row order")
    // different content → different digest
    val other = Curation.subjectExport(Seq(("t",
      Seq((1L, "r1"), (1L, "rX")).toDF("subject_id", "repr"))), subjects)
      .select("digest").as[String].head()
    assert(other != got.head._4)
    intercept[IllegalArgumentException] {
      Curation.subjectExport(Nil, subjects)
    }
  }

  test("tClosenessOrderedRisk: extreme-band mass travels farther than " +
      "middle-band mass (TV is blind to the difference), exact emd_pm") {
    // global bands 1/2/3 uniform (2 each). A sits at band 3, B at
    // band 1 (both EMD 500‰), D at band 2 (EMD 333‰) — all three have
    // IDENTICAL total variation 667‰, only the ordered metric ranks
    // the extremes as farther.
    val df = Seq(
      (1L, "A", 3L), (2L, "A", 3L),
      (3L, "B", 1L), (4L, "B", 1L),
      (5L, "D", 2L), (6L, "D", 2L))
      .toDF("id", "grp", "band")
    val risky = Curation.tClosenessOrderedRisk(df, Seq("grp"), "band",
        tNum = 2, tDen = 5)
      .select("id", "grp", "group_n", "emd_pm")
      .as[(Long, String, Long, Long)].collect().toSet
    assert(risky == Set((1L, "A", 2L, 500L), (2L, "A", 2L, 500L),
      (3L, "B", 2L, 500L), (4L, "B", 2L, 500L)), s"got $risky")
    // the unordered audit flags D too — same TV, no order information
    val tvFlagged = Curation.tClosenessRisk(df, Seq("grp"), "band", 2, 5)
      .select("grp").distinct().as[String].collect().toSet
    assert(tvFlagged == Set("A", "B", "D"),
      s"TV treats all three groups alike: $tvFlagged")
    // NULL sensitive rows are excluded from both distributions
    val withNull = df.unionByName(
      Seq((7L, "A", Option.empty[Long])).toDF("id", "grp", "band"))
    val sameAsBefore = Curation.tClosenessOrderedRisk(withNull,
        Seq("grp"), "band", 2, 5)
      .select("id", "grp", "group_n", "emd_pm")
      .as[(Long, String, Long, Long)].collect().toSet
    assert(sameAsBefore == risky, "null band must not shift the audit")
    intercept[IllegalArgumentException] {
      Curation.tClosenessOrderedRisk(
        Seq((1L, "A", 5L)).toDF("id", "grp", "band"), Seq("grp"),
        "band", 1, 4) // single distinct value: no ordered domain
    }
  }

  test("cohenKappa: textbook 2x2 case exact, perfect agreement 1000, " +
      "chance-level 0, degenerate single-label 1000") {
    // classic example: n=100, agree=70, margins A (50,50), B (60,40)
    // → pe = 0.5, kappa = (0.7-0.5)/0.5 = 0.4 → 400 pm
    def rep(a: String, b: String, k: Int) = Seq.fill(k)((a, b))
    val df = (rep("y", "y", 40) ++ rep("y", "n", 10) ++
      rep("n", "y", 20) ++ rep("n", "n", 30)).toDF("a", "b")
    val got = Curation.cohenKappa(df, "a", "b")
      .select("label_a", "label_b", "n_pair", "n", "n_agree", "kappa_pm")
      .as[(String, String, Long, Long, Long, Long)].collect().toSet
    assert(got == Set(
      ("y", "y", 40L, 100L, 70L, 400L), ("y", "n", 10L, 100L, 70L, 400L),
      ("n", "y", 20L, 100L, 70L, 400L), ("n", "n", 30L, 100L, 70L, 400L)),
      s"got $got")
    // perfect agreement
    val perfect = (rep("y", "y", 3) ++ rep("n", "n", 2)).toDF("a", "b")
    assert(Curation.cohenKappa(perfect, "a", "b")
      .select("kappa_pm").distinct().as[Long].head() == 1000L)
    // statistical independence → kappa 0 (25/25/25/25)
    val indep = (rep("y", "y", 25) ++ rep("y", "n", 25) ++
      rep("n", "y", 25) ++ rep("n", "n", 25)).toDF("a", "b")
    assert(Curation.cohenKappa(indep, "a", "b")
      .select("kappa_pm").distinct().as[Long].head() == 0L)
    // both annotators always say the same single label: pe = 1 →
    // degenerate, reported as full agreement
    val one = rep("y", "y", 5).toDF("a", "b")
    assert(Curation.cohenKappa(one, "a", "b")
      .select("kappa_pm").distinct().as[Long].head() == 1000L)
  }

  test("bradleyTerryScores: symmetric pair stays at scale; 3:1 wins" +
      " converge to a 3:1 score ratio; zero-win model rejected") {
    // two models, 4 comparisons, A wins 3: MM fixed point is s_A/s_B = 3
    val df = Seq((1L, 2L, 3L, 1L)).toDF("a", "b", "wa", "wb")
    val s = Curation.bradleyTerryScores(df, "a", "b", "wa", "wb", iters = 5)
      .as[(Long, Long)].collect().toMap
    assert(s == Map(1L -> 1500000L, 2L -> 500000L), s"got $s")
    // symmetric wins: both sit at the initial scale forever
    val sym = Curation.bradleyTerryScores(
        Seq((7L, 9L, 2L, 2L)).toDF("a", "b", "wa", "wb"),
        "a", "b", "wa", "wb", iters = 5)
      .as[(Long, Long)].collect().toMap
    assert(sym == Map(7L -> 1000000L, 9L -> 1000000L))
    // a model that never wins would zero out and then divide by zero —
    // rejected loudly instead
    intercept[IllegalArgumentException] {
      Curation.bradleyTerryScores(
        Seq((1L, 2L, 4L, 0L)).toDF("a", "b", "wa", "wb"),
        "a", "b", "wa", "wb")
    }
    // reversed column order canonicalizes to the same matrix
    val rev = Curation.bradleyTerryScores(
        Seq((2L, 1L, 1L, 3L)).toDF("a", "b", "wa", "wb"),
        "a", "b", "wa", "wb", iters = 5)
      .as[(Long, Long)].collect().toMap
    assert(rev == s)
  }

  test("fuzzyContamination: verbatim flags at 1.0, light edit flags above" +
      " threshold, unrelated text never pairs; >= boundary is inclusive") {
    val evalText = (1 to 40).map(i => s"w$i").mkString(" ")
    // light edit: one token swapped mid-document (kills 3 of 38 shingles)
    val edited = (1 to 40).map(i => if (i == 20) "zzq" else s"w$i").mkString(" ")
    val unrelated = (1 to 40).map(i => s"u$i").mkString(" ")
    val docs = Seq(
      (1L, evalText),   // the eval row (stored side)
      (10L, evalText),  // verbatim leak
      (11L, edited),    // fuzzy leak
      (12L, unrelated)  // clean
    ).toDF("doc_id", "text")
    val out = Curation.fuzzyContamination(docs, "doc_id", "text",
        isEval = col("doc_id") === 1, minAgree = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val byId = out.groupBy(_._1)
    assert(byId(10L).head._3 == 1.0, s"verbatim: ${byId.get(10L)}")
    assert(byId(11L).head._3 >= 0.5, s"edited: ${byId.get(11L)}")
    assert(!byId.contains(12L), s"unrelated paired: ${byId.get(12L)}")
    // boundary: minAgree exactly at the edited doc's agreement still flags
    // (>= not >), and just above it drops the doc
    val agree = byId(11L).head._3
    val atBoundary = Curation.fuzzyContamination(docs, "doc_id", "text",
        isEval = col("doc_id") === 1, minAgree = agree)
      .collect().map(_.getLong(0)).toSet
    assert(atBoundary.contains(11L))
    val above = Curation.fuzzyContamination(docs, "doc_id", "text",
        isEval = col("doc_id") === 1, minAgree = agree + 1e-6)
      .collect().map(_.getLong(0)).toSet
    assert(!above.contains(11L) && above.contains(10L))
  }

  test("semanticContamination: paraphrase-close vectors flag, orthogonal " +
      "ones don't; eval side broadcasts") {
    val train = Seq(
      (1L, Seq(1f, 0f, 0f, 0f)),          // == eval 100
      (2L, Seq(0.9f, 0.1f, 0f, 0f)),      // close to eval 100
      (3L, Seq(0f, 0f, 1f, 0f)))          // orthogonal
      .toDF("vec_id", "embedding")
      .select($"vec_id", $"embedding".cast("array<float>").as("embedding"))
    val eval = Seq((100L, Seq(1f, 0f, 0f, 0f)))
      .toDF("vec_id", "embedding")
      .select($"vec_id", $"embedding".cast("array<float>").as("embedding"))
    val got = Curation.semanticContamination(train, eval,
        "vec_id", "embedding", minCos = 0.9)
      .as[(Long, Long, Double)].collect().sortBy(_._1)
    assert(got.map(_._1).toSeq == Seq(1L, 2L), got.toSeq.toString)
    assert(got.head._3 == 1.0)
    assert(got.forall(_._2 == 100L))
    // scale contract: the eval table is the broadcast side
    val plan = Curation.semanticContamination(train, eval,
        "vec_id", "embedding", 0.9).queryExecution.executedPlan.toString
    assert(plan.contains("Broadcast"), s"eval must broadcast:\n$plan")
  }

  test("semanticContamination mode=ivf: candidate-stream pairs are a " +
      "subset of brute, planted duplicates are caught, and the plan has " +
      "no cross join and no data-proportional broadcast hint") {
    // 12 train vectors in two well-separated cones so a 2-cell IVF fit
    // separates them; eval = two of the train vectors verbatim (the
    // contamination planted), which the nearest-probe cell always holds
    val train = (0 until 12).map { i =>
      val base = if (i % 2 == 0) Seq(1f, 0.1f * (i / 2), 0f, 0f)
                 else Seq(0f, 0f, 1f, 0.1f * (i / 2))
      (i.toLong, base)
    }.toDF("vec_id", "embedding")
      .select($"vec_id", $"embedding".cast("array<float>").as("embedding"))
    val eval = Seq((100L, Seq(1f, 0f, 0f, 0f)), (101L, Seq(0f, 0f, 1f, 0f)))
      .toDF("vec_id", "embedding")
      .select($"vec_id", $"embedding".cast("array<float>").as("embedding"))
    val pruned = Curation.semanticContamination(train, eval,
      "vec_id", "embedding", minCos = 0.9, mode = "ivf",
      nCentroids = 2, nProbe = 1)
    val brute = Curation.semanticContamination(train, eval,
        "vec_id", "embedding", minCos = 0.9)
      .as[(Long, Long, Double)].collect().toSet
    val got = pruned.as[(Long, Long, Double)].collect().toSet
    assert(got.subsetOf(brute),
      s"pruned must never emit a pair brute rejects: ${got -- brute}")
    // the verbatim duplicates (cos = 1.0) land in the eval row's own
    // nearest cell, so even nProbe = 1 catches them
    assert(got.exists(p => p._1 == 0L && p._2 == 100L && p._3 == 1.0), got)
    assert(got.exists(p => p._1 == 1L && p._2 == 101L && p._3 == 1.0), got)
    // scale contract: candidates flow through a centroid equi-join —
    // no cross join, no broadcast HINT on either corpus-sized side
    // (a runtime size-based broadcast-hash pick by AQE is fine; a
    // compile-time hint or a cartesian would not survive 100 TB)
    import org.apache.spark.sql.catalyst.plans.logical.{Join, ResolvedHint}
    val qe = pruned.queryExecution
    val hints = qe.analyzed.collect { case h: ResolvedHint => h }
    assert(hints.isEmpty, s"no broadcast hint allowed: $hints")
    val joins = qe.optimizedPlan.collect { case j: Join => j }
    assert(joins.nonEmpty && joins.forall(_.condition.isDefined),
      "every join must be an equi-join with a condition")
    val phys = qe.executedPlan.toString
    assert(!phys.contains("CartesianProduct") &&
      !phys.contains("BroadcastNestedLoopJoin"),
      s"corpus x corpus must not plan a cartesian:\n$phys")
  }

  test("dsirSelect: raw docs resembling the target corpus win the " +
      "budget, off-distribution docs score lower and miss it; exactly " +
      "budget docs select; guards") {
    def clean(i: Int) = (0 until 30)
      .map(j => s"word${('a' + (i + j) % 13).toChar}ing").mkString(" ")
    val raw = ((1 to 10).map(i => (i.toLong, clean(i))) ++
      (11 to 15).map(i =>
        (i.toLong, clean(i).replaceAll("[aeiou]", "z"))))
      .toDF("doc_id", "text")
    val target = (101 to 103).map(i => (i.toLong, clean(i + 7)))
      .toDF("doc_id", "text")
    val got = Curation.dsirSelect(raw, target, "doc_id", "text",
        budgetDocs = 10)
      .as[(Long, Long, Long, Long)].collect()
    assert(got.length == 15 && got.count(_._4 == 1L) == 10)
    val sel = got.filter(_._4 == 1L).map(_._1).toSet
    assert(sel == (1L to 10L).toSet,
      s"clean docs must out-rank the mangled: $sel")
    // every selected weight >= every unselected weight (rank cut)
    val minSel = got.filter(_._4 == 1L).map(_._2).min
    assert(got.filter(_._4 == 0L).forall(_._2 <= minSel))
    intercept[IllegalArgumentException] {
      Curation.dsirSelect(raw, target, "doc_id", "text", 0)
    }
  }

  test("spanCorrupt: sentinels number left-to-right, target carries the " +
      "masked tokens, unmasked text survives in order, deterministic") {
    val df = Seq((1L, (0 until 12).map(i => s"t$i").mkString(" ")),
      (2L, ""), (3L, "solo")).toDF("doc_id", "text")
    val got = Curation.spanCorrupt(df, "doc_id", "text",
        spanLen = 3, maskPm = 1000) // every span masks
      .as[(Long, String, String, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got(1L) == (("<extra_id_0> <extra_id_1> <extra_id_2> <extra_id_3>",
      "<extra_id_0> t0 t1 t2 <extra_id_1> t3 t4 t5 " +
        "<extra_id_2> t6 t7 t8 <extra_id_3> t9 t10 t11", 4L)), got.toString)
    assert(got(2L) == (("", "", 0L)))
    assert(got(3L) == (("<extra_id_0>", "<extra_id_0> solo", 1L)),
      "a short tail span still masks whole")
    val none = Curation.spanCorrupt(df, "doc_id", "text",
        spanLen = 3, maskPm = 0) // nothing masks
      .as[(Long, String, String, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(none(1L)._1 == (0 until 12).map(i => s"t$i").mkString(" "))
    assert(none(1L)._2 == "" && none(1L)._3 == 0L)
    // reconstruction invariant at any rate: interleaving input's
    // sentinels with target spans rebuilds the original token stream
    val mid = Curation.spanCorrupt(df, "doc_id", "text",
        spanLen = 3, maskPm = 400)
      .as[(Long, String, String, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    val (in1, tg1) = mid(1L)
    val rebuilt = in1.split(" ").filter(_.nonEmpty).flatMap { tok =>
      if (tok.startsWith("<extra_id_")) {
        val k = tok.stripPrefix("<extra_id_").stripSuffix(">")
        val seg = tg1.split("<extra_id_").find(_.startsWith(k + ">"))
          .get.stripPrefix(k + ">").trim
        seg.split(" ").filter(_.nonEmpty)
      } else Array(tok)
    }.mkString(" ")
    assert(rebuilt == (0 until 12).map(i => s"t$i").mkString(" "),
      s"sentinel interleave must reconstruct: $rebuilt")
    val again = Curation.spanCorrupt(df, "doc_id", "text", 3, 400)
      .as[(Long, String, String, Long)].collect().toSet
    assert(again == Curation.spanCorrupt(df, "doc_id", "text", 3, 400)
      .as[(Long, String, String, Long)].collect().toSet, "no RNG anywhere")
  }

  test("removeRepeatedSpans: shared span excised from BOTH docs, clean doc " +
      "untouched, fully-covered doc becomes empty") {
    val df = Seq(
      (1L, "x a b c d y"),        // shares "a b c d" (merged span [1,5))
      (2L, "z a b c d w"),
      (3L, "p q r s t u"),        // clean
      (4L, "e f g"), (5L, "e f g")) // fully covered at k=3
      .toDF("doc_id", "text")
    val got = Curation.removeRepeatedSpans(df, "doc_id", "text",
        k = 3, minDocs = 2)
      .as[(Long, String, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got(1L) == (("x y", 6L, 2L)), got.toString)
    assert(got(2L) == (("z w", 6L, 2L)), got.toString)
    assert(got(3L) == (("p q r s t u", 6L, 6L)), got.toString)
    assert(got(4L) == (("", 3L, 0L)), got.toString)
    assert(got(5L) == (("", 3L, 0L)), got.toString)
  }

  test("removeRepeatedSpans agrees with repeatedSpanStats accounting") {
    val df = Seq(
      (1L, "a b c XX d e f"),
      (2L, "a b c YY d e f"),
      (3L, "lone words only here"))
      .toDF("doc_id", "text")
    val stats = Curation.repeatedSpanStats(df, "doc_id", "text",
        k = 3, minDocs = 2)
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    val removed = Curation.removeRepeatedSpans(df, "doc_id", "text",
        k = 3, minDocs = 2)
      .as[(Long, String, Long, Long)].collect()
    removed.foreach { case (id, text, n, keptN) =>
      val (total, rep) = stats(id)
      assert(n == total && keptN == total - rep,
        s"doc $id: kept $keptN != $total - $rep")
      assert(text.split(" ").filter(_.nonEmpty).length == keptN)
    }
    // the disjoint middle tokens survive
    val byId = removed.map(r => r._1 -> r._2).toMap
    assert(byId(1L) == "XX" && byId(2L) == "YY", byId.toString)
  }
}
