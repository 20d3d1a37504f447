package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class SuffixArraySpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("suffixRanks: hand corpus — round-0 token classes, doubling " +
      "resolves to a total order, sentinels stop cross-doc equality") {
    // doc 1: "a b a b"; doc 2: "b a b c"
    val docs = Seq((1L, "a b a b"), (2L, "b a b c")).toDF("doc_id", "text")
    val sr = SuffixArray.suffixRanks(docs, "doc_id", "text",
      rounds = 3, requireTotal = true)
    val r0 = sr.ranks(0).as[(Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    // token classes: sentinels " 1" < " 2" < "a" < "b" < "c"
    assert(r0((1L, 4L)) == 1L && r0((2L, 4L)) == 2L, "sentinels rank lowest")
    assert(r0((1L, 0L)) == r0((1L, 2L)) && r0((1L, 0L)) == r0((2L, 1L)),
      "all 'a' positions share a class")
    assert(r0((1L, 1L)) == r0((2L, 0L)), "all 'b' positions share a class")
    assert(r0((2L, 3L)) > r0((1L, 1L)), "'c' above 'b'")
    // rank_1: first-2-token classes — "a b" at (1,0), (1,2)... but
    // (1,2) is followed by "a b<sent>" vs (1,0) "a b a b": rank_1 only
    // sees 2 tokens, so (1,0), (1,2), (2,1) all match "a b"
    val r1 = sr.ranks(1).as[(Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(r1((1L, 0L)) == r1((1L, 2L)) && r1((1L, 0L)) == r1((2L, 1L)))
    assert(r1((1L, 1L)) != r1((2L, 2L)),
      "(1,1)='b a' and (2,2)='b c' must split at h=2")
    assert(r1((1L, 1L)) == r1((2L, 0L)), "'b a' at (1,1) and (2,0) match")
    // final round: every rank distinct (total order over 10 positions)
    val fin = sr.ranks(3).select("rank").as[Long].collect().sorted
    assert(fin.toSeq == (1L to 10L), s"dense total order, got ${fin.toSeq}")
  }

  test("heavy-hitter guard: corpus-wide boilerplate (one sentence in " +
      "EVERY doc) — salted distinct-count equals the unsalted aggregate " +
      "and the stats cover exactly the boilerplate") {
    // worst case for the (__ra, __rb) grouping: all 40 docs share the
    // same 14-token sentence, so its rank-pair groups each hold a
    // corpus-sized share of the positions
    val boiler = "please accept all cookies before reading anything " +
      "on this terrible website today thanks"
    val docs = (1L to 40L).map(i => (i, s"$boiler unique$i"))
      .toDF("doc_id", "text")
    val (_, keyed) = SuffixArray.rankPairKeys(docs, "doc_id", "text",
      minLen = 12)
    val salted = Skew.distinctCountPerKey(keyed, Seq("__ra", "__rb"),
        "doc_id", "__nd")
      .as[(Long, Long, Long)].collect().toSet
    val unsalted = keyed.groupBy("__ra", "__rb")
      .agg(countDistinct("doc_id").as("__nd"))
      .as[(Long, Long, Long)].collect().toSet
    assert(salted == unsalted)
    // end-to-end: every doc has 14 tokens (13 boilerplate + 1 unique
    // tail). L=12 starts need s+12 <= 14 → s ∈ {0,1,2}; start 2's
    // window includes the per-doc unique token, so it is NOT cross-doc;
    // starts 0 and 1 are shared by all docs → merged span [0, 13):
    // 13 covered tokens, 1 span
    val stats = SuffixArray.repeatedSpanStatsExact(docs, "doc_id",
        "text", minLen = 12)
      .as[(Long, Long, Long, Long)].collect()
    assert(stats.length == 40)
    assert(stats.forall { case (_, n, rep, spans) =>
      n == 14 && rep == 13 && spans == 1 })
  }

  test("segment-incremental contamination == full rebuild; the stored " +
      "segment artifact is digests only (text never re-read)") {
    val secret = "zero one two three four five six seven eight nine " +
      "ten eleven"
    val trainOnly = "shared train navigation boilerplate sentence with " +
      "twelve whole tokens here now"
    val docs = Seq(
      (100L, s"evalpad $secret"),
      (3L, s"alpha beta $secret gamma"),
      (10L, s"$secret delta"),
      (5L, trainOnly),
      (6L, s"$trainOnly also"),
      (7L, "completely unrelated text with plenty of tokens to stay " +
        "above the window size easily"))
      .toDF("doc_id", "text")
    val evalDocs = docs.filter($"doc_id" === 100L)
    val train = docs.filter($"doc_id" =!= 100L)
    val keys = SuffixArray.substrKeyTable(evalDocs, "doc_id", "text",
      minLen = 12)
    // the stored artifact: one digest column, nothing else — the API
    // cannot re-read segment text because it never receives any
    assert(keys.columns.toSeq == Seq("key"))
    val b1 = train.filter($"doc_id" <= 5)
    val b2 = train.filter($"doc_id" > 5)
    val inc = SuffixArray.exactSubstrContaminationIncremental(
        b1, keys, "doc_id", "text", minLen = 12)
      .unionByName(SuffixArray.exactSubstrContaminationIncremental(
        b2, keys, "doc_id", "text", minLen = 12))
      .as[(Long, Long, Long, Long)].collect().toSet
    val full = SuffixArray.exactSubstrContamination(docs, "doc_id",
        "text", isEval = $"doc_id" === 100L, minLen = 12)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(inc == full)
    // the secret flags in both its train hosts; the cross-batch
    // train-only boilerplate (docs 5/6) must NOT flag
    val byDoc = inc.map(r => r._1 -> r._3).toMap
    assert(byDoc(3L) == 12 && byDoc(10L) == 12)
    assert(byDoc(5L) == 0 && byDoc(6L) == 0 && byDoc(7L) == 0)
  }

  test("segment-incremental removal: eval-contaminated spans excise " +
      "from batch docs, kept_tokens == n_tokens - contaminated_tokens, " +
      "originals preserve case") {
    val secret = "zero one two three four five six seven eight nine " +
      "ten eleven"
    val docs = Seq(
      (100L, s"evalpad $secret"),
      (3L, s"Alpha beta $secret gamma"),
      (7L, "completely unrelated text with plenty of tokens to stay " +
        "above the window size easily"))
      .toDF("doc_id", "text")
    val evalDocs = docs.filter($"doc_id" === 100L)
    val batch = docs.filter($"doc_id" =!= 100L)
    val keys = SuffixArray.substrKeyTable(evalDocs, "doc_id", "text",
      minLen = 12)
    val removed = SuffixArray.removeContaminatedSpansIncremental(
        batch, keys, "doc_id", "text", minLen = 12)
      .as[(Long, String, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    // doc 3: the 12 secret tokens excise; survivors rejoin in order
    // with ORIGINAL case
    assert(removed(3L)._2 == "Alpha beta gamma")
    assert(removed(3L)._3 == 15 && removed(3L)._4 == 3)
    // doc 7: untouched
    assert(removed(7L)._4 == removed(7L)._3)
    // accounting pins the two incremental forms together
    val contam = SuffixArray.exactSubstrContaminationIncremental(
        batch, keys, "doc_id", "text", minLen = 12)
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    for ((id, (_, _, n, kept)) <- removed)
      assert(kept == n - contam(id)._3,
        s"doc $id: kept $kept != n $n - contaminated ${contam(id)._3}")
  }

  test("segment-incremental span stats == full rebuild restricted to " +
      "the batch; cross-segment support comes from stored counts alone") {
    val secret = "zero one two three four five six seven eight nine " +
      "ten eleven"
    val batchOnly = "batch local repeated filler sentence appears many " +
      "times within this batch yes"
    val docs = Seq(
      (1L, s"sealedpad $secret"),
      (2L, s"$secret sealedtail"),
      (11L, s"alpha $secret beta"),        // cross-segment: 2 sealed + 1 batch
      (12L, batchOnly),                    // batch-only pair
      (13L, s"$batchOnly indeed"),
      (14L, "entirely unrelated words that never repeat anywhere in " +
        "this corpus at all today"))
      .toDF("doc_id", "text")
    val sealedSeg = docs.filter($"doc_id" < 10)
    val batch = docs.filter($"doc_id" >= 10)
    val stats = SuffixArray.substrKeyStats(sealedSeg, "doc_id", "text",
      minLen = 12)
    assert(stats.columns.toSeq == Seq("key", "n_docs"))
    val inc = SuffixArray.repeatedSpanStatsIncremental(batch, stats,
        "doc_id", "text", minLen = 12)
      .as[(Long, Long, Long, Long)].collect().toSet
    val full = SuffixArray.repeatedSpanStatsExact(docs, "doc_id",
        "text", minLen = 12, minDocs = 2)
      .as[(Long, Long, Long, Long)].collect()
      .filter(_._1 >= 10).toSet
    assert(inc == full)
    val byDoc = inc.map(r => r._1 -> r._3).toMap
    assert(byDoc(11L) == 12, "cross-segment repeat flags via stored counts")
    assert(byDoc(12L) == 12 && byDoc(13L) == 12, "batch-only pair flags")
    assert(byDoc(14L) == 0)
  }

  test("compactKeyTables: segment partials fold to one row per key " +
      "behind a staged swap — file budget shrinks, read-backs and the " +
      "incremental decisions are IDENTICAL before and after") {
    val secret = "zero one two three four five six seven eight nine " +
      "ten eleven"
    val batchOnly = "batch local repeated filler sentence appears many " +
      "times within this batch yes"
    val docs = Seq(
      (1L, s"sealedpad $secret"),
      (2L, s"$secret sealedtail"),
      (3L, s"midpad $secret midtail"),
      (11L, s"alpha $secret beta"),
      (12L, batchOnly),
      (13L, s"$batchOnly indeed"),
      (14L, "entirely unrelated words that never repeat anywhere in " +
        "this corpus at all today"))
      .toDF("doc_id", "text")
    // three sealed segments (doc-disjoint), appended as three partials
    val segs = Seq(docs.filter($"doc_id" === 1),
      docs.filter($"doc_id" === 2), docs.filter($"doc_id" === 3))
    val batch = docs.filter($"doc_id" >= 10)
    val store = java.nio.file.Files
      .createTempDirectory("sa_keystats").toString + "/stats"
    segs.foreach(seg => SuffixArray.substrKeyStats(seg, "doc_id", "text",
      minLen = 12).coalesce(1).write.mode("append").parquet(store))
    def decide(stats: org.apache.spark.sql.DataFrame) =
      SuffixArray.repeatedSpanStatsIncremental(batch, stats,
        "doc_id", "text", minLen = 12)
        .as[(Long, Long, Long, Long)].collect().toSet
    val before = decide(spark.read.parquet(store))
    val wantMerged = SuffixArray.mergeKeyStats(
        segs.map(SuffixArray.substrKeyStats(_, "doc_id", "text", 12)))
      .as[(String, Long)].collect().toSet
    val (rb, ra, fb, fa) = SuffixArray.compactKeyTables(spark, store)
    assert(fb == 3 && fa == 1, s"file budget must shrink: $fb -> $fa")
    assert(ra < rb, "the shared secret's key must fold across segments")
    assert(spark.read.parquet(store).as[(String, Long)].collect().toSet ==
      wantMerged, "compacted store == pure merge")
    // the secret lives in all three segments: its folded count is 3
    assert(wantMerged.exists(_._2 == 3L),
      s"cross-segment key must re-sum to 3: $wantMerged")
    assert(decide(spark.read.parquet(store)) == before,
      "compaction must not change any admission decision")
    // idempotent second pass
    val (rb2, ra2, _, _) = SuffixArray.compactKeyTables(spark, store)
    assert(rb2 == ra && ra2 == ra)
    // the key-only form folds by distinct and decides identically too
    val kstore = java.nio.file.Files
      .createTempDirectory("sa_keytab").toString + "/keys"
    segs.foreach(seg => SuffixArray.substrKeyTable(seg, "doc_id", "text",
      minLen = 12).coalesce(1).write.mode("append").parquet(kstore))
    def contam(keys: org.apache.spark.sql.DataFrame) =
      SuffixArray.exactSubstrContaminationIncremental(batch, keys,
        "doc_id", "text", minLen = 12)
        .as[(Long, Long, Long, Long)].collect().toSet
    val cBefore = contam(spark.read.parquet(kstore))
    val (krb, kra, kfb, kfa) =
      SuffixArray.compactKeyTables(spark, kstore, hasCounts = false)
    assert(kfb == 3 && kfa == 1 && kra < krb)
    assert(contam(spark.read.parquet(kstore)) == cBefore)
  }

  test("repeatedSpanStatsExact: off-grid 12-token repeat that the " +
      "k=16 multi-k ladder misses; no false 13-length certificate; " +
      "same-doc repeats don't count toward minDocs") {
    val rep = (1 to 12).map(i => s"r$i").mkString(" ") // 12 shared tokens
    val docs = Seq(
      (1L, s"alpha beta $rep gamma"),
      (2L, s"delta $rep epsilon zeta"),
      (3L, "unrelated words only here"),
      // doc 4 repeats a 12-gram TWICE within itself but shares it with
      // no other doc — must not flag (minDocs counts DISTINCT docs)
      (4L, ((1 to 12).map(i => s"s$i").mkString(" ") + " mid " +
        (1 to 12).map(i => s"s$i").mkString(" "))))
      .toDF("doc_id", "text")
    // the k-grid stand-in with ks = {16} cannot see a 12-token repeat
    val multik = Curation.repeatedSpanStatsMultiK(docs, "doc_id", "text",
        ks = Seq(16), minDocs = 2)
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r._3).toMap
    assert(multik.values.forall(_ == 0L),
      s"k=16 ladder must miss the 12-token repeat: $multik")
    // the suffix-array pass catches it exactly
    val got = SuffixArray.repeatedSpanStatsExact(docs, "doc_id", "text",
        minLen = 12)
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got(1L) == ((15L, 12L, 1L)), s"doc1: ${got(1L)}")
    assert(got(2L) == ((15L, 12L, 1L)), s"doc2: ${got(2L)}")
    assert(got(3L) == ((4L, 0L, 0L)))
    assert(got(4L) == ((25L, 0L, 0L)), "same-doc repeat must not flag")
    // and it never certifies a length that does not repeat: minLen=13
    val none = SuffixArray.repeatedSpanStatsExact(docs, "doc_id", "text",
        minLen = 13)
      .as[(Long, Long, Long, Long)].collect().map(r => r._1 -> r._3).toMap
    assert(none.values.forall(_ == 0L), s"no 13-token repeat exists: $none")
  }

  test("repeatedSpanStatsExact: a longer repeat is covered end-to-end " +
      "(sliding starts merge to one span), guards reject bad params") {
    // 20-token shared run, minLen = 12: starts 0..8 all flag, spans
    // merge to exactly the 20 tokens
    val run = (1 to 20).map(i => s"w$i").mkString(" ")
    val docs = Seq((1L, s"$run tail1 tail2"), (2L, s"lead $run"))
      .toDF("doc_id", "text")
    val got = SuffixArray.repeatedSpanStatsExact(docs, "doc_id", "text",
        minLen = 12)
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got(1L) == ((22L, 20L, 1L)), s"doc1: ${got(1L)}")
    assert(got(2L) == ((21L, 20L, 1L)), s"doc2: ${got(2L)}")
    intercept[IllegalArgumentException] {
      SuffixArray.repeatedSpanStatsExact(docs, "doc_id", "text", 0)
    }
    intercept[IllegalArgumentException] {
      SuffixArray.repeatedSpanStatsExact(docs, "doc_id", "text", 5, 1)
    }
  }

  test("removeRepeatedSpansExact: the off-grid repeat is excised from " +
      "every copy, matching is case-folded but surviving text keeps " +
      "its original case, clean docs pass through verbatim") {
    val repU = (1 to 12).map(i => s"R$i").mkString(" ") // upper copy
    val repL = (1 to 12).map(i => s"r$i").mkString(" ") // lower copy
    val docs = Seq(
      (1L, s"Alpha beta $repU gamma"),
      (2L, s"delta $repL epsilon zeta"),
      (3L, "Untouched words only here")).toDF("doc_id", "text")
    val got = SuffixArray.removeRepeatedSpansExact(docs, "doc_id", "text",
        minLen = 12)
      .as[(Long, String, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got(1L) == (("Alpha beta gamma", 15L, 3L)), got(1L).toString)
    assert(got(2L) == (("delta epsilon zeta", 15L, 3L)), got(2L).toString)
    assert(got(3L) == (("Untouched words only here", 4L, 4L)))
  }

  test("exactSubstrContamination: a train doc sharing an off-grid run " +
      "with an eval doc flags; train-only and eval-only repeats never " +
      "flag; eval docs are excluded from the output") {
    val secret = (1 to 12).map(i => s"ev$i").mkString(" ")
    val boiler = (1 to 12).map(i => s"tr$i").mkString(" ")
    val docs = Seq(
      (1L, s"alpha beta $secret gamma"),       // train, contaminated
      (2L, s"delta $boiler epsilon"),           // train-only repeat
      (3L, s"zeta $boiler eta theta"),          // train-only repeat
      (4L, "clean words with no overlap"),      // clean train
      (100L, s"intro $secret outro"),           // eval (plants the run)
      (101L, s"other $secret closing"))         // second eval copy
      .toDF("doc_id", "text")
    val got = SuffixArray.exactSubstrContamination(docs, "doc_id", "text",
        isEval = col("doc_id") >= 100, minLen = 12)
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got.keySet == Set(1L, 2L, 3L, 4L), "eval docs excluded")
    assert(got(1L) == ((15L, 12L, 1L)), s"contaminated: ${got(1L)}")
    assert(got(2L) == ((14L, 0L, 0L)), "train-only repeat never flags")
    assert(got(3L) == ((15L, 0L, 0L)))
    assert(got(4L) == ((5L, 0L, 0L)))
    // a 13-token certificate does not exist
    val none = SuffixArray.exactSubstrContamination(docs, "doc_id", "text",
        isEval = col("doc_id") >= 100, minLen = 13)
      .as[(Long, Long, Long, Long)].collect().map(r => r._1 -> r._3).toMap
    assert(none.values.forall(_ == 0L), none.toString)
  }

  test("adjacentLcpRepeats: cross-doc maximal repeat surfaces with the " +
      "exact LCP, interior suffixes are non-maximal, rounds guard " +
      "fires when resolution is short") {
    val docs = Seq(
      (1L, "x q1 q2 q3 q4 q5 y"),
      (2L, "z q1 q2 q3 q4 q5 w"),
      (3L, "other text")).toDF("doc_id", "text")
    val got = SuffixArray.adjacentLcpRepeats(docs, "doc_id", "text",
        minLen = 3, rounds = 3)
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    // the 5-token repeat: the pair starting at (1,1)/(2,1) has lcp 5
    // and IS left-maximal (preceding tokens x/z differ)
    val top = got.filter(r => r._5 == 5L)
    assert(top.nonEmpty, s"expected an lcp-5 adjacent pair in ${got.toSeq}")
    assert(top.forall(r => Set(r._1, r._3) == Set(1L, 2L) &&
      r._2 == 1L && r._4 == 1L && r._6 == 1L), top.toSeq.toString)
    // interior continuation (q2..q5, lcp 4) is adjacent too but NOT
    // left-maximal: both predecessors are q1
    val interior = got.filter(r => r._5 == 4L)
    assert(interior.forall(r => r._2 == 2L && r._4 == 2L && r._6 == 0L),
      interior.toSeq.toString)
    // resolution guard: docs have 8 positions; 2^2 = 4 < 8 must fail
    intercept[IllegalArgumentException] {
      SuffixArray.adjacentLcpRepeats(docs, "doc_id", "text",
        minLen = 3, rounds = 2)
    }
  }

  test("windowKeys ≡ rank-pair grouping: per-position digests match the " +
      "representative-digest path row for row, and lens agree") {
    // mixed shapes: shared boilerplate, a doc shorter than minLen (no
    // viable starts, lens row only), case folding, repeated tokens
    val boiler = "please accept all cookies before reading anything " +
      "on this terrible website today thanks"
    val docs = Seq(
      (1L, s"alpha beta $boiler gamma"),
      (2L, s"$boiler delta delta"),
      (3L, "too short to window"),
      (4L, s"ALPHA BETA $boiler gamma")).toDF("doc_id", "text")
    val minLen = 12
    val (lensW, keyedW) = SuffixArray.windowKeys(docs, "doc_id", "text",
      minLen)
    // reference path: rank pairs → representative per group → digest,
    // then fan the group key back to every member position
    val (lensR, keyedR, pos) = SuffixArray.rankPairKeysPos(docs,
      "doc_id", "text", minLen)
    val reps = keyedR.groupBy("__ra", "__rb")
      .agg(min(struct(col("doc_id"), col("pos"))).as("__r"))
      .select(col("__ra"), col("__rb"),
        col("__r").getField("doc_id").as("doc_id"),
        col("__r").getField("pos").as("pos"))
    val refRows = keyedR
      .join(SuffixArray.groupDigests(reps, pos, minLen),
        Seq("__ra", "__rb"))
      .select("doc_id", "pos", "key")
      .as[(Long, Long, String)].collect().toSet
    val gotRows = keyedW.select("doc_id", "pos", "key")
      .as[(Long, Long, String)].collect().toSet
    assert(gotRows == refRows)
    assert(lensW.as[(Long, Long)].collect().toSet ==
      lensR.select(col("doc_id"), col("__len").cast("long"))
        .as[(Long, Long)].collect().toSet)
  }
}
