package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase
import graft.ops.TextAnalysis

class CurationStreamSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  // a corpus whose gates all visibly fire: base docs are long clean
  // English-ish token runs; plants are an exact copy (id 21 of id 1),
  // a near-dup copy (id 22 = id 2 + one token), a vowel-mangled doc
  // (id 23 — fails the frozen-profile lang gate), an exclamation bomb
  // (id 24 — fails quality), and a two-token loop (id 25 — fails the
  // top-bigram repetition share)
  private def baseText(i: Int): String =
    (0 until 40).map { j =>
      val a = ('a' + (i * 7 + j * 3) % 23).toChar
      val b = ('a' + (i + j) % 11).toChar
      s"word$a term$b"
    }.mkString(" ")
  private lazy val corpus: Seq[(Long, String)] = {
    val base = (1 to 20).map(i => (i.toLong, baseText(i)))
    base ++ Seq(
      (21L, baseText(1)),
      (22L, baseText(2) + " extratoken"),
      (23L, baseText(3).replaceAll("[aeiou]", "z")),
      (24L, (0 until 40).map(j => s"w$j!!!").mkString(" ") + "!!!!!!!!"),
      (25L, "looptok spintok " * 60))
  }

  // frozen profile: 'en' = the clean base texts, 'zz' = vowel-mangled
  private lazy val profile = TextAnalysis.langIdTrain(
    (1 to 20).flatMap(i => Seq(("en", baseText(i)),
      ("zz", baseText(i).replaceAll("[aeiou]", "z")))).toDF("lang", "text"),
    buckets = 1024).localCheckpoint()

  private val cfg = CurationStream.Config(minMargin = 1L)

  private def runStream(srcDir: String, out: String, state: String,
      cp: String): Unit = {
    val schema = spark.read.parquet(srcDir).schema
    val src = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(srcDir)
    val q = CurationStream.run(spark, src, profile, out, state, cp, cfg)
    q.processAllAvailable(); q.stop()
  }

  /** Write the corpus slice as one parquet file stamped onto a strictly
    * increasing mtime ladder — FileStreamSource orders by modification
    * time, and the ascending-id batch order must not hinge on write
    * timing. */
  private def writeBatch(srcDir: String, batchNo: Int,
      rows: Seq[(Long, String)]): Unit = {
    val stampedBefore = Option(new java.io.File(srcDir).listFiles())
      .getOrElse(Array.empty).map(_.getName).toSet
    rows.toDF("doc_id", "text")
      .coalesce(1).write.mode("append").parquet(srcDir)
    val mtime0 = (System.currentTimeMillis() / 1000L) * 1000L
    new java.io.File(srcDir).listFiles()
      .filter(f => f.getName.startsWith("part-") &&
        !stampedBefore.contains(f.getName))
      .foreach(f => assert(f.setLastModified(mtime0 + batchNo * 60000L)))
  }

  test("streaming curation: every gate fires on its plant, the stream " +
      "equals the one-batch run, and replay from a fresh checkpoint " +
      "converges") {
    val base = Files.createTempDirectory("graft_cur_stream").toString
    val srcDir = s"$base/src"
    // three ascending-id files → three micro-batches
    writeBatch(srcDir, 1, corpus.filter(_._1 <= 10))
    writeBatch(srcDir, 2, corpus.filter(r => r._1 > 10 && r._1 <= 20))
    writeBatch(srcDir, 3, corpus.filter(_._1 > 20))

    runStream(srcDir, s"$base/out", s"$base/state", s"$base/cp1")
    val got = graft.index.Snapshots.readVersion(spark, s"$base/out",
        graft.index.Snapshots.versions(spark, s"$base/out").last)
      .orderBy("id")
    val byId = got.collect().map(r => r.getAs[Long]("id") -> r).toMap
    assert(byId.size == 25, s"all length-passing docs carried: ${byId.size}")
    // plants: the right gate and ONLY that gate rejects
    assert(byId(21L).getAs[Long]("pass_exact") == 0L, "exact copy")
    assert(byId(1L).getAs[Long]("pass_exact") == 1L, "original survives")
    assert(byId(22L).getAs[Long]("pass_neardup") == 0L, "near-dup copy")
    assert(byId(2L).getAs[Long]("pass_neardup") == 1L, "original survives")
    assert(byId(23L).getAs[Long]("pass_lang") == 0L, "mangled doc fails lang")
    assert(byId(23L).getAs[String]("pred_lang") == "zz")
    assert(byId(24L).getAs[Long]("pass_quality") == 0L, "exclamation bomb")
    assert(byId(25L).getAs[Long]("pass_rep") == 0L, "two-token loop")
    assert(byId(5L).getAs[Long]("admitted") == 1L, "a clean doc admits")
    assert(byId(21L).getAs[Long]("admitted") == 0L)

    // batching invariance: the whole corpus as ONE batch, empty state
    val (d0, s0) = CurationStream.readState(spark, s"$base/nostate")
    val oneBatch = CurationStream.admitBatch(
        corpus.toDF("doc_id", "text"), d0, s0, profile, cfg)
      .drop("digest", "sig").withColumnRenamed("doc_id", "id")
    val cols = oneBatch.columns.sorted.toSeq
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select(cols.map(col): _*).collect()
        .map(_.toSeq).sortBy(_.toString())
    assert(canon(got).toSeq == canon(oneBatch).toSeq,
      "stream(3 batches) must equal the one-batch run")

    // replay: fresh checkpoint redelivers everything; state rows
    // duplicate harmlessly and the snapshot upsert converges
    runStream(srcDir, s"$base/out", s"$base/state", s"$base/cp2")
    val replayed = graft.index.Snapshots.readVersion(spark, s"$base/out",
      graft.index.Snapshots.versions(spark, s"$base/out").last)
    assert(canon(replayed).toSeq == canon(got).toSeq,
      "replay must converge to the same table")
  }

  test("compaction epoch: reconcile upgrades first-wins to keep-best " +
      "(the longer near-dup copy becomes the survivor), commits a new " +
      "version, and stream-then-reconcile equals the one-batch " +
      "composite") {
    val base = Files.createTempDirectory("graft_cur_rec").toString
    val srcDir = s"$base/src"
    writeBatch(srcDir, 1, corpus.filter(_._1 <= 10))
    writeBatch(srcDir, 2, corpus.filter(r => r._1 > 10 && r._1 <= 20))
    writeBatch(srcDir, 3, corpus.filter(_._1 > 20))
    runStream(srcDir, s"$base/out", s"$base/state", s"$base/cp")
    val vBefore = graft.index.Snapshots.versions(spark, s"$base/out").last
    CurationStream.reconcile(spark, s"$base/out", s"$base/state", cfg)
    val vAfter = graft.index.Snapshots.versions(spark, s"$base/out").last
    assert(vAfter == vBefore + 1, "reconcile commits the next version")
    val got = graft.index.Snapshots.readVersion(spark, s"$base/out", vAfter)
    val byId = got.collect().map(r => r.getAs[Long]("id") -> r).toMap
    // keep-best flips the near-dup survivor: id 22 = id 2 + one token,
    // so the ONLINE rule kept 2 and rejected 22; the epoch keeps the
    // LONGER 22 and rejects 2
    assert(byId(22L).getAs[Long]("pass_neardup") == 1L &&
      byId(22L).getAs[Long]("admitted") == 1L, "longer copy survives")
    assert(byId(2L).getAs[Long]("pass_neardup") == 0L &&
      byId(2L).getAs[Long]("admitted") == 0L, "shorter original loses")
    // exact-dup rejection is untouched (min-id IS the batch rule)
    assert(byId(21L).getAs[Long]("pass_exact") == 0L)
    assert(byId(1L).getAs[Long]("pass_exact") == 1L)
    // untouched gates keep their flags
    assert(byId(23L).getAs[Long]("pass_lang") == 0L)
    assert(byId(24L).getAs[Long]("pass_quality") == 0L)
    assert(byId(25L).getAs[Long]("pass_rep") == 0L)
    // batching invariance THROUGH the epoch: the whole corpus as one
    // batch, then the same reconcile — identical table (so the stream
    // split can never leak into the compacted result)
    val one = s"$base/one"
    writeBatch(s"$one/src", 1, corpus)
    runStream(s"$one/src", s"$one/out", s"$one/state", s"$one/cp")
    CurationStream.reconcile(spark, s"$one/out", s"$one/state", cfg)
    val oneGot = graft.index.Snapshots.readVersion(spark, s"$one/out",
      graft.index.Snapshots.versions(spark, s"$one/out").last)
    val cols = got.columns.sorted.toSeq
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select(cols.map(col): _*).collect()
        .map(_.toSeq).sortBy(_.toString())
    assert(canon(got).toSeq == canon(oneGot).toSeq,
      "stream-then-reconcile must equal one-batch-then-reconcile")
  }

  test("compactState: replay-bloated ledgers shrink to one row per doc; " +
      "admission against the compacted state is bit-identical") {
    val base = Files.createTempDirectory("graft_cur_compact").toString
    val srcDir = s"$base/src"
    writeBatch(srcDir, 1, corpus.filter(_._1 <= 20))
    runStream(srcDir, s"$base/out", s"$base/state", s"$base/cp1")
    // replay from a fresh checkpoint: state rows duplicate
    runStream(srcDir, s"$base/out", s"$base/state", s"$base/cp2")
    val (d0, s0) = CurationStream.readState(spark, s"$base/state")
    assert(d0.count() > d0.select("doc_id").distinct().count(),
      "replay must have bloated the digest ledger for this test to bite")
    // the NEXT batch admitted against the bloated state — the reference
    val next = corpus.filter(_._1 > 20).toDF("doc_id", "text")
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).sortBy(_.toString()).toSeq
    val before = canon(CurationStream.admitBatch(next, d0, s0, profile, cfg))
    val (nd, ns) = CurationStream.compactState(spark, s"$base/state")
    val (d1, s1) = CurationStream.readState(spark, s"$base/state")
    assert(d1.count() == nd && nd == d1.select("doc_id").distinct().count())
    assert(s1.count() == ns && ns == s1.select("doc_id").distinct().count())
    assert(canon(CurationStream.admitBatch(next, d1, s1, profile, cfg))
      == before, "admission must be bit-identical after compaction")
  }
}
