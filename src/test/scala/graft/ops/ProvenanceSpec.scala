package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class ProvenanceSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("provenance chain: every honest link verifies, a tampered " +
      "digest breaks ITS link (and only its link), a swapped chain " +
      "breaks the next link, and stage names are guarded") {
    val docs = Seq((1L, "alpha beta"), (2L, "gamma")).toDF("doc_id", "text")
    val s1 = docs.select($"doc_id", upper($"text").as("text"))
    val ledger = Provenance.appendStage(
      Provenance.appendStage(Provenance.genesis(docs), docs, "raw"),
      s1, "upper")
    val ok = Provenance.verify(ledger)
      .select("doc_id", "seq", "ok").as[(Long, Long, Long)].collect()
    assert(ok.length == 6 && ok.forall(_._3 == 1L), ok.toSeq.toString)

    // tamper with doc 1's stage-1 digest: seq 1 breaks (chain no
    // longer matches its inputs); seq 2 still verifies AGAINST the
    // recorded seq-1 chain — the chain pinpoints the first bad link
    val tampered = ledger.withColumn("digest",
      when($"doc_id" === 1 && $"seq" === 1, lit("00000000"))
        .otherwise($"digest"))
    val t = Provenance.verify(tampered)
      .select("doc_id", "seq", "ok").as[(Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(t((1L, 1L)) == 0L, "tampered digest must break its link")
    assert(t((1L, 2L)) == 1L && t((1L, 0L)) == 1L && t((2L, 1L)) == 1L)

    // swap doc 1's stage-1 CHAIN instead: seq 1 breaks and so does
    // seq 2 (its recorded chain hashes the true predecessor, which no
    // longer matches the swapped one)
    val swapped = ledger.withColumn("chain",
      when($"doc_id" === 1 && $"seq" === 1, lit("deadbeef"))
        .otherwise($"chain"))
    val sw = Provenance.verify(swapped)
      .select("doc_id", "seq", "ok").as[(Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(sw((1L, 1L)) == 0L && sw((1L, 2L)) == 0L)
    assert(sw((2L, 2L)) == 1L, "other docs untouched")

    intercept[IllegalArgumentException] {
      Provenance.appendStage(ledger, docs, "bad|name")
    }
    // a stage output with no provenance never silently appears
    val orphan = Seq((99L, "ghost")).toDF("doc_id", "text")
    val after = Provenance.appendStage(ledger, orphan, "late")
    assert(after.filter($"doc_id" === 99).isEmpty,
      "docs without a ledger must not gain entries")
  }
}
