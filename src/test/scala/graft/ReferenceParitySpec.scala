package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.GraftFunctions

/** Reference-shaped parity fixtures (FIXTURES.md §B): opinion records
  * with the reference's six text-source fields, exercising P3 coalesce
  * priority, F1 cleaning, F2-F6 extraction families, and the P4 filter —
  * end to end through the Spark column API. */
class ReferenceParitySpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  // (docket_id, html_with_citations, plain_text, html_columbia, html_lawbox, html_anon_2020, html)
  private val opinions = Seq(
    // priority 1 wins even when later fields are set
    (1L, "<p>Justice Marshall cited 347 U.S. 483 (1954) and 42 U.S.C. § 1983 in Brown v. Board.</p>",
      "plain fallback", "", "", "", ""),
    // empty/whitespace priority-1 falls through to plain_text
    (2L, "   ", "The Supreme Court of California heard 123 S. Ct. 456 (1987). See Title VII of the Civil Rights Act.",
      "", "", "", ""),
    // only the last-priority field present
    (3L, "", "", "", "", "", "<div>The panel cited 123 F.2d 456 (9th Cir. 1987) per Rehnquist, C.J. in dissent.</div>"),
    // all empty -> dropped by P4
    (4L, "", "", "", "", "", ""))
    .toDF("docket_id", "html_with_citations", "plain_text", "html_columbia",
      "html_lawbox", "html_anon_2020", "html")

  private val priorityFields = Seq("html_with_citations", "plain_text",
    "html_columbia", "html_lawbox", "html_anon_2020", "html")

  test("P3 coalesce: first non-empty field wins, source_field records which") {
    val (value, source) = GraftFunctions.coalesceTextFields(
      priorityFields.map(f => (f, col(f))))
    val out = opinions.select($"docket_id", value.as("raw"), source.as("source_field"))
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(out(1L) == "html_with_citations")
    assert(out(2L) == "plain_text")
    assert(out(3L) == "html")
  }

  test("F1+F9 over coalesced text: clean strips HTML, extraction finds every family") {
    val (value, _) = GraftFunctions.coalesceTextFields(priorityFields.map(f => (f, col(f))))
    val processed = opinions
      .withColumn("p", GraftFunctions.enhancedTextProcessing(value))
      .select($"docket_id", $"p.cleaned_text", $"p.citations",
        $"p.legal_entities.judges", $"p.legal_entities.courts",
        $"p.legal_entities.statutes", $"p.text_stats.citation_count")
      .collect().map(r => r.getLong(0) -> r).toMap

    val r1 = processed(1L)
    assert(!r1.getString(1).contains("<p>"))
    assert(r1.getSeq[String](2).contains("347 U.S. 483 (1954)"))
    assert(r1.getSeq[String](3).contains("Marshall"))
    assert(r1.getSeq[String](5).exists(_.startsWith("42 U.S.C.")))
    assert(r1.getLong(6) == r1.getSeq[String](2).size)

    val r2 = processed(2L)
    assert(r2.getSeq[String](2).contains("123 S. Ct. 456 (1987)"))
    assert(r2.getSeq[String](4).exists(_.startsWith("Supreme Court of California")))
    assert(r2.getSeq[String](5).exists(_.startsWith("Title VII")))

    val r3 = processed(3L)
    assert(r3.getSeq[String](2).contains("123 F.2d 456 (9th Cir. 1987)"))
    assert(r3.getSeq[String](3).contains("Rehnquist"))
  }

  test("P4: the all-empty opinion is dropped by the min-raw-length filter") {
    val (value, _) = GraftFunctions.coalesceTextFields(priorityFields.map(f => (f, col(f))))
    val kept = opinions
      .withColumn("opinion_text", GraftFunctions.cleanText(value))
      .filter(length(trim($"opinion_text")) >= 50)
      .select("docket_id").as[Long].collect().toSet
    assert(kept == Set(1L, 2L, 3L))
  }
}
