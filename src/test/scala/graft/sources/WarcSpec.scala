package graft.sources

import java.nio.charset.StandardCharsets.UTF_8
import org.scalatest.funsuite.AnyFunSuite

class WarcSpec extends AnyFunSuite {
  import Warc._

  test("round-trip: multi-record stream, body containing the record " +
      "trailer bytes, unicode, empty body") {
    val bodies = Seq(
      "plain text".getBytes(UTF_8),
      "tricky\r\n\r\nWARC/1.0\r\nbody".getBytes(UTF_8), // framing bait
      "ünïcødé — 日本語".getBytes(UTF_8),
      Array.empty[Byte])
    val stream = bodies.zipWithIndex.map { case (b, i) =>
      buildRecord("resource", s"urn:doc:$i", s"id-$i", b)
    }.reduce(_ ++ _)
    val got = parseRecords(stream)
    assert(got.size == 4)
    got.zipWithIndex.foreach { case (r, i) =>
      assert(r.headers("WARC-Target-URI") == s"urn:doc:$i")
      assert(r.headers("WARC-Type") == "resource")
      assert(r.body.toSeq == bodies(i).toSeq,
        s"record $i body byte-exact")
    }
  }

  test("gzip members: per-record members concatenate and parse back " +
      "byte-exact (the .warc.gz convention)") {
    val recs = (0 until 3).map(i => buildRecord("resource",
      s"urn:doc:$i", s"id-$i", s"body $i".getBytes(UTF_8)))
    val gz = Array.concat(recs.map(gzipRecord): _*)
    val got = parseGzipMembers(gz)
    assert(got.map(r => new String(r.body, UTF_8)) ==
      Seq("body 0", "body 1", "body 2"))
  }

  test("malformed input fails loudly: truncation, missing " +
      "Content-Length, bad version, CR/LF header injection") {
    val ok = buildRecord("resource", "urn:doc:1", "id-1",
      "hello".getBytes(UTF_8))
    intercept[IllegalArgumentException] {
      parseRecords(ok.dropRight(3)) // inside the trailer
    }
    intercept[IllegalArgumentException] {
      parseRecords(ok.take(ok.length / 2)) // inside the body
    }
    intercept[IllegalArgumentException] {
      parseRecords("WARC/0.9\r\n\r\n\r\n\r\n".getBytes(UTF_8))
    }
    val noLen = ("WARC/1.0\r\nWARC-Type: resource\r\n\r\n" +
      "x\r\n\r\n").getBytes(UTF_8)
    intercept[IllegalArgumentException] { parseRecords(noLen) }
    intercept[IllegalArgumentException] {
      buildRecord("resource", "urn:evil\r\nInjected: yes", "id",
        Array.empty[Byte])
    }
  }
}

class RobotsTxtSpec extends AnyFunSuite {
  import RobotsTxt._

  private val file =
    """User-agent: aragorn
      |Disallow: /private
      |
      |User-agent: *
      |Disallow: /tmp
      |Allow: /tmp/ok
      |# comment line
      |Crawl-delay: 10
      |Disallow:
      |
      |User-agent: graft
      |User-agent: other
      |Disallow: /graft-only
      |""".stripMargin

  test("group selection: exact agent token beats *, other groups are " +
      "invisible, multi-agent groups shared") {
    val g = rulesFor(file, "graft")
    assert(g == Seq(Rule(allow = false, "/graft-only")), s"got $g")
    assert(isAllowed(g, "/tmp/anything"),
      "the * group's Disallow must NOT leak into the graft group")
    assert(!isAllowed(g, "/graft-only/x"))
    val o = rulesFor(file, "other")
    assert(o == g, "multi-agent group applies to every listed token")
    assert(rulesFor(file, "ARAGORN") ==
      Seq(Rule(allow = false, "/private")), "agent match case-folds")
  }

  test("longest-prefix decision: deeper Allow overrides Disallow, " +
      "length tie goes to Allow, no match allows, empty Disallow and " +
      "unknown directives ignored") {
    val r = rulesFor(file, "nobody") // falls to the * group
    assert(!isAllowed(r, "/tmp/x"), "under /tmp")
    assert(isAllowed(r, "/tmp/ok"), "longest match is the Allow")
    assert(isAllowed(r, "/tmp/okay"), "prefix match, not segment match")
    assert(isAllowed(r, "/elsewhere"), "no rule matches -> allowed")
    val tie = Seq(Rule(allow = true, "/a"), Rule(allow = false, "/a"))
    assert(isAllowed(tie, "/a/b"), "length tie goes to Allow")
    assert(!r.exists(_.prefix.isEmpty), "empty Disallow adds no rule")
  }
}
