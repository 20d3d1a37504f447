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
