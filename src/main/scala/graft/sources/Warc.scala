package graft.sources

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets.UTF_8
import java.util.zip.{GZIPInputStream, GZIPOutputStream}

/** WARC/1.0 (ISO 28500) record framing — the container web corpora
  * actually arrive in (Common Crawl ships every crawl as WARC): a
  * record is a version line, header lines, a blank line, exactly
  * `Content-Length` payload bytes, then a CRLF CRLF trailer; a file is
  * records back to back, conventionally one gzip MEMBER per record so
  * readers can split without decompressing (the `.warc.gz` form —
  * JDK's GZIPInputStream reads concatenated members natively, which is
  * what [[Warc.parseGzipMembers]] leans on).
  *
  * Pure JVM writer + parser, byte-exact both ways. Framing is
  * length-driven — bodies may contain anything, including the CRLF CRLF
  * sequence that terminates records (the spec proves it). Malformed
  * input fails LOUDLY with the byte offset: a truncated crawl chunk
  * must never silently yield fewer documents.
  *
  * Scale shape: records parse sequentially within one stream, so the
  * unit of parallelism is the FILE/member (exactly how Common Crawl is
  * consumed — thousands of .warc.gz shards, one task each); nothing
  * here ever holds more than one record's bytes beyond the input
  * buffer it was handed. */
object Warc {

  final case class WarcRecord(headers: Map[String, String],
      body: Array[Byte])

  private val Crlf = "\r\n".getBytes(UTF_8)

  /** Serialize one WARC/1.0 record. `extraHeaders` append after the
    * standard four; header names/values must not contain CR/LF. */
  def buildRecord(warcType: String, targetUri: String, recordId: String,
      body: Array[Byte],
      extraHeaders: Seq[(String, String)] = Nil): Array[Byte] = {
    val all = Seq("WARC-Type" -> warcType,
      "WARC-Record-ID" -> s"<urn:uuid:$recordId>",
      "WARC-Target-URI" -> targetUri,
      "Content-Length" -> body.length.toString) ++ extraHeaders
    all.foreach { case (k, v) =>
      require(!(k + v).exists(c => c == '\r' || c == '\n'),
        s"CR/LF in WARC header $k")
    }
    val head = new StringBuilder("WARC/1.0\r\n")
    all.foreach { case (k, v) => head.append(s"$k: $v\r\n") }
    head.append("\r\n")
    val out = new ByteArrayOutputStream(head.length + body.length + 4)
    out.write(head.toString.getBytes(UTF_8))
    out.write(body)
    out.write(Crlf); out.write(Crlf)
    out.toByteArray
  }

  /** Parse a stream of plain (uncompressed) WARC records. Loud on any
    * framing violation: bad version line, header without a colon,
    * missing Content-Length, truncated body or trailer. */
  def parseRecords(bytes: Array[Byte]): Seq[WarcRecord] = {
    val out = Seq.newBuilder[WarcRecord]
    var pos = 0
    def line(): String = {
      val start = pos
      while (pos + 1 < bytes.length &&
        !(bytes(pos) == '\r' && bytes(pos + 1) == '\n')) pos += 1
      require(pos + 1 < bytes.length,
        s"WARC: unterminated header line at byte $start")
      val s = new String(bytes, start, pos - start, UTF_8)
      pos += 2
      s
    }
    while (pos < bytes.length) {
      val at = pos
      val version = line()
      require(version == "WARC/1.0",
        s"WARC: bad version line '$version' at byte $at")
      var headers = Map.empty[String, String]
      var h = line()
      while (h.nonEmpty) {
        val i = h.indexOf(':')
        require(i > 0, s"WARC: malformed header '$h' at byte $at")
        headers += h.substring(0, i).trim -> h.substring(i + 1).trim
        h = line()
      }
      val len = headers.getOrElse("Content-Length",
        throw new IllegalArgumentException(
          s"WARC: record at byte $at has no Content-Length")).toInt
      require(len >= 0 && pos + len + 4 <= bytes.length,
        s"WARC: truncated record at byte $at (need $len payload bytes)")
      val body = java.util.Arrays.copyOfRange(bytes, pos, pos + len)
      pos += len
      require(bytes(pos) == '\r' && bytes(pos + 1) == '\n' &&
        bytes(pos + 2) == '\r' && bytes(pos + 3) == '\n',
        s"WARC: missing record trailer at byte $pos")
      pos += 4
      out += WarcRecord(headers, body)
    }
    out.result()
  }

  /** One gzip member per record — the `.warc.gz` convention. */
  def gzipRecord(record: Array[Byte]): Array[Byte] = {
    val bos = new ByteArrayOutputStream(record.length / 2 + 32)
    val gz = new GZIPOutputStream(bos)
    gz.write(record); gz.close()
    bos.toByteArray
  }

  /** Parse concatenated gzip members (JDK GZIPInputStream consumes
    * member sequences natively) then the plain framing. */
  def parseGzipMembers(bytes: Array[Byte]): Seq[WarcRecord] = {
    val gz = new GZIPInputStream(
      new java.io.ByteArrayInputStream(bytes))
    val bos = new ByteArrayOutputStream(bytes.length * 4 + 64)
    val buf = new Array[Byte](8192)
    var n = gz.read(buf)
    while (n >= 0) { bos.write(buf, 0, n); n = gz.read(buf) }
    parseRecords(bos.toByteArray)
  }
}
