package graft.ingest

import org.scalatest.funsuite.AnyFunSuite
import scala.collection.mutable.ArrayBuffer

import CourtListenerSource._

/** S1-S4 semantics against an in-memory fake fetcher (no network). */
class CourtListenerSourceSpec extends AnyFunSuite {

  private class FakeFetcher(pages: Map[Option[String], DocketPage],
      clusters: Map[String, Cluster] = Map.empty,
      opinions: Map[String, OpinionJson] = Map.empty) extends Fetcher {
    def fetchDocketPage(court: String, cursor: Option[String]): DocketPage = pages(cursor)
    def fetchCluster(url: String): Option[Cluster] = clusters.get(url)
    def fetchOpinion(url: String): Option[OpinionJson] = opinions.get(url)
  }

  test("page loop follows cursors and stops at exhaustion") {
    val f = new FakeFetcher(Map(
      None -> DocketPage(Seq(Docket(1, Nil, "scotus")), Some("c2")),
      Some("c2") -> DocketPage(Seq(Docket(2, Nil, "scotus")), Some("c3")),
      Some("c3") -> DocketPage(Seq(Docket(3, Nil, "scotus")), None)))
    val got = docketPages(f, "scotus", None, maxPages = 10).toSeq
    assert(got.flatMap(_.dockets.map(_.id)) == Seq(1L, 2L, 3L))
  }

  test("maxPages bounds the loop; existing ids are skipped (P2)") {
    val f = new FakeFetcher(Map(
      None -> DocketPage(Seq(Docket(1, Nil, "x"), Docket(2, Nil, "x")), Some("c2")),
      Some("c2") -> DocketPage(Seq(Docket(3, Nil, "x")), Some("c3"))))
    val got = docketPages(f, "x", None, maxPages = 2, existingIds = _ == 1L).toSeq
    assert(got.size == 2)
    assert(got.flatMap(_.dockets.map(_.id)) == Seq(2L, 3L))
  }

  test("retry: succeeds after transient failures with linear backoff") {
    val sleeps = ArrayBuffer.empty[Long]
    var calls = 0
    val out = withRetry(RetryPolicy(maxRetries = 3, retryDelayMs = 2000,
        requestDelayMs = 500), sleeps += _) {
      calls += 1
      if (calls < 3) sys.error("boom")
      "ok"
    }
    assert(out.contains("ok") && calls == 3)
    // 0.5s before each of 3 requests; backoff 2s, 4s after failures 1, 2
    assert(sleeps.toSeq == Seq(500L, 2000L, 500L, 4000L, 500L))
  }

  test("retry: gives up after maxRetries and returns None") {
    var calls = 0
    val out = withRetry(RetryPolicy(maxRetries = 3), _ => ())(
      { calls += 1; sys.error("always") })
    assert(out.isEmpty && calls == 3)
  }

  test("docket expansion walks cluster and opinion FK lookups (S2/S3)") {
    val f = new FakeFetcher(
      pages = Map.empty,
      clusters = Map("c/1" -> Cluster(10, Seq("o/1", "o/2"), "2020-01-01", "J", "Published")),
      opinions = Map("o/1" -> OpinionJson(100, Map()), "o/2" -> OpinionJson(101, Map())))
    val out = expandDocket(f, Docket(1, Seq("c/1", "c/missing"), "scotus"))
    assert(out.map(_._3.id) == Seq(100L, 101L))
    assert(out.forall(_._2.id == 10L))
  }
}

class PdfSourceSpec extends AnyFunSuite with graft.SparkTestBase {
  import graft.sources.{PdfSource, PdfText}

  /** Assemble a real two-page PDF: page 1's content stream is
    * Flate-compressed, page 2's is raw; literal-string escapes, a TJ
    * array with kerning, and a hex string are all exercised. */
  private def samplePdf(): Array[Byte] = {
    val latin1 = java.nio.charset.StandardCharsets.ISO_8859_1
    def deflate(s: String): Array[Byte] = {
      val d = new java.util.zip.Deflater()
      d.setInput(s.getBytes(latin1)); d.finish()
      val buf = new Array[Byte](8192)
      val out = new java.io.ByteArrayOutputStream()
      while (!d.finished()) out.write(buf, 0, d.deflate(buf))
      d.end(); out.toByteArray
    }
    val c1 = deflate("BT /F1 12 Tf 72 720 Td (Hello \\(World\\)) Tj 0 -14 Td [(Sec) -250 (ond)] TJ ET")
    val c2 = "BT (Page2 hex:) Tj <48454C4C4F> Tj ET".getBytes(latin1)
    val out = new java.io.ByteArrayOutputStream()
    def w(s: String): Unit = out.write(s.getBytes(latin1))
    w("%PDF-1.4\n")
    w("1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n")
    w("2 0 obj << /Type /Pages /Kids [3 0 R 5 0 R] /Count 2 >> endobj\n")
    w("3 0 obj << /Type /Page /Parent 2 0 R /Contents 4 0 R >> endobj\n")
    w(s"4 0 obj << /Length ${c1.length} /Filter /FlateDecode >> stream\n")
    out.write(c1); w("\nendstream endobj\n")
    w("5 0 obj << /Type /Page /Parent 2 0 R /Contents 6 0 R >> endobj\n")
    w(s"6 0 obj << /Length ${c2.length} >> stream\n")
    out.write(c2); w("\nendstream endobj\n")
    w("%%EOF\n")
    out.toByteArray
  }

  test("real extractor: Flate stream, escapes, TJ array, hex string, page order") {
    assert(PdfText.pages("not a pdf".getBytes).isEmpty)
    val pages = PdfText.pages(samplePdf())
    assert(pages == Seq("Hello (World)\nSecond", "Page2 hex:HELLO"))
  }

  /** A composite-font (CID/Type0) PDF: glyph CODES in the content
    * stream, meaning only via the font's /ToUnicode CMap — the shape
    * court slip opinions ship in. Codes: 1→H 2→e 3→o via bfchar,
    * 10..12→l,m,n via bfrange. */
  private def cidPdf(): Array[Byte] = {
    val latin1 = java.nio.charset.StandardCharsets.ISO_8859_1
    val content = "BT /F1 12 Tf <00010002001000100003> Tj 0 -14 Td <0011> Tj ET".getBytes(latin1)
    val cmap =
      """/CIDInit /ProcSet findresource begin
        |begincmap
        |1 begincodespacerange
        |<0000> <FFFF>
        |endcodespacerange
        |3 beginbfchar
        |<0001> <0048>
        |<0002> <0065>
        |<0003> <006F>
        |endbfchar
        |1 beginbfrange
        |<0010> <0012> <006C>
        |endbfrange
        |endcmap
        |""".stripMargin.getBytes(latin1)
    val out = new java.io.ByteArrayOutputStream()
    def w(s: String): Unit = out.write(s.getBytes(latin1))
    w("%PDF-1.4\n")
    w("1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n")
    w("2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n")
    w("3 0 obj << /Type /Page /Parent 2 0 R /Resources << /Font << /F1 5 0 R >> >> /Contents 4 0 R >> endobj\n")
    w(s"4 0 obj << /Length ${content.length} >> stream\n")
    out.write(content); w("\nendstream endobj\n")
    w("5 0 obj << /Type /Font /Subtype /Type0 /BaseFont /Fake-CID /ToUnicode 6 0 R >> endobj\n")
    w(s"6 0 obj << /Length ${cmap.length} >> stream\n")
    out.write(cmap); w("\nendstream endobj\n")
    w("%%EOF\n")
    out.toByteArray
  }

  test("CID font: show strings decode through the /ToUnicode CMap") {
    // <0001><0002><0010><0010><0003> → Hello; <0011> → m (bfrange bump)
    assert(PdfText.pages(cidPdf()) == Seq("Hello\nm"))
  }

  /** PDF-flavor TIFF LZW encoder (9→12-bit codes, clear/EOD, early
    * change aligned with PDFBox's LZWFilter: width grows for the code
    * AFTER table entry 2^w - 2 is added) — exists to build real
    * /LZWDecode fixtures for the decoder. */
  private def lzwEncode(data: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    var acc = 0L; var nbits = 0; var codeBits = 9
    def emit(code: Int): Unit = {
      acc = (acc << codeBits) | code; nbits += codeBits
      while (nbits >= 8) {
        out.write(((acc >>> (nbits - 8)) & 0xff).toInt); nbits -= 8
      }
    }
    val dict = scala.collection.mutable.HashMap[String, Int]()
    var next = 258
    emit(256) // clear
    var w = ""
    def codeOf(s: String): Int =
      if (s.length == 1) s.charAt(0) & 0xff else dict(s)
    for (b <- data) {
      val c = (b & 0xff).toChar
      val wb = w + c
      if (wb.length == 1 || dict.contains(wb)) w = wb
      else {
        emit(codeOf(w))
        if (next < 4096) {
          dict(wb) = next; next += 1
          if (next == (1 << codeBits) && codeBits < 12) codeBits += 1
        }
        w = c.toString
      }
    }
    if (w.nonEmpty) emit(codeOf(w))
    emit(257) // EOD
    if (nbits > 0) out.write(((acc << (8 - nbits)) & 0xff).toInt)
    out.toByteArray
  }

  test("LZW codec: round-trip across code-width changes and KwKwK") {
    // KwKwK corner: the repeated-prefix pattern that makes a decoder
    // see a code it has not finished defining
    val kwk = "abababababababab".getBytes("ISO-8859-1")
    assert(new String(PdfText.lzwDecode(lzwEncode(kwk)), "ISO-8859-1") ==
      "abababababababab")
    // enough distinct material to push the table past 511 and 1023
    // entries: both 9->10 and 10->11 bit transitions are crossed
    val big = (0 until 900).map(i => s"tok$i ").mkString.getBytes("ISO-8859-1")
    val decoded = PdfText.lzwDecode(lzwEncode(big))
    assert(java.util.Arrays.equals(decoded, big),
      s"LZW round-trip mismatch at width transition: got ${decoded.length} bytes")
  }

  test("LZW codec: out-of-range code stops cleanly, keeping the prefix") {
    // Hand-built stream: clear(256), 'a'(97), then code 300 — far beyond
    // the next assignable entry (258). Only code == next is the valid
    // KwKwK case; 300 is corruption and must trigger the stop-cleanly
    // policy (emit nothing fabricated, keep the decoded prefix).
    val out = new java.io.ByteArrayOutputStream()
    var acc = 0L; var nbits = 0
    def emit(code: Int): Unit = {
      acc = (acc << 9) | code; nbits += 9
      while (nbits >= 8) {
        out.write(((acc >>> (nbits - 8)) & 0xff).toInt); nbits -= 8
      }
    }
    emit(256); emit(97); emit(300)
    if (nbits > 0) out.write(((acc << (8 - nbits)) & 0xff).toInt)
    assert(new String(PdfText.lzwDecode(out.toByteArray), "ISO-8859-1") == "a")
  }

  /** A PDF whose page content is /LZWDecode-compressed — the filter
    * PyPDF2 handles that graft previously documented as out of scope. */
  private def lzwPdf(): Array[Byte] = {
    val latin1 = java.nio.charset.StandardCharsets.ISO_8859_1
    val cs = "BT /F1 12 Tf 72 720 Td " +
      (0 until 300).map(i => s"(w$i ) Tj").mkString(" ") + " ET"
    val c = lzwEncode(cs.getBytes(latin1))
    val out = new java.io.ByteArrayOutputStream()
    def w(s: String): Unit = out.write(s.getBytes(latin1))
    w("%PDF-1.4\n")
    w("1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n")
    w("2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n")
    w("3 0 obj << /Type /Page /Parent 2 0 R /Contents 4 0 R >> endobj\n")
    w(s"4 0 obj << /Length ${c.length} /Filter /LZWDecode >> stream\n")
    out.write(c); w("\nendstream endobj\n")
    w("%%EOF\n")
    out.toByteArray
  }

  test("LZW-filtered content stream extracts like a Flate one") {
    val expected = (0 until 300).map(i => s"w$i ").mkString
    assert(PdfText.pages(lzwPdf()) == Seq(expected))
  }

  /** A simple font re-encoded via /Encoding → /Differences: code 64
    * (@) renders é, 35 (#) renders an em-dash, 94 (^) the fi ligature,
    * 42 (*) a euro via the systematic uniXXXX name. Codes outside the
    * table keep their Latin-1 identity. */
  private def differencesPdf(): Array[Byte] = {
    val latin1 = java.nio.charset.StandardCharsets.ISO_8859_1
    val content = "BT /F1 12 Tf (Caf@ # 5* ^n) Tj ET".getBytes(latin1)
    val out = new java.io.ByteArrayOutputStream()
    def w(s: String): Unit = out.write(s.getBytes(latin1))
    w("%PDF-1.4\n")
    w("1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n")
    w("2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n")
    w("3 0 obj << /Type /Page /Parent 2 0 R /Resources << /Font << /F1 5 0 R >> >> /Contents 4 0 R >> endobj\n")
    w(s"4 0 obj << /Length ${content.length} >> stream\n")
    out.write(content); w("\nendstream endobj\n")
    w("5 0 obj << /Type /Font /Subtype /Type1 /BaseFont /Fake-Regular " +
      "/Encoding << /Type /Encoding /BaseEncoding /WinAnsiEncoding " +
      "/Differences [ 35 /emdash 42 /uni20AC 64 /eacute 94 /fi ] >> >> endobj\n")
    w("%%EOF\n")
    out.toByteArray
  }

  test("/Differences re-encoded simple font decodes through the AGL subset") {
    assert(PdfText.pages(differencesPdf()) == Seq("Café — 5€ ﬁn"))
  }

  test("glyphToUnicode: AGL names, uniXXXX, single chars, unknown -> None") {
    assert(PdfText.glyphToUnicode("emdash").contains("—"))
    assert(PdfText.glyphToUnicode("a").contains("a"))
    assert(PdfText.glyphToUnicode("uni0041").contains("A"))
    assert(PdfText.glyphToUnicode("notarealglyphname").isEmpty)
  }

  test("parseToUnicode: bfrange array form and multi-unit destinations") {
    val tu = PdfText.parseToUnicode(
      """1 begincodespacerange <0000> <FFFF> endcodespacerange
        |1 beginbfchar <0001> <00660066> endbfchar
        |1 beginbfrange <0005> <0006> [<0041> <0042>] endbfrange
        |""".stripMargin)
    assert(tu.twoByte)
    assert(tu.map(1) == "ff") // ligature expands to two units
    assert(tu.map(5) == "A" && tu.map(6) == "B")
    // one-byte codespace variant
    val one = PdfText.parseToUnicode(
      "1 begincodespacerange <00> <FF> endcodespacerange " +
        "1 beginbfchar <41> <0061> endbfchar")
    assert(!one.twoByte)
    assert(one.decode("A") == "a")
    assert(one.decode("Z") == "Z", "unmapped 1-byte codes fall back to raw")
  }

  test("stub extractor still counts pages for plumbing tests") {
    val ex = new PdfSource.StubExtractor
    assert(ex.pages("not a pdf".getBytes).isEmpty)
    val fake = "%PDF-1.4\n/Type /Page\nstuff\n/Type /Page\nend".getBytes("ISO-8859-1")
    assert(ex.pages(fake).size == 2)
  }

  test("binaryFile read: real extraction, pages joined with newline") {
    val dir = java.nio.file.Files.createTempDirectory("pdfs")
    java.nio.file.Files.write(dir.resolve("a.pdf"), samplePdf())
    java.nio.file.Files.write(dir.resolve("skip.txt"), "no".getBytes)
    val out = PdfSource.read(spark, dir.toString).collect()
    assert(out.length == 1)
    assert(out(0).getAs[String]("text") == "Hello (World)\nSecond\nPage2 hex:HELLO")
  }

  private def deflateBytes(b: Array[Byte]): Array[Byte] = {
    val d = new java.util.zip.Deflater()
    d.setInput(b); d.finish()
    val buf = new Array[Byte](8192)
    val out = new java.io.ByteArrayOutputStream()
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end(); out.toByteArray
  }

  /** Reference PNG row-filter ENCODER (filter type chosen per row) —
    * exists to build honest predictor fixtures for the decoder. */
  private def pngFilter(data: Array[Byte], columns: Int,
      filterOfRow: Int => Int): Array[Byte] = {
    val pad = (columns - data.length % columns) % columns
    val padded = data ++ Array.fill(pad)(' '.toByte)
    val out = new java.io.ByteArrayOutputStream()
    var prev = new Array[Byte](columns)
    var r = 0
    for (row <- padded.grouped(columns)) {
      val ft = filterOfRow(r)
      out.write(ft)
      for (i <- 0 until columns) {
        val x = row(i) & 0xff
        val a = if (i >= 1) row(i - 1) & 0xff else 0
        val b = prev(i) & 0xff
        val c = if (i >= 1) prev(i - 1) & 0xff else 0
        val f = ft match {
          case 0 => x
          case 1 => x - a
          case 2 => x - b
          case 3 => x - (a + b) / 2
          case 4 =>
            val p = a + b - c
            val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
            x - (if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c)
        }
        out.write(f & 0xff)
      }
      prev = row; r += 1
    }
    out.toByteArray
  }

  test("PNG unfilter: all five filter types round-trip; TIFF predictor 2") {
    val payload = (0 until 400).map(i => ((i * 37 + i / 7) % 251).toByte).toArray
    // cycle through every filter type across rows
    val filtered = pngFilter(payload, 20, r => r % 5)
    assert(java.util.Arrays.equals(
      PdfText.pngUnfilter(filtered, 20, 1, 8), payload))
    // TIFF horizontal differencing, 2 interleaved color components
    val tiff = payload.clone()
    val rowLen = 40
    var row = 0
    while (row + rowLen <= tiff.length) {
      var i = rowLen - 1
      while (i >= 2) { tiff(row + i) = ((tiff(row + i) - tiff(row + i - 2)) & 0xff).toByte; i -= 1 }
      row += rowLen
    }
    assert(java.util.Arrays.equals(
      PdfText.tiffUnpredict(tiff, 20, 2, 8), payload))
    // truncated PNG rows: keep-prefix (one full 20-byte row), never throw
    assert(PdfText.pngUnfilter(filtered.take(25), 20, 1, 8).length == 20)
  }

  /** A PDF whose content stream is Flate + PNG-predictor-12 encoded —
    * the DecodeParms shape object/xref-stream PDFs use. */
  test("predictor-12 Flate content stream round-trips") {
    val latin1 = java.nio.charset.StandardCharsets.ISO_8859_1
    val cs = "BT /F1 12 Tf 72 720 Td (Predicted) Tj 0 -14 Td (Stream) Tj ET"
    val enc = deflateBytes(pngFilter(cs.getBytes(latin1), 16, _ => 2))
    val out = new java.io.ByteArrayOutputStream()
    def w(s: String): Unit = out.write(s.getBytes(latin1))
    w("%PDF-1.5\n")
    w("1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n")
    w("2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n")
    w("3 0 obj << /Type /Page /Parent 2 0 R /Contents 4 0 R >> endobj\n")
    w(s"4 0 obj << /Length ${enc.length} /Filter /FlateDecode " +
      "/DecodeParms << /Predictor 12 /Columns 16 >> >> stream\n")
    out.write(enc); w("\nendstream endobj\n")
    w("%%EOF\n")
    val pages = PdfText.pages(out.toByteArray)
    assert(pages == Seq("Predicted\nStream"), pages)
  }

  /** Catalog, page tree, and page dict all live INSIDE a /Type /ObjStm
    * container (itself Flate + predictor encoded) — the PDF 1.5+
    * layout where only content streams remain direct objects. */
  test("object-stream PDF: compressed catalog/pages resolve") {
    val latin1 = java.nio.charset.StandardCharsets.ISO_8859_1
    val bodies = Seq(
      1 -> "<< /Type /Catalog /Pages 2 0 R >>",
      2 -> "<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
      3 -> "<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>")
    val joined = bodies.map(_._2)
    val offsets = joined.scanLeft(0)(_ + _.length + 1).init
    val header = bodies.map(_._1).zip(offsets)
      .map { case (n, o) => s"$n $o" }.mkString(" ") + "\n"
    val payload = (header + joined.mkString("\n")).getBytes(latin1)
    val stm = deflateBytes(pngFilter(payload, 24, r => (r % 4) + 1))
    val cs = "BT (ObjStm text) Tj ET".getBytes(latin1)
    val out = new java.io.ByteArrayOutputStream()
    def w(s: String): Unit = out.write(s.getBytes(latin1))
    w("%PDF-1.5\n")
    w(s"7 0 obj << /Type /ObjStm /N ${bodies.size} /First ${header.length} " +
      s"/Length ${stm.length} /Filter /FlateDecode " +
      "/DecodeParms << /Predictor 11 /Columns 24 >> >> stream\n")
    out.write(stm); w("\nendstream endobj\n")
    w(s"4 0 obj << /Length ${cs.length} >> stream\n")
    out.write(cs); w("\nendstream endobj\n")
    w("%%EOF\n")
    val pages = PdfText.pages(out.toByteArray)
    assert(pages == Seq("ObjStm text"), pages)
  }

  test("embedded /DCTDecode image round-trips: extraction, real JPEG" +
      " decode, twin collision at distance 0") {
    import graft.ops.Multimodal
    val pdf = Multimodal.renderTestPdfJpeg(seed = 7, perturb = 0)
    // the text parser still accepts the document (image-only page)
    assert(PdfText.pages(pdf).size == 1)
    val imgs = PdfText.images(pdf)
    assert(imgs.size == 1, s"one image XObject expected: ${imgs.size}")
    val im = imgs.head
    assert(im.width == 32 && im.height == 32 && im.dctEncoded)
    // the extracted stream is the verbatim JPEG: JDK decodes it with
    // real dimensions, and its hash equals hashing the JPEG directly
    val dec = new Multimodal.ImageIoDecoder().decode(im.data)
    assert(dec.ok && dec.width == 32 && dec.height == 32)
    assert(Multimodal.dHash64(im.data) ==
      Multimodal.dHash64(Multimodal.renderTestJpeg(7, 0)))
    // identical twin PDF collides at Hamming distance 0
    val twin = Multimodal.renderTestPdfJpeg(seed = 7, perturb = 0)
    assert(Multimodal.dHash64(PdfText.images(twin).head.data) ==
      Multimodal.dHash64(im.data))
    // imageless and malformed inputs degrade to empty, never throw
    assert(PdfText.images("%PDF-1.4\nno images".getBytes).isEmpty)
    assert(PdfText.images(Array[Byte](1, 2, 3)).isEmpty)
    assert(PdfText.images(null).isEmpty)
  }
}

class JsonlSourceSpec extends AnyFunSuite with graft.SparkTestBase {
  import graft.sources.JsonlSource

  test("admitted/quarantined partition one scan; raw broken lines preserved") {
    val dir = java.nio.file.Files.createTempDirectory("jsonl")
    java.nio.file.Files.write(dir.resolve("a.jsonl"), Seq(
      """{"id": 1, "name": "ok"}""",
      """{"id": 2, "name":""", // truncated mid-record
      """not json at all""",
      """{"id": 3, "name": "fine"}""").mkString("\n").getBytes)
    val schema = new org.apache.spark.sql.types.StructType()
      .add("id", "long").add("name", "string")
    val df = JsonlSource.read(spark, dir.toString, schema)
    val good = JsonlSource.admitted(df).orderBy("id").collect()
    assert(good.map(_.getLong(0)).toSeq == Seq(1L, 3L))
    assert(!good.head.schema.fieldNames.contains(JsonlSource.CorruptCol))
    val bad = JsonlSource.quarantined(df).collect().map(_.getString(0)).toSet
    assert(bad == Set("""{"id": 2, "name":""", "not json at all"),
      s"raw lines must survive whole for the dead-letter queue: $bad")
  }

  test("CsvSource quarantines type-mismatched rows, admits the rest typed") {
    val dir = java.nio.file.Files.createTempDirectory("csv")
    java.nio.file.Files.write(dir.resolve("a.csv"), Seq(
      "1,en,120",
      "2,fr,notanumber", // LONG column with garbage -> quarantined
      "3,de,77").mkString("\n").getBytes)
    val schema = new org.apache.spark.sql.types.StructType()
      .add("id", "long").add("lang", "string").add("n", "long")
    val df = graft.sources.CsvSource.read(spark, dir.toString, schema)
    val good = graft.sources.CsvSource.admitted(df).orderBy("id").collect()
    assert(good.map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq ==
      Seq((1L, "en", 120L), (3L, "de", 77L)))
    val bad = graft.sources.CsvSource.quarantined(df).collect().map(_.getString(0))
    assert(bad.toSeq == Seq("2,fr,notanumber"), bad.mkString("|"))
  }

  test("writeSharded: shards capped at maxRecordsPerFile, lossless round-trip") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("jsonl_out").toString
    val docs = (1L to 95L).map(i => (i, s"text $i é中"))
      .toDF("id", "text").repartition(2)
    JsonlSource.writeSharded(docs, dir, maxRecordsPerFile = 10)
    val files = new java.io.File(dir).listFiles()
      .filter(f => f.getName.endsWith(".json"))
    assert(files.length >= 10, s"95 rows / cap 10 needs >= 10 shards: ${files.length}")
    files.foreach { f =>
      val lines = java.nio.file.Files.readAllLines(f.toPath).size()
      assert(lines <= 10, s"${f.getName} holds $lines > cap")
    }
    val schema = new org.apache.spark.sql.types.StructType()
      .add("id", "long").add("text", "string")
    val back = spark.read.schema(schema).json(dir)
      .as[(Long, String)].collect().toSet
    assert(back == docs.as[(Long, String)].collect().toSet,
      "unicode text must round-trip byte-identically")
  }
}
