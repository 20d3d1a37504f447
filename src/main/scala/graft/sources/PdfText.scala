package graft.sources

/** Minimal pure-JVM PDF text extraction (S8).
  *
  * Replaces the round-1 stub with a real parser for the common core of
  * the format, so the `/case/fetch`-equivalent path (reference
  * `chatbot/app.py:585-591`: PyPDF2 page loop, page texts joined with
  * `"\n"`) returns actual document text instead of placeholders:
  *
  *  - object scan (`N G obj … endobj`) — xref-free, tolerant of linearized
  *    or appended-update files;
  *  - stream decoding with `/FlateDecode` via `java.util.zip.Inflater`
  *    (the overwhelmingly dominant filter for text content);
  *  - page order from the catalog's page tree (`/Root → /Pages → /Kids`),
  *    falling back to document order of `/Type /Page` objects;
  *  - content-stream text operators: `Tj`, `'`, `"`, `TJ` arrays, with
  *    literal-string escapes (octal, specials, line continuations, nested
  *    parens) and hex strings; `Td`/`TD`/`T*` emit line breaks.
  *
  *  - composite (CID/Type0) fonts via `/ToUnicode` CMaps: each page's
  *    `/Resources → /Font` entries are resolved, their CMap streams
  *    parsed (`codespacerange` width, `bfchar` pairs, `bfrange` runs —
  *    both incremented-destination and array forms), and show-operator
  *    strings are decoded code-by-code through the selected font
  *    (tracked via `Tf`). This is the PyPDF2 capability the reference
  *    relies on for court-slip PDFs (`chatbot/app.py:585-591`).
  *
  *  - simple fonts with per-font `/Encoding → /Differences` tables:
  *    remapped codes resolve through an Adobe-Glyph-List subset (plus
  *    `uniXXXX` names); unmapped codes keep their Latin-1 fallback.
  *  - `/LZWDecode` streams (PDF-flavored TIFF LZW: 9→12-bit codes,
  *    clear/EOD, early width change) alongside `/FlateDecode`.
  *  - `/DecodeParms` predictors on Flate/LZW streams: PNG row filters
  *    None/Sub/Up/Average/Paeth (Predictor 10-15) and TIFF horizontal
  *    differencing (Predictor 2) — the encodings object/xref-stream
  *    PDFs, the most common modern layout, apply to their streams.
  *  - object streams (`/Type /ObjStm`): contained objects are expanded
  *    into the object map, so catalogs/pages/fonts compressed into
  *    1.5+ object streams resolve like direct objects.
  *
  *  - embedded raster images ([[images]]): `/Subtype /Image` XObjects,
  *    with `/DCTDecode` streams returned as verbatim JPEG bytes —
  *    decodable by `javax.imageio` downstream (the multimodal tier's
  *    perceptual hashes ride exactly that path).
  *
  * Remaining boundary (documented, not hidden): JPX (JPEG 2000 — no
  * JDK codec) image payloads decode only to their raw bytes, and DCT
  * streams never carry text, so text extraction is unaffected. Wire a
  * full codec behind [[PdfSource.PdfTextExtractor]] if JPX pixel
  * fidelity is ever needed.
  */
object PdfText {

  private val Latin1 = java.nio.charset.StandardCharsets.ISO_8859_1

  private final case class PObj(num: Int, body: String, data: Option[Array[Byte]])

  /** Per-page extracted text, in page-tree order. Never throws: a
    * document the parser cannot make sense of yields Nil, a single
    * malformed page yields "" — hostile PDFs are data at corpus scale. */
  def pages(bytes: Array[Byte]): Seq[String] =
    try pagesImpl(bytes)
    catch { case _: Exception | _: StackOverflowError => Nil }

  /** One embedded raster image (`/Subtype /Image` XObject stream).
    * `/DCTDecode` streams carry their RAW JPEG bytes — the PDF spec
    * stores DCT images as complete JFIF streams, so `javax.imageio`
    * decodes them downstream (this is how the DCT boundary closes for
    * the image tier: text never lived in DCT streams, pixels do).
    * Flate/LZW image streams arrive already inflated + depredicted
    * (raw samples, interpret via width/height/bpc). */
  final case class PdfImage(obj: Int, width: Int, height: Int,
      dctEncoded: Boolean, data: Array[Byte])

  private val imgSubtype =
    java.util.regex.Pattern.compile("/Subtype\\s*/Image\\b")

  /** Every embedded raster image, document order; lenient like
    * [[pages]] — malformed input degrades to empty, never throws. */
  def images(bytes: Array[Byte]): Seq[PdfImage] =
    try {
      if (bytes == null || bytes.length < 5) return Nil
      val s = new String(bytes, Latin1)
      if (!s.startsWith("%PDF-")) return Nil
      expandObjStm(parseObjects(s, bytes)).values.toSeq.sortBy(_.num)
        .collect {
          case o if o.data.isDefined && imgSubtype.matcher(o.body).find() =>
            PdfImage(o.num, intParam(o.body, "/Width", 0),
              intParam(o.body, "/Height", 0),
              o.body.contains("/DCTDecode"), o.data.get)
        }
    } catch { case _: Exception | _: StackOverflowError => Nil }

  private def pagesImpl(bytes: Array[Byte]): Seq[String] = {
    if (bytes == null || bytes.length < 5) return Nil
    val s = new String(bytes, Latin1) // 1:1 byte↔char so offsets align
    if (!s.startsWith("%PDF-")) return Nil
    val objs = expandObjStm(parseObjects(s, bytes))
    val order = pageOrder(objs)
    order.flatMap(objs.get).map { page =>
      // Per-page containment: one malformed page degrades to "" while
      // its siblings still extract — at corpus scale a hostile PDF is
      // data, not an error (same contract as HeaderDecoder).
      try extractText(
        contentsOf(page.body).flatMap(objs.get).flatMap(_.data)
          .map(new String(_, Latin1)).mkString("\n"),
        fontMaps(page.body, objs))
      catch { case _: Exception | _: StackOverflowError => "" }
    }
  }

  // ---- fonts / ToUnicode CMaps --------------------------------------------

  /** Per-code unicode mapping from a font's `/ToUnicode` CMap. */
  private[graft] final case class ToUnicode(twoByte: Boolean, map: Map[Int, String]) {
    /** Decode a raw show string (chars are bytes via Latin-1). Unmapped
      * codes fall back to their raw char — the PyPDF2 behavior. */
    def decode(raw: String): String = {
      val out = new StringBuilder(raw.length)
      if (twoByte) {
        var i = 0
        while (i + 1 < raw.length) {
          val code = (raw.charAt(i) << 8) | (raw.charAt(i + 1) & 0xff)
          out ++= map.getOrElse(code, "")
          i += 2
        }
        if (i < raw.length) out ++= map.getOrElse(raw.charAt(i).toInt, raw.charAt(i).toString)
      } else {
        var i = 0
        while (i < raw.length) {
          val c = raw.charAt(i)
          out ++= map.getOrElse(c.toInt, c.toString)
          i += 1
        }
      }
      out.toString
    }
  }

  private val hexTok = java.util.regex.Pattern.compile("<([0-9A-Fa-f]+)>")

  /** UTF-16BE hex → string (4-digit code units; short hex = one unit). */
  private def hexToUnicode(h: String): String =
    if (h.length <= 4) Integer.parseInt(h, 16).toChar.toString
    else h.grouped(4).filter(_.length == 4)
      .map(u => Integer.parseInt(u, 16).toChar).mkString

  /** Parse a ToUnicode CMap stream: code width from the codespacerange,
    * `bfchar` pairs, `bfrange` runs (both `<lo> <hi> <dstStart>` and
    * `<lo> <hi> [<d0> <d1> …]` forms). */
  private[graft] def parseToUnicode(cmap: String): ToUnicode = {
    val twoByte = {
      val i = cmap.indexOf("begincodespacerange")
      if (i < 0) true // CID fonts default to 2-byte codes
      else {
        val m = hexTok.matcher(cmap)
        m.find(i) && m.group(1).length > 2
      }
    }
    val map = Map.newBuilder[Int, String]

    def sections(begin: String, end: String): Iterator[String] = {
      var from = 0
      Iterator.continually {
        val b = cmap.indexOf(begin, from)
        if (b < 0) None
        else {
          val e = cmap.indexOf(end, b)
          val stop = if (e < 0) cmap.length else e
          from = stop + end.length
          Some(cmap.substring(b + begin.length, stop))
        }
      }.takeWhile(_.isDefined).flatten
    }

    sections("beginbfchar", "endbfchar").foreach { body =>
      val m = hexTok.matcher(body)
      val toks = Iterator.continually(if (m.find()) Some(m.group(1)) else None)
        .takeWhile(_.isDefined).flatten.toSeq
      toks.grouped(2).foreach {
        case Seq(src, dst) => map += Integer.parseInt(src, 16) -> hexToUnicode(dst)
        case _ => ()
      }
    }

    sections("beginbfrange", "endbfrange").foreach { body =>
      // tokenize hex strings and arrays in order
      val tok = java.util.regex.Pattern.compile("<([0-9A-Fa-f]+)>|(\\[)|(\\])")
      val m = tok.matcher(body)
      val toks = scala.collection.mutable.ArrayBuffer.empty[String]
      while (m.find()) toks += (if (m.group(1) != null) m.group(1)
        else if (m.group(2) != null) "[" else "]")
      var i = 0
      while (i + 3 <= toks.length) {
        val lo = Integer.parseInt(toks(i), 16)
        val hi = Integer.parseInt(toks(i + 1), 16)
        if (toks(i + 2) == "[") {
          var j = i + 3
          var code = lo
          while (j < toks.length && toks(j) != "]") {
            map += code -> hexToUnicode(toks(j)); code += 1; j += 1
          }
          i = j + 1
        } else {
          val dst = hexToUnicode(toks(i + 2))
          var code = lo
          while (code <= hi) {
            // increment the LAST UTF-16 unit (the spec's bfrange rule)
            val bumped =
              if (dst.isEmpty) ""
              else dst.dropRight(1) + (dst.last + (code - lo)).toChar
            map += code -> bumped
            code += 1
          }
          i += 3
        }
      }
    }
    ToUnicode(twoByte, map.result())
  }

  /** Resolve the page's `/Resources → /Font` entries to their ToUnicode
    * maps (fonts without a CMap are absent → Latin-1 fallback). */
  private def fontMaps(pageBody: String, objs: Map[Int, PObj]): Map[String, ToUnicode] = {
    val resBody: String = {
      val i = pageBody.indexOf("/Resources")
      if (i < 0) return Map.empty
      val after = pageBody.substring(i + "/Resources".length)
      val trimmed = after.dropWhile(_.isWhitespace)
      val refM = refPat.matcher(trimmed)
      if (refM.lookingAt()) objs.get(refM.group(1).toInt).map(_.body).getOrElse("")
      else trimmed
    }
    val fi = resBody.indexOf("/Font")
    if (fi < 0) return Map.empty
    val fontDict: String = {
      val after = resBody.substring(fi + "/Font".length)
      val trimmed = after.dropWhile(_.isWhitespace)
      val refM = refPat.matcher(trimmed)
      if (refM.lookingAt()) objs.get(refM.group(1).toInt).map(_.body).getOrElse("")
      else {
        val stop = trimmed.indexOf(">>") // font values are refs — no nesting
        if (stop >= 0) trimmed.substring(0, stop) else trimmed
      }
    }
    val entry = java.util.regex.Pattern.compile("/([A-Za-z0-9.+_-]+)\\s+(\\d+)\\s+\\d+\\s+R")
    val m = entry.matcher(fontDict)
    val out = Map.newBuilder[String, ToUnicode]
    while (m.find()) {
      val name = m.group(1)
      objs.get(m.group(2).toInt).foreach { fontObj =>
        val viaCmap = for {
          cmRef <- firstRef(fontObj.body, "/ToUnicode")
          cmObj <- objs.get(cmRef)
          data <- cmObj.data
        } yield parseToUnicode(new String(data, Latin1))
        // /ToUnicode wins when both exist (it is authoritative); a
        // simple font with only /Encoding → /Differences re-encoding
        // decodes through the glyph-name table
        viaCmap.orElse(differencesMap(fontObj.body, objs))
          .foreach(tu => out += name -> tu)
      }
    }
    out.result()
  }

  /** Per-font `/Encoding → /Differences` re-encoding for SIMPLE fonts:
    * the array alternates a start code with glyph NAMES assigned to
    * consecutive codes. Names resolve through [[glyphToUnicode]]
    * (AGL subset + `uniXXXX`); unresolved names stay unmapped so the
    * decoder's Latin-1 fallback applies — PyPDF2's behavior for glyphs
    * outside its AGL table. The /Encoding value may be inline or an
    * indirect encoding object. */
  private def differencesMap(fontBody: String,
      objs: Map[Int, PObj]): Option[ToUnicode] = {
    val encBody: Option[String] = {
      val i = fontBody.indexOf("/Encoding")
      if (i < 0) None
      else {
        val trimmed = fontBody.substring(i + "/Encoding".length)
          .dropWhile(_.isWhitespace)
        val refM = refPat.matcher(trimmed)
        if (refM.lookingAt()) objs.get(refM.group(1).toInt).map(_.body)
        else Some(trimmed)
      }
    }
    encBody.flatMap { b =>
      val di = b.indexOf("/Differences")
      if (di < 0) None
      else {
        val open = b.indexOf('[', di)
        val close = if (open < 0) -1 else b.indexOf(']', open)
        if (close < 0) None
        else {
          val tok = java.util.regex.Pattern
            .compile("(\\d+)|/([A-Za-z0-9._]+)")
            .matcher(b.substring(open + 1, close))
          var code = 0
          val mp = Map.newBuilder[Int, String]
          while (tok.find()) {
            if (tok.group(1) != null) code = tok.group(1).toInt
            else {
              glyphToUnicode(tok.group(2)).foreach(u => mp += code -> u)
              code += 1
            }
          }
          val result = mp.result()
          if (result.isEmpty) None
          else Some(ToUnicode(twoByte = false, result))
        }
      }
    }
  }

  /** Adobe-Glyph-List subset covering the names `/Differences` tables
    * actually remap in text documents (ASCII names, common punctuation
    * and quotes, f-ligatures, accented Latin), plus the systematic
    * `uniXXXX` escape. Single-character alphanumeric names denote
    * themselves in the AGL. */
  private[graft] def glyphToUnicode(name: String): Option[String] = {
    if (name.length == 1 && name.charAt(0).isLetterOrDigit) Some(name)
    else if (name.startsWith("uni") && name.length >= 7 &&
        name.substring(3, 7).forall(c => Character.digit(c, 16) >= 0))
      Some(Integer.parseInt(name.substring(3, 7), 16).toChar.toString)
    else aglSubset.get(name)
  }

  private val aglSubset: Map[String, String] = Map(
    "space" -> " ", "exclam" -> "!", "quotedbl" -> "\"",
    "numbersign" -> "#", "dollar" -> "$", "percent" -> "%",
    "ampersand" -> "&", "quotesingle" -> "'", "parenleft" -> "(",
    "parenright" -> ")", "asterisk" -> "*", "plus" -> "+", "comma" -> ",",
    "hyphen" -> "-", "period" -> ".", "slash" -> "/", "zero" -> "0",
    "one" -> "1", "two" -> "2", "three" -> "3", "four" -> "4",
    "five" -> "5", "six" -> "6", "seven" -> "7", "eight" -> "8",
    "nine" -> "9", "colon" -> ":", "semicolon" -> ";", "less" -> "<",
    "equal" -> "=", "greater" -> ">", "question" -> "?", "at" -> "@",
    "bracketleft" -> "[", "backslash" -> "\\", "bracketright" -> "]",
    "asciicircum" -> "^", "underscore" -> "_", "grave" -> "`",
    "braceleft" -> "{", "bar" -> "|", "braceright" -> "}",
    "asciitilde" -> "~",
    "quoteleft" -> "‘", "quoteright" -> "’",
    "quotedblleft" -> "“", "quotedblright" -> "”",
    "endash" -> "–", "emdash" -> "—", "bullet" -> "•",
    "ellipsis" -> "…", "dagger" -> "†", "daggerdbl" -> "‡",
    "fi" -> "ﬁ", "fl" -> "ﬂ", "ff" -> "ﬀ",
    "ffi" -> "ﬃ", "ffl" -> "ﬄ",
    "germandbls" -> "ß", "ae" -> "æ", "AE" -> "Æ",
    "oslash" -> "ø", "Oslash" -> "Ø",
    "cent" -> "¢", "sterling" -> "£", "yen" -> "¥",
    "section" -> "§", "copyright" -> "©",
    "registered" -> "®", "trademark" -> "™",
    "degree" -> "°", "plusminus" -> "±",
    "aacute" -> "á", "agrave" -> "à", "acircumflex" -> "â",
    "adieresis" -> "ä", "atilde" -> "ã", "aring" -> "å",
    "ccedilla" -> "ç", "eacute" -> "é", "egrave" -> "è",
    "ecircumflex" -> "ê", "edieresis" -> "ë",
    "iacute" -> "í", "igrave" -> "ì", "icircumflex" -> "î",
    "idieresis" -> "ï", "ntilde" -> "ñ", "oacute" -> "ó",
    "ograve" -> "ò", "ocircumflex" -> "ô",
    "odieresis" -> "ö", "otilde" -> "õ", "uacute" -> "ú",
    "ugrave" -> "ù", "ucircumflex" -> "û",
    "udieresis" -> "ü", "yacute" -> "ý", "ydieresis" -> "ÿ",
    "Aacute" -> "Á", "Agrave" -> "À", "Adieresis" -> "Ä",
    "Ccedilla" -> "Ç", "Eacute" -> "É", "Egrave" -> "È",
    "Iacute" -> "Í", "Ntilde" -> "Ñ", "Oacute" -> "Ó",
    "Odieresis" -> "Ö", "Uacute" -> "Ú", "Udieresis" -> "Ü")

  // ---- object layer -------------------------------------------------------

  private val objStart =
    java.util.regex.Pattern.compile("(?<![0-9])(\\d{1,9})\\s+\\d{1,9}\\s+obj\\b")

  private def parseObjects(s: String, bytes: Array[Byte]): Map[Int, PObj] = {
    val out = Map.newBuilder[Int, PObj]
    val m = objStart.matcher(s)
    while (m.find()) {
      val num = m.group(1).toInt
      val bodyStart = m.end()
      val end = s.indexOf("endobj", bodyStart)
      val stop = if (end < 0) s.length else end
      val streamKw = s.indexOf("stream", bodyStart)
      if (streamKw >= 0 && streamKw < stop && !s.startsWith("streams", streamKw)) {
        val dict = s.substring(bodyStart, streamKw)
        var dataStart = streamKw + "stream".length
        if (dataStart < s.length && s.charAt(dataStart) == '\r') dataStart += 1
        if (dataStart < s.length && s.charAt(dataStart) == '\n') dataStart += 1
        val endStream = s.indexOf("endstream", dataStart)
        if (endStream >= 0) {
          var dataEnd = endStream
          // trailing EOL before the keyword is not stream data
          if (dataEnd > dataStart && s.charAt(dataEnd - 1) == '\n') dataEnd -= 1
          if (dataEnd > dataStart && s.charAt(dataEnd - 1) == '\r') dataEnd -= 1
          val raw = java.util.Arrays.copyOfRange(bytes, dataStart, dataEnd)
          val data =
            if (dict.contains("/FlateDecode")) depredict(inflate(raw), dict)
            else if (dict.contains("/LZWDecode")) depredict(lzwDecode(raw), dict)
            else raw
          out += num -> PObj(num, dict, Some(data))
        } else out += num -> PObj(num, s.substring(bodyStart, stop), None)
      } else out += num -> PObj(num, s.substring(bodyStart, stop), None)
    }
    out.result()
  }

  // ---- DecodeParms predictors ---------------------------------------------

  private def intParam(dict: String, key: String, dflt: Int): Int = {
    val m = java.util.regex.Pattern
      .compile(java.util.regex.Pattern.quote(key) + "\\s+(\\d{1,9})(?!\\d)")
      .matcher(dict)
    if (m.find()) m.group(1).toInt else dflt
  }

  /** Undo a `/DecodeParms` predictor after Flate/LZW decode. Predictor 1
    * (or no params) is identity; 2 is TIFF horizontal differencing;
    * 10-15 are the PNG row filters (the value only records the
    * encoder's choice — each row carries its own filter-type byte).
    * Malformed geometry degrades to the decoded bytes unchanged: at
    * corpus scale a bad predictor dict is data, not an error. */
  private[graft] def depredict(decoded: Array[Byte], dict: String): Array[Byte] = {
    if (!(dict.contains("/DecodeParms") || dict.contains("/DP"))) return decoded
    val pred = intParam(dict, "/Predictor", 1)
    if (pred <= 1 || decoded.isEmpty) return decoded
    val columns = intParam(dict, "/Columns", 1)
    val colors = intParam(dict, "/Colors", 1)
    val bpc = intParam(dict, "/BitsPerComponent", 8)
    if (columns <= 0 || colors <= 0 || colors > 60 ||
        !Set(1, 2, 4, 8, 16).contains(bpc)) return decoded
    try {
      if (pred == 2) tiffUnpredict(decoded, columns, colors, bpc)
      else if (pred >= 10 && pred <= 15) pngUnfilter(decoded, columns, colors, bpc)
      else decoded
    } catch { case _: Exception => decoded }
  }

  /** TIFF predictor 2: each sample is stored as a delta from the sample
    * one pixel to its left; undo by a running per-row prefix sum. Only
    * the ubiquitous 8-bit-component case is delta-coded; exotic bit
    * depths pass through unchanged (PDF 32000-1 §7.4.4.4 note). */
  private[graft] def tiffUnpredict(data: Array[Byte], columns: Int,
      colors: Int, bpc: Int): Array[Byte] = {
    if (bpc != 8) return data
    val rowLen = columns * colors
    if (rowLen <= 0) return data
    val out = data.clone()
    var row = 0
    while (row + rowLen <= out.length) {
      var i = colors
      while (i < rowLen) {
        out(row + i) = ((out(row + i) + out(row + i - colors)) & 0xff).toByte
        i += 1
      }
      row += rowLen
    }
    out
  }

  /** PNG unfilter (RFC 2083 §6): every row = 1 filter-type byte + rowLen
    * filtered bytes; types 0-4 = None/Sub/Up/Average/Paeth, reconstructed
    * against the left/up/up-left neighbors in DECODED space. A trailing
    * partial row (truncated stream) is dropped — keep-prefix policy,
    * consistent with the Flate/LZW corrupt-stream handling. */
  private[graft] def pngUnfilter(data: Array[Byte], columns: Int,
      colors: Int, bpc: Int): Array[Byte] = {
    val bpp = math.max(1, colors * bpc / 8)
    val rowLen = (columns * colors * bpc + 7) / 8
    val stride = rowLen + 1
    val rows = data.length / stride
    val out = new Array[Byte](rows * rowLen)
    var r = 0
    while (r < rows) {
      val ft = data(r * stride) & 0xff
      val src = r * stride + 1
      val dst = r * rowLen
      var i = 0
      while (i < rowLen) {
        val x = data(src + i) & 0xff
        val a = if (i >= bpp) out(dst + i - bpp) & 0xff else 0
        val b = if (r > 0) out(dst - rowLen + i) & 0xff else 0
        val c = if (r > 0 && i >= bpp) out(dst - rowLen + i - bpp) & 0xff else 0
        val v = ft match {
          case 0 => x
          case 1 => x + a
          case 2 => x + b
          case 3 => x + (a + b) / 2
          case 4 =>
            val p = a + b - c
            val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
            x + (if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c)
          case _ => x // unknown filter byte: pass through, keep decoding
        }
        out(dst + i) = (v & 0xff).toByte
        i += 1
      }
      r += 1
    }
    out
  }

  // ---- object streams ------------------------------------------------------

  private val objStmType = java.util.regex.Pattern.compile("/Type\\s*/ObjStm\\b")

  /** Expand `/Type /ObjStm` container streams: the decoded stream starts
    * with N (objnum, offset) integer pairs, then the object bodies at
    * `/First + offset`. Contained objects (dicts only — the spec forbids
    * nested streams) are merged into the object map with DIRECT objects
    * winning number collisions, matching incremental-update precedence.
    * Malformed containers contribute nothing rather than failing the
    * document. */
  private def expandObjStm(objs: Map[Int, PObj]): Map[Int, PObj] = {
    val contained = Map.newBuilder[Int, PObj]
    for (o <- objs.values if o.data.isDefined && objStmType.matcher(o.body).find()) {
      try {
        val data = new String(o.data.get, Latin1)
        val n = intParam(o.body, "/N", 0)
        val first = math.min(intParam(o.body, "/First", 0), data.length)
        val header = data.substring(0, first).trim
          .split("\\s+").filter(_.nonEmpty)
        val pairs = header.grouped(2).take(n).collect {
          case Array(num, off) if num.forall(_.isDigit) && off.forall(_.isDigit) =>
            (num.toInt, off.toInt)
        }.toArray
        for (i <- pairs.indices) {
          val start = first + pairs(i)._2
          val end =
            if (i + 1 < pairs.length) math.min(first + pairs(i + 1)._2, data.length)
            else data.length
          if (start >= 0 && start <= end && end <= data.length)
            contained += pairs(i)._1 -> PObj(pairs(i)._1, data.substring(start, end), None)
        }
      } catch { case _: Exception => () }
    }
    contained.result() ++ objs // direct objects win on number collisions
  }

  /** PDF LZW (spec 7.4.4, TIFF flavor): variable 9→12-bit codes, code
    * 256 = clear table, 257 = end of data, EARLY width change (the
    * length bumps one code before the table index requires it —
    * EarlyChange default 1). The KwKwK corner (a code referencing the
    * entry being defined) emits prev + prev[0], the classic LZW rule. */
  /** Decompression output cap (64 MiB): a crafted tiny stream can
    * legally expand ~1000x (Flate) or ~4096x (LZW) per input byte — an
    * unbounded decode is the decompression-bomb hang/OOM vector. No
    * real text content stream approaches this; hitting the cap keeps
    * the decoded prefix, consistent with the corrupt-stream policy. */
  private val MaxStreamBytes = 1 << 26

  private[graft] def lzwDecode(data: Array[Byte]): Array[Byte] = {
    val Clear = 256
    val Eod = 257
    val out = new java.io.ByteArrayOutputStream(math.max(64, data.length * 4))
    val table = new Array[Array[Byte]](4096)
    var next = 258
    var codeBits = 9
    var prev: Array[Byte] = null
    var acc = 0L
    var nbits = 0
    var i = 0
    var done = false
    while (!done) {
      if (nbits < codeBits) {
        if (i < data.length) {
          acc = (acc << 8) | (data(i) & 0xffL); nbits += 8; i += 1
        } else done = true // ran off the end without EOD: stop cleanly
      } else {
        val code = ((acc >>> (nbits - codeBits)) & ((1L << codeBits) - 1)).toInt
        nbits -= codeBits
        if (code == Eod) done = true
        else if (code == Clear) { next = 258; codeBits = 9; prev = null }
        else {
          val entry: Array[Byte] =
            if (code < 256) Array(code.toByte)
            else if (code < next && table(code) != null) table(code)
            // KwKwK: the ONLY valid not-yet-defined code is exactly `next`
            // (a code referencing the entry being built). Anything beyond
            // that is a corrupt stream, not a decode rule — fall through to
            // the stop-cleanly-keep-prefix policy like the other corrupt
            // branches instead of fabricating prev + prev[0] bytes.
            else if (code == next && prev != null) prev :+ prev(0)
            else null
          if (entry == null) done = true // corrupt stream: stop, keep prefix
          else if (out.size() > MaxStreamBytes) done = true // bomb cap
          else {
            out.write(entry, 0, entry.length)
            if (prev != null && next < 4096) {
              table(next) = prev :+ entry(0); next += 1
            }
            prev = entry
            // early change: width grows when the NEXT code to assign is
            // the last expressible one, not after it is used
            if (next == (1 << codeBits) - 1 && codeBits < 12) codeBits += 1
          }
        }
      }
    }
    out.toByteArray
  }

  private def inflate(data: Array[Byte]): Array[Byte] = {
    val inf = new java.util.zip.Inflater()
    try {
      inf.setInput(data)
      val out = new java.io.ByteArrayOutputStream(math.max(64, data.length * 4))
      val buf = new Array[Byte](8192)
      var n = inf.inflate(buf)
      while (n > 0 && out.size() <= MaxStreamBytes) {
        out.write(buf, 0, n)
        n = if (inf.finished()) 0 else inf.inflate(buf)
      }
      out.toByteArray
    } catch {
      case _: java.util.zip.DataFormatException => Array.emptyByteArray
    } finally inf.end()
  }

  // ---- page tree ----------------------------------------------------------

  // digit counts bounded at 9 so .toInt can never overflow on hostile
  // input (a 20-digit "object number" simply fails to match — the
  // object is ignored, the document still parses)
  private val refPat =
    java.util.regex.Pattern.compile("(?<!\\d)(\\d{1,9})\\s+\\d{1,9}\\s+R")

  private def firstRef(body: String, key: String): Option[Int] = {
    val i = body.indexOf(key)
    if (i < 0) return None
    val m = refPat.matcher(body)
    if (m.find(i + key.length)) Some(m.group(1).toInt) else None
  }

  private def kidRefs(body: String): Seq[Int] = {
    val i = body.indexOf("/Kids")
    if (i < 0) return Nil
    val open = body.indexOf('[', i)
    val close = body.indexOf(']', open)
    if (open < 0 || close < 0) return Nil
    val m = refPat.matcher(body.substring(open, close))
    val out = Seq.newBuilder[Int]
    while (m.find()) out += m.group(1).toInt
    out.result()
  }

  private def isPage(body: String): Boolean =
    "/Type\\s*/Page(?![a-zA-Z])".r.findFirstIn(body).isDefined

  private def pageOrder(objs: Map[Int, PObj]): Seq[Int] = {
    val catalog = objs.values.find(o => o.body.contains("/Catalog"))
    val fromTree = catalog.flatMap(c => firstRef(c.body, "/Pages")).map { root =>
      // A hostile/corrupt page tree can contain cycles or repeated kids;
      // without the visited set a 2-node cycle walks 2^64 paths before
      // the depth guard prunes each — a hang, not a throw. Every node is
      // legitimately visited at most once in a well-formed tree.
      val visited = scala.collection.mutable.HashSet.empty[Int]
      def walk(n: Int, depth: Int): Seq[Int] =
        if (depth > 64 || !visited.add(n)) Nil
        else objs.get(n) match {
          case Some(o) if isPage(o.body) => Seq(n)
          case Some(o) =>
            val kids = kidRefs(o.body)
            kids.flatMap(walk(_, depth + 1))
          case None => Nil
        }
      walk(root, 0)
    }.getOrElse(Nil)
    if (fromTree.nonEmpty) fromTree
    else objs.values.toSeq.sortBy(_.num).filter(o => isPage(o.body)).map(_.num)
  }

  private def contentsOf(body: String): Seq[Int] = {
    val i = body.indexOf("/Contents")
    if (i < 0) return Nil
    val after = body.substring(i + "/Contents".length)
    val trimmed = after.dropWhile(_.isWhitespace)
    if (trimmed.startsWith("[")) {
      val close = trimmed.indexOf(']')
      val seg = if (close < 0) trimmed else trimmed.substring(0, close)
      val m = refPat.matcher(seg)
      val out = Seq.newBuilder[Int]
      while (m.find()) out += m.group(1).toInt
      out.result()
    } else {
      val m = refPat.matcher(trimmed)
      if (m.lookingAt()) Seq(m.group(1).toInt) else Nil
    }
  }

  // ---- content-stream text operators --------------------------------------

  private[sources] def extractText(cs: String,
      fonts: Map[String, ToUnicode] = Map.empty): String = {
    val sb = new StringBuilder
    val pending = scala.collection.mutable.ArrayBuffer.empty[String]
    val n = cs.length
    var i = 0
    var lastName = ""           // most recent /Name token (the Tf operand)
    var font: Option[ToUnicode] = None
    def show(s: String): Unit = sb ++= font.map(_.decode(s)).getOrElse(s)

    def parseLiteral(start: Int): Int = { // cs(start) == '('
      val out = new StringBuilder
      var depth = 1
      var j = start + 1
      while (j < n && depth > 0) {
        cs.charAt(j) match {
          case '\\' if j + 1 < n =>
            cs.charAt(j + 1) match {
              case 'n' => out += '\n'; j += 2
              case 'r' => out += '\r'; j += 2
              case 't' => out += '\t'; j += 2
              case 'b' => out += '\b'; j += 2
              case 'f' => out += '\f'; j += 2
              case '(' => out += '('; j += 2
              case ')' => out += ')'; j += 2
              case '\\' => out += '\\'; j += 2
              case '\n' => j += 2 // line continuation
              case '\r' =>
                j += 2; if (j < n && cs.charAt(j) == '\n') j += 1
              case d if d >= '0' && d <= '7' =>
                var k = j + 1; var v = 0; var cnt = 0
                while (k < n && cnt < 3 && cs.charAt(k) >= '0' && cs.charAt(k) <= '7') {
                  v = v * 8 + (cs.charAt(k) - '0'); k += 1; cnt += 1
                }
                out += v.toChar; j = k
              case other => out += other; j += 2
            }
          case '(' => depth += 1; out += '('; j += 1
          case ')' => depth -= 1; if (depth > 0) out += ')'; j += 1
          case c => out += c; j += 1
        }
      }
      pending += out.toString
      j
    }

    def parseHex(start: Int): Int = { // cs(start) == '<', not '<<'
      var j = start + 1
      val hex = new StringBuilder
      while (j < n && cs.charAt(j) != '>') {
        val c = cs.charAt(j)
        if (!c.isWhitespace) hex += c
        j += 1
      }
      val h = if (hex.length % 2 == 1) hex.append('0').toString else hex.toString
      val out = new StringBuilder(h.length / 2)
      var k = 0
      while (k + 2 <= h.length) {
        try out += Integer.parseInt(h.substring(k, k + 2), 16).toChar
        catch { case _: NumberFormatException => () }
        k += 2
      }
      pending += out.toString
      math.min(j + 1, n)
    }

    def newline(): Unit =
      if (sb.nonEmpty && sb.charAt(sb.length - 1) != '\n') sb += '\n'

    while (i < n) {
      val c = cs.charAt(i)
      if (c == '(') i = parseLiteral(i)
      else if (c == '<' && i + 1 < n && cs.charAt(i + 1) == '<') i += 2 // dict
      else if (c == '<') i = parseHex(i)
      else if (c == '/') { // name token — consume so it can't look like an op
        val start = i + 1
        i += 1
        while (i < n && !cs.charAt(i).isWhitespace && "()<>[]{}/%".indexOf(cs.charAt(i)) < 0) i += 1
        lastName = cs.substring(start, i)
      } else if (c == '%') { // comment to EOL
        while (i < n && cs.charAt(i) != '\n') i += 1
      } else if (c.isLetter || c == '\'' || c == '"') { // operator token
        var j = i
        while (j < n && !cs.charAt(j).isWhitespace && "()<>[]{}/%".indexOf(cs.charAt(j)) < 0) j += 1
        cs.substring(i, j) match {
          case "Tj" | "TJ" => pending.foreach(show); pending.clear()
          case "'" | "\"" => newline(); pending.foreach(show); pending.clear()
          case "Td" | "TD" | "T*" => newline(); pending.clear()
          case "Tf" => font = fonts.get(lastName); pending.clear()
          case _ => pending.clear() // strings consumed by non-show ops
        }
        i = math.max(j, i + 1)
      } else i += 1
    }
    sb.toString
  }
}
