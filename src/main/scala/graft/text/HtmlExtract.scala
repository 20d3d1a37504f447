package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{lit, udf, when}

/** Block-level HTML main-content extraction — the boilerplate-removal
  * pass a web-corpus pipeline runs between crawl and curation (the
  * jusText / Arc90-readability family, reduced to a deterministic
  * integer rule so an external engine can re-derive every decision).
  *
  * Two tiers, mirroring the repo's multimodal discipline:
  *  - PARSING (this file, spec-gated): a single-pass state machine
  *    splits the document at block-level tags, collapses whitespace,
  *    decodes the common entities, tracks per-block anchor-text
  *    length, and flags blocks inside nav/header/footer/aside chrome.
  *    `<script>`/`<style>` payloads never reach a block.
  *  - The KEEP RULE (oracle-gated): a block survives iff it is not
  *    chrome, has ≥ `minLen` collapsed chars, and its anchor-text is
  *    under half its text (`2·linkLen < textLen`) — all exact integer
  *    comparisons over the dumped per-block features, so DuckDB
  *    re-derives decisions and aggregates independently (the q51/q161
  *    aux pattern; a float "link density" would not hash-match).
  *
  * Scale shape: parse + feature extraction is one compiled UDF — a
  * narrow per-row map, no shuffle; block rows are small integers and
  * the HTML itself never crosses an exchange.
  */
object HtmlExtract {

  /** One non-empty text block: `idx` is document order, `textLen` the
    * collapsed char count, `linkLen` the chars inside `<a>` spans,
    * `chrome` whether any enclosing tag is nav/header/footer/aside. */
  final case class Block(idx: Int, textLen: Int, linkLen: Int,
      chrome: Boolean, text: String)

  private val blockTags = Set("p", "div", "li", "ul", "ol", "h1", "h2",
    "h3", "h4", "h5", "h6", "table", "tr", "td", "th", "article",
    "section", "main", "blockquote", "pre", "br", "body", "html",
    "header", "footer", "nav", "aside", "title", "head")
  private val chromeTags = Set("nav", "header", "footer", "aside")
  private val rawTextTags = Set("script", "style")

  private val entities = Map("amp" -> "&", "lt" -> "<", "gt" -> ">",
    "quot" -> "\"", "apos" -> "'", "nbsp" -> " ", "#39" -> "'")

  /** Parse into non-empty text blocks. Lenient by contract: at corpus
    * scale malformed HTML is data, not an error — unknown tags are
    * inline, unclosed tags never throw, stray `<` is text. */
  def blocks(html: String): Seq[Block] = {
    if (html == null) return Seq.empty
    val out = scala.collection.mutable.ArrayBuffer.empty[Block]
    val text = new StringBuilder
    var linkLen = 0
    var linkDepth = 0
    var chromeDepth = 0
    var blockChrome = false // chrome state when the current block started
    var rawSkip: String = null // inside <script>/<style> until its close
    var i = 0
    val n = html.length

    def flush(): Unit = {
      // trim the collapsed buffer; count link chars only up to the
      // trimmed span (leading/trailing ws is never link text — links
      // contribute visible chars only)
      val t = text.toString.trim
      if (t.nonEmpty)
        out += Block(out.length, t.length, math.min(linkLen, t.length),
          blockChrome, t)
      text.clear(); linkLen = 0
      blockChrome = chromeDepth > 0
    }

    def appendChar(c: Char): Unit = {
      val ws = c == ' ' || c == '\t' || c == '\n' || c == '\r'
      if (ws) {
        if (text.nonEmpty && text.last != ' ') {
          text += ' '
          if (linkDepth > 0) linkLen += 1
        }
      } else {
        text += c
        if (linkDepth > 0) linkLen += 1
      }
    }

    while (i < n) {
      val c = html.charAt(i)
      if (rawSkip != null) {
        // scan for the matching close tag, case-insensitive
        // exact tag-name match, not prefix: `</scripts>` must NOT close
        // `<script>` — require the char after the name to be a non-name
        // char ('>' or whitespace)
        if (c == '<' && i + 1 < n && html.charAt(i + 1) == '/' &&
            html.regionMatches(true, i + 2, rawSkip, 0, rawSkip.length) &&
            (i + 2 + rawSkip.length >= n ||
              !html.charAt(i + 2 + rawSkip.length).isLetterOrDigit)) {
          rawSkip = null
          i = html.indexOf('>', i) match { case -1 => n; case j => j + 1 }
        } else i += 1
      } else if (c == '<' && i + 1 < n &&
          (html.charAt(i + 1).isLetter || html.charAt(i + 1) == '/')) {
        val close = html.charAt(i + 1) == '/'
        val start = if (close) i + 2 else i + 1
        var j = start
        while (j < n && (html.charAt(j).isLetterOrDigit)) j += 1
        val name = html.substring(start, j).toLowerCase
        val end = html.indexOf('>', j) match { case -1 => n - 1; case e => e }
        // a self-closing <script/> has no content to skip — entering raw
        // mode on it would swallow the rest of the document as non-text
        val selfClosing = end > j && html.charAt(end - 1) == '/'
        if (!close && rawTextTags(name) && !selfClosing) rawSkip = name
        else {
          if (name == "a") {
            if (!close) linkDepth += 1
            else if (linkDepth > 0) linkDepth -= 1
          }
          if (blockTags(name)) {
            flush()
            if (chromeTags(name)) {
              if (!close) chromeDepth += 1
              else if (chromeDepth > 0) chromeDepth -= 1
              blockChrome = chromeDepth > 0
            }
          }
        }
        i = end + 1
      } else if (c == '&') {
        val semi = html.indexOf(';', i + 1)
        val name = if (semi > i && semi - i <= 6)
          html.substring(i + 1, semi) else null
        entities.get(if (name == null) "" else name) match {
          case Some(rep) => appendChar(rep.charAt(0)); i = semi + 1
          case None => appendChar('&'); i += 1
        }
      } else { appendChar(c); i += 1 }
    }
    flush()
    out.toSeq
  }

  /** The oracle-shared keep rule — exact integer comparisons only. */
  def keep(b: Block, minLen: Int = 25): Boolean =
    !b.chrome && b.textLen >= minLen && 2 * b.linkLen < b.textLen

  /** Main text: surviving blocks joined by newline. */
  def extract(html: String, minLen: Int = 25): String =
    blocks(html).filter(keep(_, minLen)).map(_.text).mkString("\n")

  /** Per-block integer features as (idx, text_len, link_len, chrome)
    * rows — what the oracle re-derives decisions from. */
  val blockFeaturesUdf = udf { html: String =>
    blocks(html).map(b =>
      (b.idx, b.textLen, b.linkLen, if (b.chrome) 1 else 0))
  }

  val extractUdf: Column => Column = {
    val f = udf { html: String => extract(html) }
    f(_)
  }

  /** Per-block densitometric features as (idx, words, text_len,
    * link_len, chrome) rows — the inputs Kohlschütter's classifier
    * ([[densitometricContent]]) needs, including the whitespace word
    * count [[blockFeaturesUdf]] omits. */
  val blockDensityUdf = udf { html: String =>
    blocks(html).map { b =>
      val words = b.text.trim.split("\\s+").count(_.nonEmpty)
      (b.idx, words, b.textLen, b.linkLen, if (b.chrome) 1 else 0)
    }
  }

  /** Kohlschütter et al. WSDM'10 densitometric boilerplate
    * classification — boilerpipe's NumWordsRulesClassifier, the
    * published decision stumps over (prev, curr, next) block features,
    * in INTEGER-EXACT form (link density ≤ 1/3 ⟺ 3·link ≤ text;
    * ≤ 5/9 ⟺ 9·link ≤ 5·text — no float thresholds to disagree on):
    *
    *   chrome block                  → boilerplate (the q168 rule)
    *   curr link density > 1/3      → boilerplate
    *   prev link density ≤ 5/9      → content iff curr.words > 16 or
    *                                   next.words > 15 or prev.words > 4
    *   otherwise (linky prev)       → content iff curr.words > 40 or
    *                                   next.words > 17
    *
    * The CONTEXT is the point: a short block sandwiched between real
    * paragraphs survives, the same block inside a link farm dies —
    * what q168's per-block threshold cannot express. Missing
    * neighbors enter as zero-word, zero-density blocks (coalesce at
    * the call site). */
  def densitometricContent(currWords: Column, currText: Column,
      currLink: Column, prevWords: Column, prevText: Column,
      prevLink: Column, nextWords: Column, chrome: Column): Column =
    when(chrome === 1, lit(false))
      .when(currLink * 3 > currText, lit(false))
      .when(prevLink * 9 <= prevText * 5,
        currWords > 16 || nextWords > 15 || prevWords > 4)
      .otherwise(currWords > 40 || nextWords > 17)
}
