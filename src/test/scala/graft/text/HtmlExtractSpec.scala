package graft.text

import org.scalatest.funsuite.AnyFunSuite

class HtmlExtractSpec extends AnyFunSuite {
  import HtmlExtract._

  test("blocks: split at block tags, collapse whitespace, decode entities") {
    val html = "<html><body><p>Hello   world</p><div>Tom &amp; Jerry &lt;3" +
      "</div><p>x</p></body></html>"
    val bs = blocks(html)
    assert(bs.map(_.text) == Seq("Hello world", "Tom & Jerry <3", "x"))
    assert(bs.map(_.idx) == Seq(0, 1, 2))
    assert(bs.forall(b => !b.chrome && b.linkLen == 0))
    assert(bs.head.textLen == 11)
  }

  test("script/style payloads never become text; stray < is text") {
    val html = "<body><script>var x = '<p>not text</p>';</script>" +
      "<style>p { color: red }</style><p>2 < 3 is true here ok</p></body>"
    val bs = blocks(html)
    assert(bs.map(_.text) == Seq("2 < 3 is true here ok"))
  }

  test("chrome flags nav/header/footer/aside content, including nesting") {
    val html = "<body><nav><a href='/'>Home</a> <a href='/a'>About</a></nav>" +
      "<div>The real article body sits here with enough characters.</div>" +
      "<footer><div>Inner footer text block</div></footer></body>"
    val bs = blocks(html)
    assert(bs.map(b => (b.text.take(4), b.chrome)) ==
      Seq(("Home", true), ("The ", false), ("Inne", true)))
  }

  test("link length counts only anchor text; keep rule drops link-dense" +
      " and short blocks") {
    val html = "<body><p><a href='x'>click here now</a> plus padding text" +
      " beyond</p><p><a>all of this entire block is one single link</a></p>" +
      "<p>tiny</p>" +
      "<p>This block has plenty of plain prose and ought to survive.</p>" +
      "</body>"
    val bs = blocks(html)
    assert(bs.length == 4)
    // block 0: link 'click here now' (14) vs total — mixed, survives
    assert(bs(0).linkLen == 14 && keep(bs(0)))
    // block 1: 100% link text → dropped
    assert(bs(1).linkLen == bs(1).textLen && !keep(bs(1)))
    // block 2: short → dropped; block 3: plain prose → kept
    assert(!keep(bs(2)) && keep(bs(3)))
    assert(extract(html).startsWith("click here now plus") &&
      extract(html).endsWith("ought to survive."))
  }

  test("malformed HTML never throws: unclosed tags, bad entities," +
      " truncated script") {
    val cases = Seq("<div><p>unclosed", "text &unknown; more &;",
      "<script>never closed", "<", "a<b>c</b", "", "<a><a><p>deep</a>",
      "&#x41;bad <nav>trail")
    cases.foreach { h => blocks(h); extract(h) } // must not throw
    assert(blocks("<div><p>unclosed").head.text == "unclosed")
    assert(blocks("text &unknown; more &;").head.text ==
      "text &unknown; more &;")
  }

  test("the synthesized q168 wrapper: chrome + short + link-dense drop," +
      " payload survives") {
    val payload = "The quick brown fox jumps over the lazy dog repeatedly."
    val html = "<html><head><title>Doc</title><style>p{color:red}</style>" +
      "</head><body><nav><a href=\"/\">Home</a> <a href=\"/a\">About</a> " +
      "<a href=\"/c\">Contact</a></nav><div>" + payload +
      "</div><aside>Sponsored <a href=\"/buy\">buy now</a> deal</aside>" +
      "<footer><a href=\"/t\">Terms</a> | <a href=\"/p\">Privacy</a>" +
      "</footer></body></html>"
    assert(extract(html) == payload)
    val bs = blocks(html)
    assert(bs.length == 5) // title, nav, payload, aside, footer
    assert(bs.count(keep(_)) == 1)
  }
}
