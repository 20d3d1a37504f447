package graft.text

import org.scalatest.funsuite.AnyFunSuite

class CleanTextSpec extends AnyFunSuite {
  test("strips tags and collapses whitespace") {
    assert(CleanText("<p>Hello   <b>world</b></p>") == "Hello world")
    assert(CleanText("<div>a</div><div>b</div>") == "a b")
  }
  test("decodes entities") {
    assert(CleanText("a &amp; b &lt;c&gt; &#65;&#x42;") == "a & b <c> AB")
  }
  test("drops comments, keeps text around them") {
    assert(CleanText("x<!-- hidden -->y") == "x y")
  }
  test("empty / null / plain") {
    assert(CleanText(null) == "")
    assert(CleanText("") == "")
    assert(CleanText("  plain\n\ttext  ") == "plain text")
  }
}

class LegalExtractSpec extends AnyFunSuite {
  val text =
    """Justice Marshall delivered the opinion. See Brown v. Board of Education,
      |347 U.S. 483 (1954); also 123 F.2d 456 (9th Cir. 1987) and
      |123 S. Ct. 456 (1987). Under 42 U.S.C. § 1983 and Title VII of the Civil Rights Act.
      |The Supreme Court of California disagreed. Rehnquist, C.J. dissenting.
      |See 110 Harv. L. Rev. 456 (1997). 347 U.S. 483 (1954) again.""".stripMargin.replace("\n", " ")

  test("citations: all five families, deduped, sorted") {
    val c = LegalExtract.citations(text)
    assert(c.contains("347 U.S. 483 (1954)"))
    assert(c.contains("123 F.2d 456 (9th Cir. 1987)"))
    assert(c.contains("123 S. Ct. 456 (1987)"))
    assert(c.contains("110 Harv. L. Rev. 456 (1997)"))
    assert(c.count(_ == "347 U.S. 483 (1954)") == 1) // dedup
    assert(c == c.sorted)                            // deterministic order
  }
  test("judges") {
    val j = LegalExtract.judges(text)
    assert(j.contains("Marshall"))
    assert(j.contains("Rehnquist"))
  }
  test("parties") {
    val p = LegalExtract.parties("In Brown v. Board the court held")
    assert(p.exists(_.contains("Brown")))
    assert(p.exists(_.contains("Board")))
  }
  test("courts and statutes") {
    assert(LegalExtract.courts(text).exists(_.startsWith("Supreme Court of California")))
    val s = LegalExtract.statutes(text)
    assert(s.exists(_.startsWith("42 U.S.C.")))
    assert(s.exists(_.startsWith("Title VII")))
  }
  test("empty input") {
    val r = LegalExtract(null)
    assert(r.citations.isEmpty && r.entities.judges.isEmpty)
  }
}

class TextStatsSpec extends AnyFunSuite {
  test("python str.split() semantics") {
    assert(TextStats.wordCount("") == 0)
    assert(TextStats.wordCount("   ") == 0)
    assert(TextStats.wordCount(" a  b\tc\nd ") == 4)
  }
  test("stats struct") {
    val s = TextStats("ab cd", 3)
    assert(s == TextStats.Stats(5, 2, 3))
  }
}

class Uuid5Spec extends AnyFunSuite {
  // RFC 4122 known-answer: uuid5(NAMESPACE_DNS, "www.example.org")
  test("known answer vectors") {
    assert(Uuid5("www.example.org") == "74738ff5-5367-5958-9aee-98fffdcd1876")
    // cross-checked with python: uuid.uuid5(uuid.NAMESPACE_DNS, 'python.org')
    assert(Uuid5("python.org") == "886313e1-3b8a-5372-9b90-0c9aee199e5d")
  }
  test("version and variant bits") {
    val u = Uuid5("1_2_0")
    assert(u.charAt(14) == '5')
    assert("89ab".contains(u.charAt(19)))
  }
}

class Bm25Spec extends AnyFunSuite {
  test("tokenize lowercases and splits on non-alnum") {
    assert(Bm25.tokenize("Hello, World! x2") == Seq("hello", "world", "x2"))
    assert(Bm25.tokenize(null).isEmpty)
  }
  test("idf monotone decreasing in df") {
    assert(Bm25.idf(1, 100) > Bm25.idf(50, 100))
    assert(Bm25.idf(100, 100) > 0) // +1 floor keeps it positive
  }
  test("term score increases with tf, saturates") {
    val i = Bm25.idf(5, 100)
    val s1 = Bm25.termScore(1, 100, 100.0, i)
    val s2 = Bm25.termScore(2, 100, 100.0, i)
    val s10 = Bm25.termScore(10, 100, 100.0, i)
    assert(s2 > s1 && s10 < 10 * s1)
  }
}
