package graft.text

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

class RecursiveSplitterSpec extends AnyFunSuite {
  val sentences: String =
    (1 to 120).map(i => s"This is sentence number $i of the opinion text.").mkString(" ")

  test("short text is a single chunk") {
    val s = new RecursiveSplitter(100, 20)
    assert(s.split("hello world") == Seq("hello world"))
  }
  test("empty and null") {
    assert(RecursiveSplitter.default.split("") == Nil)
    assert(RecursiveSplitter.default.split(null) == Nil)
  }
  test("chunks respect the size bound when separators exist") {
    val chunks = RecursiveSplitter.default.split(sentences)
    assert(chunks.nonEmpty)
    assert(chunks.forall(_.length <= 1536))
  }
  test("consecutive chunks overlap (content carried over)") {
    val chunks = RecursiveSplitter.default.split(sentences)
    assert(chunks.size >= 2)
    // every chunk after the first starts with text present in its predecessor
    chunks.sliding(2).foreach { case Seq(a, b) =>
      val head = b.take(40).trim
      assert(a.contains(head.take(20)), s"no overlap between [$a] and [$b]")
    case _ => ()
    }
  }
  test("coverage: all input content appears in order") {
    val chunks = RecursiveSplitter.default.split(sentences)
    // stripped of whitespace, concatenation must contain every sentence
    (1 to 120).foreach { i =>
      assert(chunks.exists(_.contains(s"sentence number $i")), s"sentence $i lost")
    }
  }
  test("paragraph separator preferred over space") {
    val para = ("A" * 90) + "\n\n" + ("B" * 90)
    val s = new RecursiveSplitter(100, 10)
    val chunks = s.split(para)
    assert(chunks.size == 2)
    assert(chunks(0).forall(_ == 'A'))
    assert(chunks(1).forall(_ == 'B'))
  }
  test("character fallback when no separator fits") {
    val s = new RecursiveSplitter(10, 2, Seq(" ", ""))
    val chunks = s.split("x" * 25)
    assert(chunks.forall(_.length <= 10))
    assert(chunks.mkString("").length >= 25) // overlap means >= input
  }
}

class ChunkRepairSpec extends AnyFunSuite {
  test("startsAtSentenceBoundary cases") {
    import ChunkRepair.startsAtSentenceBoundary
    assert(startsAtSentenceBoundary("The court held"))
    assert(startsAtSentenceBoundary("(emphasis added)"))
    assert(startsAtSentenceBoundary("a contract was"))
    assert(!startsAtSentenceBoundary(", and therefore"))
    assert(!startsAtSentenceBoundary(". Next"))
    assert(!startsAtSentenceBoundary("moreover, it was"))
    assert(!startsAtSentenceBoundary("went to the store")) // lowercase non-article
    assert(!startsAtSentenceBoundary(""))
  }
  test("fixChunkStart advances to capital after sentence end") {
    val c = "ing was denied. The appeal followed promptly."
    assert(ChunkRepair.fixChunkStart(c) == "The appeal followed promptly.")
  }
  test("fixChunkStart keeps good starts") {
    val c = "The appeal followed."
    assert(ChunkRepair.fixChunkStart(c) == c)
  }
  test("fixChunkEnd cuts to last sentence end") {
    val c = "First sentence. Second sentence! Trailing frag"
    assert(ChunkRepair.fixChunkEnd(c) == "First sentence. Second sentence!")
  }
  test("fixChunkEnd keeps terminal punctuation") {
    assert(ChunkRepair.fixChunkEnd("Done here.") == "Done here.")
  }
  test("fixChunkEnd falls back to ; near the end") {
    val c = ("x" * 90) + "; tail"  // ';' at 90 of 96 > 80%
    assert(ChunkRepair.fixChunkEnd(c) == ("x" * 90) + ";")
  }
  test("fixChunkOverlaps drops tiny and below-min chunks") {
    val chunks = Seq("tiny", "x" * 60, ("Word. " * 100).trim)
    val out = ChunkRepair.fixChunkOverlaps(chunks, 400)
    assert(out.size == 1)
    assert(out.head.length >= 400)
  }
  test("chunkDocument: every emitted chunk >= min size and sentence-terminated or repaired") {
    val doc = (1 to 200).map(i => s"Sentence $i ends here.").mkString(" ")
    val out = ChunkRepair.chunkDocument(doc)
    assert(out.nonEmpty)
    assert(out.forall(_.length >= 400))
    assert(out.forall(c => c.endsWith(".") || c.endsWith("!") || c.endsWith("?")))
  }
  test("chunkDocument: short input yields nothing") {
    assert(ChunkRepair.chunkDocument("too short").isEmpty)
    assert(ChunkRepair.chunkDocument(null).isEmpty)
  }
  test("property: idempotence of repair on repaired chunks") {
    val doc = (1 to 300).map(i => s"Sentence number $i of this long document ends right here.").mkString(" ")
    val once = ChunkRepair.chunkDocument(doc)
    once.foreach { c =>
      val again = ChunkRepair.fixChunkEnd(ChunkRepair.fixChunkStart(c))
      assert(again == c, "repair must be idempotent")
    }
  }
  test("property: random whitespace text never crashes, output bounded") {
    val gen = Gen.listOfN(600, Gen.oneOf(Gen.alphaNumChar, Gen.const(' '), Gen.const('.'), Gen.const('\n')))
      .map(_.mkString)
    (0 until 50).foreach { i =>
      val txt = gen.pureApply(Gen.Parameters.default, Seed(42L + i))
      val out = ChunkRepair.chunkDocument(txt)
      assert(out.forall(_.length >= 400))
    }
  }
}
