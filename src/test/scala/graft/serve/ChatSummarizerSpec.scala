package graft.serve

import java.io.ByteArrayInputStream
import java.nio.charset.StandardCharsets.UTF_8

import org.scalatest.funsuite.AnyFunSuite

/** Protocol layer of the LLM client, no network: request shape, auth
  * header, SSE delta parsing, [DONE] termination, SSE-envelope compose. */
class ChatSummarizerSpec extends AnyFunSuite {

  private def sse(lines: String*): ChatSummarizer.Transport =
    (_, _, _) => new ByteArrayInputStream(lines.mkString("\n").getBytes(UTF_8))

  private val providerStream = sse(
    """data: {"choices":[{"delta":{"role":"assistant"}}]}""", // no content → skipped
    "",
    """data: {"choices":[{"delta":{"content":"The court "}}]}""",
    """data: {"choices":[{"delta":{"content":"held that..."}}]}""",
    ": keep-alive comment",
    "data: [DONE]",
    """data: {"choices":[{"delta":{"content":"NEVER emitted"}}]}""")

  test("streams provider deltas in order and stops at [DONE]") {
    val s = new ChatSummarizer("k", transport = providerStream)
    assert(s.summarizeStream("ctx", 300).toSeq == Seq("The court ", "held that..."))
    assert(s.summarize("ctx", 300) == "The court held that...")
  }

  test("request carries auth header, model, stream flag and the context") {
    var seen: (String, String, Map[String, String]) = null
    val t: ChatSummarizer.Transport = (u, b, h) => {
      seen = (u, b, h)
      new ByteArrayInputStream("data: [DONE]".getBytes(UTF_8))
    }
    val s = new ChatSummarizer("sk-test", model = "test-model", transport = t)
    s.summarizeStream("Case Name: Doe v. Roe", 250).toSeq
    assert(seen._1.endsWith("/chat/completions"))
    assert(seen._3("Authorization") == "Bearer sk-test")
    val body = seen._2
    assert(body.contains("\"model\":\"test-model\""))
    assert(body.contains("\"stream\":true"))
    assert(body.contains("Doe v. Roe"))
    assert(body.contains("about 250 words"))
  }

  test("composes with the SSE envelope: frames then [DONE]") {
    val s = new ChatSummarizer("k", transport = providerStream)
    val frames = Serve.Sse.stream(s.summarizeStream("ctx", 100)).toSeq
    assert(frames == Seq("data: The court \n\n", "data: held that...\n\n",
      "data: [DONE]\n\n"))
  }

  test("transport failure mid-setup surfaces as [ERROR] through the envelope") {
    val s = new ChatSummarizer("k",
      transport = (_, _, _) => throw new RuntimeException("provider down"))
    val frames = Serve.Sse.stream(
      // lazy wrapper: the transport fires on first hasNext, inside the
      // envelope's error boundary (HttpApi drains exactly this way)
      Iterator.empty[String] ++ s.summarizeStream("ctx", 100)).toSeq
    assert(frames.last.startsWith("data: [ERROR] provider down"))
  }
}
