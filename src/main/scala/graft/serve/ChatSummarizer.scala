package graft.serve

import java.io.{BufferedReader, InputStream, InputStreamReader}
import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets.UTF_8
import java.time.Duration

import scala.util.control.NonFatal

import com.fasterxml.jackson.databind.ObjectMapper

/** L1/L2 — the LLM summarization client: a streaming chat-completions
  * call over `java.net.http`, speaking the OpenAI-compatible wire shape
  * the reference uses (`chatbot/app.py:656-700`: `stream=True`, delta
  * chunks drained into SSE frames; quick batch form at `app.py:231-280`).
  *
  * The socket sits behind an injectable `transport` so the protocol
  * layer — request JSON, auth header, SSE `data:` line parsing, `[DONE]`
  * termination, mid-stream error surfacing — is fully testable offline
  * (this sandbox has no egress). Live use is construction-time opt-in:
  * build one with an API key and plug it into
  * [[HttpApi.Engine.summarizer]]; without it the serving layer keeps the
  * reference's graceful 503 degradation (L3).
  */
final class ChatSummarizer(
    apiKey: String,
    endpoint: String = "https://api.openai.com/v1/chat/completions",
    model: String = "gpt-4o-mini",
    maxTokens: Int = 800,
    temperature: Double = 0.3,
    transport: ChatSummarizer.Transport = ChatSummarizer.defaultTransport)
    extends Serve.Summarizer {

  private val mapper = new ObjectMapper()

  /** Reference guidance re-expressed (`app.py:629-637`): a structured
    * legal case summary answering the user's question. */
  private val systemPrompt: String =
    "You are a legal research assistant. Summarize the supplied case so " +
      "it answers the user's question: name the case, court, date and " +
      "parties; state the key facts, the issues presented, the holding " +
      "and reasoning, and notable concurrences or dissents. Be " +
      "structured and professional."

  override def summarize(context: String, maxWords: Int): String =
    summarizeStream(context, maxWords).mkString

  /** Streaming form: one delta chunk per iterator element, exactly what
    * [[Serve.Sse.stream]] frames for the HTTP layer. */
  override def summarizeStream(context: String, maxWords: Int): Iterator[String] = {
    val body = requestJson(context, maxWords)
    val in = transport(endpoint, body,
      Map("Authorization" -> s"Bearer $apiKey", "Content-Type" -> "application/json"))
    val reader = new BufferedReader(new InputStreamReader(in, UTF_8))
    new Iterator[String] {
      private var nextChunk: Option[String] = advance()
      private def advance(): Option[String] = {
        var line = reader.readLine()
        while (line != null) {
          val l = line.trim
          if (l.startsWith("data:")) {
            val payload = l.drop("data:".length).trim
            if (payload == "[DONE]") { reader.close(); return None }
            try {
              val delta = mapper.readTree(payload)
                .path("choices").path(0).path("delta").path("content")
              if (!delta.isMissingNode && !delta.isNull && delta.asText().nonEmpty)
                return Some(delta.asText())
            } catch { case NonFatal(_) => () } // skip unparseable keep-alives
          }
          line = reader.readLine()
        }
        reader.close()
        None
      }
      def hasNext: Boolean = nextChunk.isDefined
      def next(): String = {
        val c = nextChunk.getOrElse(throw new NoSuchElementException)
        nextChunk = advance()
        c
      }
    }
  }

  /** The request body (visible for tests). */
  private[serve] def requestJson(context: String, maxWords: Int): String = {
    def s(v: String) = mapper.writeValueAsString(v)
    s"""{"model":${s(model)},"stream":true,"max_tokens":$maxTokens,""" +
      s""""temperature":$temperature,"messages":[""" +
      s"""{"role":"system","content":${s(systemPrompt + s" Aim for about $maxWords words.")}},""" +
      s"""{"role":"user","content":${s(context)}}]}"""
  }
}

object ChatSummarizer {
  /** (url, jsonBody, headers) → response byte stream (SSE lines). */
  type Transport = (String, String, Map[String, String]) => InputStream

  /** Real POST; the response streams as it arrives (chunked SSE). */
  def defaultTransport: Transport = { (url, body, headers) =>
    val client = HttpClient.newBuilder()
      .connectTimeout(Duration.ofSeconds(30)).build()
    val b = HttpRequest.newBuilder(URI.create(url))
      .timeout(Duration.ofSeconds(120))
      .POST(HttpRequest.BodyPublishers.ofString(body))
    headers.foreach { case (k, v) => b.header(k, v) }
    val resp = client.send(b.build(), HttpResponse.BodyHandlers.ofInputStream())
    if (resp.statusCode() / 100 != 2)
      throw new RuntimeException(s"HTTP ${resp.statusCode()} from $url")
    resp.body()
  }
}
