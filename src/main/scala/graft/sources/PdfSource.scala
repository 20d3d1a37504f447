package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** S8 — PDF full-text source.
  *
  * The reference fetches a PDF by URL and concatenates per-page text with
  * `"\n"` (`/root/reference/chatbot/app.py:546-613`). Spark-side: read
  * bytes with the `binaryFile` source, extract per-page text behind
  * [[PdfTextExtractor]], join pages with `\n`.
  *
  * The default extractor is [[SimpleExtractor]], a real pure-JVM parser
  * ([[PdfText]]: object scan, FlateDecode, page-tree walk, Tj/TJ/'/"
  * text operators). Its documented boundary: no CID-font `/ToUnicode`
  * CMap decoding — a pdfbox-backed implementation drops in behind the
  * same trait without touching the plan.
  */
object PdfSource {

  trait PdfTextExtractor extends Serializable {
    /** Per-page text of one PDF, in page order. */
    def pages(bytes: Array[Byte]): Seq[String]
  }

  /** Real extractor backed by [[PdfText]] (Flate + text operators). */
  final class SimpleExtractor extends PdfTextExtractor {
    def pages(bytes: Array[Byte]): Seq[String] = PdfText.pages(bytes)
  }

  /** STUB extractor kept for plumbing tests: recognizes the %PDF magic
    * and returns a deterministic placeholder per "page" (counted via
    * /Type /Page occurrences). */
  final class StubExtractor extends PdfTextExtractor {
    def pages(bytes: Array[Byte]): Seq[String] = {
      if (bytes == null || bytes.length < 5 ||
          new String(bytes.take(5), "ISO-8859-1") != "%PDF-") return Seq.empty
      val body = new String(bytes, "ISO-8859-1")
      val nPages = math.max(1, "/Type\\s*/Page[^s]".r.findAllIn(body).size)
      (1 to nPages).map(i => s"[stub page $i text]")
    }
  }

  /** Read a directory of PDFs → (path, text) with pages joined by \n. */
  def read(spark: SparkSession, dir: String,
      extractor: PdfTextExtractor = new SimpleExtractor): DataFrame = {
    val ex = extractor
    val pdfToText = udf((bytes: Array[Byte]) => ex.pages(bytes).mkString("\n"))
    spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.pdf")
      .load(dir)
      .select(col("path"), pdfToText(col("content")).as("text"),
        col("length").as("byte_len"))
  }
}
