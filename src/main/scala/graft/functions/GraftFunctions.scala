package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

import graft.embed.{Embedder, HashingEmbedder}
import graft.text._

/** Spark bindings for the pure-Scala text core (SURVEY.md §2.12).
  *
  * Everything regex-shaped stays on `org.apache.spark.sql.functions`
  * built-ins (codegen'd, prunable); only the genuinely imperative pieces
  * (HTML clean, chunker, uuid5, embedder) are UDFs, and the vector math
  * is a native Catalyst expression ([[CosineSimilarity]]).
  *
  * Call [[GraftFunctions.register]] once per session, then use the
  * `Column` helpers.
  */
object GraftFunctions {

  /** Idempotent per-session registration of UDFs + native expressions. */
  def register(spark: SparkSession, embedder: Embedder = HashingEmbedder.default): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction(
      "vec_cosine", exprs => CosineSimilarity(exprs(0), exprs(1)), "scala_udf")
    reg.createOrReplaceTempFunction(
      "vec_dot", exprs => DotProduct(exprs(0), exprs(1)), "scala_udf")
    reg.createOrReplaceTempFunction(
      "hamming64", exprs => Hamming64(exprs(0), exprs(1)), "scala_udf")

    spark.udf.register("clean_text", (s: String) => CleanText(s))
    spark.udf.register("uuid5", (s: String) => Uuid5(s))
    spark.udf.register("chunk_text",
      (s: String) => ChunkRepair.chunkDocument(s))
    spark.udf.register("chunk_text_with",
      (s: String, chunkSize: Int, overlap: Int, minSize: Int) =>
        ChunkRepair.chunkDocument(s, new RecursiveSplitter(chunkSize, overlap), minSize))
    spark.udf.register("bm25_tokenize", (s: String) => Bm25.tokenize(s))
    spark.udf.register("embed_text", (s: String) => embedder.embed(s))
    spark.udf.register("extract_citations", (s: String) => LegalExtract.citations(s))
    spark.udf.register("extract_judges", (s: String) => LegalExtract.judges(s))
    spark.udf.register("extract_parties", (s: String) => LegalExtract.parties(s))
    spark.udf.register("extract_courts", (s: String) => LegalExtract.courts(s))
    spark.udf.register("extract_statutes", (s: String) => LegalExtract.statutes(s))
  }

  // ---- Column helpers (usable after register()) --------------------------

  private def asFloatArray(c: Column): Column = c.cast("array<float>")

  /** V4 cosine similarity over two `array<float>` columns (codegen'd). */
  def vecCosine(a: Column, b: Column): Column =
    call_function("vec_cosine", asFloatArray(a), asFloatArray(b))

  /** Dot product over two `array<float>` columns (codegen'd). */
  def vecDot(a: Column, b: Column): Column =
    call_function("vec_dot", asFloatArray(a), asFloatArray(b))

  /** Hamming distance between two long-encoded bit signatures (codegen'd). */
  def hamming64(a: Column, b: Column): Column =
    call_function("hamming64", a.cast("long"), b.cast("long"))

  def cleanText(c: Column): Column = call_function("clean_text", c)
  def uuid5(c: Column): Column = call_function("uuid5", c)
  def chunkText(c: Column): Column = call_function("chunk_text", c)
  def bm25Tokenize(c: Column): Column = call_function("bm25_tokenize", c)
  def embedText(c: Column): Column = call_function("embed_text", c)

  /** F8 `text_stats` struct from a cleaned-text column + citations column.
    * Built-ins only, so Catalyst can still prune/push. */
  def textStats(cleaned: Column, citations: Column): Column =
    struct(
      length(cleaned).cast("long").as("length"),
      when(length(trim(cleaned)) === 0, lit(0L))
        .otherwise(size(split(trim(cleaned), "\\s+")).cast("long")).as("word_count"),
      size(citations).cast("long").as("citation_count"))

  /** F9 `enhanced_text_processing` — one `select`-able struct column:
    * cleaned text, citations, entity struct, stats. */
  def enhancedTextProcessing(raw: Column): Column = {
    val cleaned = cleanText(raw)
    val cits = call_function("extract_citations", cleaned)
    struct(
      cleaned.as("cleaned_text"),
      cits.as("citations"),
      struct(
        call_function("extract_judges", cleaned).as("judges"),
        call_function("extract_parties", cleaned).as("parties"),
        call_function("extract_courts", cleaned).as("courts"),
        call_function("extract_statutes", cleaned).as("statutes")).as("legal_entities"),
      textStats(cleaned, cits).as("text_stats"))
  }

  /** P3 text-field coalesce: first non-empty of `fields` in priority
    * order, plus which field won (`source_field`). */
  def coalesceTextFields(fields: Seq[(String, Column)]): (Column, Column) = {
    val nonEmpty = fields.map { case (n, c) => (n, when(length(trim(c)) > 0, c)) }
    val value = coalesce(nonEmpty.map(_._2): _*)
    val source = nonEmpty.foldRight(lit(null).cast("string")) {
      case ((n, c), acc) => when(c.isNotNull, lit(n)).otherwise(acc)
    }
    (value, source)
  }
}
