package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** JSONL (newline-delimited JSON) source with dead-letter handling —
  * the wire format crawl dumps and API exports actually arrive in.
  * Reference context: the reference ingests CourtListener REST JSON
  * page-by-page (`/root/reference/data_extraction.py:320-444`); at
  * pipeline scale the same payloads land as JSONL files, where a
  * malformed line must quarantine, never kill the job or silently
  * vanish.
  *
  * Reading is PERMISSIVE with an explicit schema + corrupt-record
  * column: well-formed lines parse to typed columns, malformed lines
  * surface whole in `_corrupt` with the typed columns null. The split
  * into admitted/quarantined is then two narrow filters over ONE scan
  * — no shuffle, and the schema is never inferred (inference reads the
  * whole input twice and locks bad lines in as nulls silently).
  */
object JsonlSource {

  val CorruptCol = "_corrupt"

  /** One scan, typed columns + `_corrupt`. The explicit `schema` is
    * required: schema-on-read inference at 100 TB is a second full
    * pass, and it cannot distinguish "field absent everywhere" from
    * "line broken".
    *
    * Implementation detail with a reason: this is a TEXT scan +
    * `from_json` projection, not `spark.read.json`. The JSON reader's
    * internal corrupt-record column may not be filtered/selected on its
    * own (Spark's QUERY_ONLY_CORRUPT_RECORD_COLUMN guard — the
    * documented workaround is caching the whole input, which is exactly
    * what a 100 TB read must not do). Parsing in the projection makes
    * the corrupt field an ordinary column with no such restriction,
    * still one pass, still codegen-friendly. */
  def read(spark: SparkSession, path: String, schema: StructType): DataFrame = {
    val withCorrupt = schema.add(CorruptCol, "string")
    spark.read.text(path)
      .select(from_json(col("value"), withCorrupt,
        Map("mode" -> "PERMISSIVE",
          "columnNameOfCorruptRecord" -> CorruptCol)).as("__r"))
      .select(col("__r.*"))
  }

  /** Well-formed rows, typed, `_corrupt` dropped. */
  def admitted(df: DataFrame): DataFrame =
    df.filter(col(CorruptCol).isNull).drop(CorruptCol)

  /** Malformed rows: the raw line, for the dead-letter queue. */
  def quarantined(df: DataFrame): DataFrame =
    df.filter(col(CorruptCol).isNotNull).select(col(CorruptCol).as("raw_line"))

  /** Sharded JSONL export — the training-data delivery format: one JSON
    * object per line, files capped at `maxRecordsPerFile` rows so a
    * downstream loader (or a human) never faces a single multi-TB file.
    * The cap is enforced per task by Spark's writer (a task that fills
    * a shard rolls to the next file), so shard count scales with data,
    * not with a repartition — no extra shuffle to "make files". */
  def writeSharded(df: DataFrame, path: String,
      maxRecordsPerFile: Int): Unit = {
    require(maxRecordsPerFile >= 1, "maxRecordsPerFile must be positive")
    df.write.mode("overwrite")
      .option("maxRecordsPerFile", maxRecordsPerFile.toLong)
      .json(path)
  }
}

/** CSV flavor of [[JsonlSource]]: same text-scan + parse-in-projection
  * construction (`from_csv`), same dead-letter contract. A row whose
  * field count or types don't fit the schema quarantines whole;
  * admitted rows come out typed. `options` passes through to the CSV
  * parser (sep, quote, …). Header lines are data to a distributed
  * text scan — filter them with a leading predicate if present. */
object CsvSource {

  val CorruptCol: String = JsonlSource.CorruptCol

  def read(spark: SparkSession, path: String, schema: StructType,
      options: Map[String, String] = Map.empty): DataFrame = {
    val withCorrupt = schema.add(CorruptCol, "string")
    val opts = options ++ Map(
      "mode" -> "PERMISSIVE", "columnNameOfCorruptRecord" -> CorruptCol)
    spark.read.text(path)
      .select(from_csv(col("value"), withCorrupt, opts).as("__r"))
      .select(col("__r.*"))
  }

  def admitted(df: DataFrame): DataFrame = JsonlSource.admitted(df)

  def quarantined(df: DataFrame): DataFrame = JsonlSource.quarantined(df)
}
