package graft.ingest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.embed.{Embedder, HashingEmbedder}
import graft.functions.GraftFunctions._

/** §3.1 ingestion pipeline, Spark-shaped (SURVEY.md §3.1 "Spark shape"):
  *
  * `documents → clean (F1) → extract+stats (F9) → chunk (C1-C6, posexplode)
  *  → min-size filter (P5) → embed (V1, mapPartitions-style batched UDF)
  *  → uuid5 id (F10) → index records (P7)`
  *
  * Every step is a narrow transformation — no shuffle anywhere in the
  * pipeline; at 100 TB this runs embarrassingly parallel over input
  * splits, and the only wide op is the *sink's* dedup/MERGE (see
  * [[graft.index.IndexWriter]]).
  */
object ChunkPipeline {

  /** Clean + extract + stats on a raw text column (F1/F9). */
  def processed(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs.withColumn("processed", enhancedTextProcessing(col(textCol)))
      .withColumn("opinion_text", col("processed.cleaned_text"))
      .withColumn("citations", col("processed.citations"))
      .withColumn("legal_entities", col("processed.legal_entities"))
      .withColumn("text_stats", col("processed.text_stats"))
      .drop("processed")

  /** Chunk + embed + key: the full document→index-record pipeline.
    *
    * @param docs       input with at least (`idCol`, `textCol`)
    * @param minRawLen  P4 — drop docs whose cleaned text is shorter (ref: 100)
    * @param chunkUdf   chunker column fn (defaults to reference geometry)
    */
  def chunkPoints(
      spark: SparkSession,
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      minRawLen: Int = 100,
      chunkUdf: org.apache.spark.sql.Column => org.apache.spark.sql.Column = chunkText,
      embedder: Embedder = HashingEmbedder.default): DataFrame = {
    // Spread the CPU-heavy UDF chain across cores BEFORE any of it runs:
    // a small parquet input arrives as ONE split (and at any scale the
    // input split count, not the cluster, would bound parallelism here) —
    // without this, clean→extract→chunk→embed serializes on one task.
    val spread = docs.repartition(spark.sparkContext.defaultParallelism, col(idCol))
    val cleaned = processed(spread, textCol)
      .filter(length(trim(col("opinion_text"))) >= minRawLen) // P4
    val chunked = cleaned
      .select(
        col(idCol).as("doc_id"),
        col("citations"), col("legal_entities"), col("text_stats"),
        posexplode(chunkUdf(col("opinion_text"))).as(Seq("chunk_index", "chunk_text")))
      .withColumn("chunk_id", concat_ws("_", col("doc_id"), col("chunk_index")))
      .withColumn("id", uuid5(col("chunk_id")))
      .withColumn("tokens", bm25Tokenize(col("chunk_text")))
      .withColumn("time_ingested", current_timestamp())
    embedBatched(chunked, "chunk_text", "dense_vec", embedder)
  }

  /** V1 — batched embedding: `mapPartitions` with one embedder instance
    * per task, texts fed to [[Embedder.embedBatch]] in batches of
    * `batchSize` (the reference encodes in batches of ≤16,
    * `data-ingestion/data_extraction.py:269-274`). A real ONNX embedder
    * amortizes model dispatch over the batch; the deterministic
    * [[HashingEmbedder]] maps over it, so output vectors are identical to
    * the per-row UDF path. */
  def embedBatched(df: DataFrame, textCol: String, outCol: String,
      embedder: Embedder = HashingEmbedder.default, batchSize: Int = 16): DataFrame = {
    import org.apache.spark.sql.{Encoders, Row}
    import org.apache.spark.sql.types.{ArrayType, FloatType}
    val schema = df.schema.add(outCol, ArrayType(FloatType, containsNull = false))
    val idx = df.schema.fieldIndex(textCol)
    df.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        val vecs = embedder.embedBatch(batch.map(r => r.getString(idx)))
        batch.iterator.zip(vecs.iterator).map { case (r, v) =>
          Row.fromSeq(r.toSeq :+ v)
        }
      }
    }(Encoders.row(schema))
  }

  /** Typed view of the pipeline output (`Dataset[ChunkPoint]`) — the
    * case-class encoder gives compile-time field checks downstream. */
  def typedChunkPoints(spark: SparkSession, docs: DataFrame,
      idCol: String = "doc_id", textCol: String = "text")
      : org.apache.spark.sql.Dataset[graft.model.ChunkPoint] = {
    import spark.implicits._
    chunkPoints(spark, docs, idCol, textCol)
      .select(col("id"), col("chunk_id"), col("chunk_index"),
        col("chunk_text"), col("doc_id"), col("dense_vec"), col("tokens"))
      .as[graft.model.ChunkPoint]
  }
}
