package graft.model

/** §1 data model as case classes — the typed `Dataset[T]` surface.
  *
  * Mirrors the reference's four-level hierarchy flattened to chunk
  * points (`/root/reference/data-ingestion/opinion.py:1-67`,
  * `chunk.py:4-23`; schema per FIXTURES.md §B). `DataFrame` remains the
  * workhorse for dynamic-schema operators; these encoders give
  * compile-time field checks where the shape is fixed.
  */
final case class LegalEntities(
    judges: Seq[String], parties: Seq[String],
    courts: Seq[String], statutes: Seq[String])

final case class TextStatsRec(length: Long, word_count: Long, citation_count: Long)

final case class OpinionRecord(
    docket_id: Long, cluster_id: Long, opinion_id: Long,
    court: String, date_filed: String, judges: String,
    precedential_status: String, author: String, opinion_type: String,
    sha1: String, download_url: String,
    date_created: String, date_modified: String,
    opinion_text: String, citations: Seq[String],
    legal_entities: LegalEntities, text_stats: TextStatsRec,
    source_field: String)

final case class ChunkRecord(
    id: String, chunk_id: String, chunk_index: Int, text: String,
    docket_id: Long, opinion_id: Long)

/** One index point: chunk + vectors (dense unit-norm; sparse as tokens —
  * BM25 weights derive from corpus stats at query time, SURVEY A7). */
final case class ChunkPoint(
    id: String, chunk_id: String, chunk_index: Int, chunk_text: String,
    doc_id: Long, dense_vec: Seq[Float], tokens: Seq[String])
