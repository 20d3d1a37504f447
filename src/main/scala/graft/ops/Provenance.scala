package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-document provenance ledger — the chain-of-custody record
  * training-data governance needs (takedown audits, licence disputes,
  * "which pipeline produced this example?"): every pipeline stage
  * appends one entry whose hash commits to the ENTIRE history,
  *
  *   chain_i = md5(chain_{i−1} || '|' || stage_i || '|' || digest_i),
  *   chain_0 = md5('genesis|' || doc_id),
  *
  * where digest_i = md5 of the stage's output content for that doc. A
  * verifier — this module's [[verify]], an external auditor, or a
  * second engine (the q353 oracle) — re-derives every link from the
  * recorded (stage, digest) pairs alone, so a tampered intermediate
  * (content swapped after the fact, a stage quietly re-run) breaks
  * every later link. The same construction as a git history or a
  * Merkle chain, kept deliberately dependency-free: md5 is the house
  * content-digest primitive (engine-portable), and nothing here is a
  * cryptographic-security claim — it is TAMPER-EVIDENCE for honest
  * infrastructure, not defence against an adversary who can rewrite
  * the whole ledger.
  *
  * Scale shape: the ledger is (docs × stages)-sized and every operation
  * is keyed by doc_id — appending a stage reads the per-doc HEAD
  * through a doc-keyed window over stages-sized partitions, and
  * verification joins each entry to its predecessor on (doc_id, seq) —
  * no corpus-wide state, no driver round-trips.
  */
object Provenance {

  /** The genesis ledger: one seq-0 entry per doc, committing to the id
    * itself (digest = chain = md5('genesis|' || doc_id)). */
  def genesis(docs: DataFrame, idCol: String = "doc_id"): DataFrame = {
    val g = md5(concat(lit("genesis|"), col(idCol).cast("string")))
    docs.select(col(idCol).cast("long").as("doc_id")).distinct()
      .select(col("doc_id"), lit(0L).as("seq"),
        lit("genesis").as("stage"), g.as("digest"), g.as("chain"))
  }

  /** Append one stage: for every doc in `docs`, a new entry at
    * seq = head+1 with digest = md5(stage output content) and the
    * chained hash. Docs absent from `docs` keep their ledger
    * unchanged; docs absent from the ledger are refused implicitly
    * (inner join — a stage output with no provenance is the bug this
    * module exists to surface). */
  def appendStage(ledger: DataFrame, docs: DataFrame, stage: String,
      idCol: String = "doc_id", contentCol: String = "text"): DataFrame = {
    require(stage.nonEmpty && !stage.contains("|"),
      s"stage name must be nonempty and '|'-free, got '$stage'")
    val w = Window.partitionBy("doc_id").orderBy(desc("seq"))
    val head = ledger.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select(col("doc_id"), col("seq"), col("chain").as("__prev"))
    val fresh = docs.select(col(idCol).cast("long").as("doc_id"),
        md5(col(contentCol).cast("binary")).as("digest"))
      .join(head, Seq("doc_id"))
      .select(col("doc_id"), (col("seq") + 1).as("seq"),
        lit(stage).as("stage"), col("digest"),
        md5(concat(col("__prev"), lit("|"), lit(stage), lit("|"),
          col("digest"))).as("chain"))
    ledger.unionByName(fresh)
  }

  /** Re-derive every link: an entry is `ok` iff its chain equals the
    * hash of (predecessor chain, stage, digest) — genesis entries
    * verify against md5('genesis|' || doc_id). Returns the ledger plus
    * the ok bit; any 0 marks the first tampered/broken link. */
  def verify(ledger: DataFrame): DataFrame = {
    val prev = ledger.select(col("doc_id"), (col("seq") + 1).as("seq"),
      col("chain").as("__prev"))
    ledger.join(prev, Seq("doc_id", "seq"), "left")
      .select(col("doc_id"), col("seq"), col("stage"), col("digest"),
        col("chain"),
        when(col("seq") === 0,
          when(col("chain") ===
            md5(concat(lit("genesis|"), col("doc_id").cast("string"))),
            1L).otherwise(0L))
          .otherwise(when(col("chain") === md5(concat(col("__prev"),
            lit("|"), col("stage"), lit("|"), col("digest"))),
            1L).otherwise(0L)).as("ok"))
  }
}
