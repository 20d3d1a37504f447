package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Type-2 slowly-changing-dimension (SCD2) construction — the classic
  * warehouse pattern the reference's flat "latest row wins" upsert
  * (`/root/reference/data-ingestion/vector_db_loader.py` overwrite
  * semantics) cannot express: instead of keeping only the current
  * attribute value per entity, keep EVERY value the entity ever held,
  * as half-open effective intervals `[effective_from, effective_to)`,
  * so any fact can be joined against the attribute value that was
  * current when the fact happened (point-in-time correctness — the
  * thing that prevents feature leakage in training-data builds).
  *
  * Scale shape: everything here is one window pass partitioned by the
  * entity key — state per task is a single previous row, no interval
  * ever crosses an exchange, and the dimension key is the natural
  * partitioner. The incremental [[scd2Apply]] touches only entities
  * present in the new batch (the others stream through untouched via
  * an anti-join split), so a daily delta against a 10^10-row dimension
  * shuffles only the delta's key set.
  */
object Scd {

  /** Build an SCD2 dimension from a full change log.
    *
    * `log` rows are observations `(key, ts, seq, attrs…)`; `seq` breaks
    * ts ties deterministically (e.g. the source's primary key). A run of
    * consecutive observations with identical `attrCols` collapses into
    * one interval; `effective_to` is null on each key's current row.
    *
    * Output: key, attrCols…, `effective_from`, `effective_to` (same type
    * as `tsCol`, null = current), `version` (1-based per key),
    * `is_current`.
    */
  def scd2Build(log: DataFrame, keyCol: String, tsCol: String,
      seqCol: String, attrCols: Seq[String]): DataFrame = {
    require(attrCols.nonEmpty, "scd2Build needs at least one attribute")
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(seqCol))
    val attrs = struct(attrCols.map(col): _*)
    val changed = log
      .withColumn("__prev", lag(attrs, 1).over(w))
      // null-safe: first row per key has __prev null → kept
      .filter(!(attrs <=> col("__prev"))).drop("__prev")
    changed
      .withColumn("effective_from", col(tsCol))
      .withColumn("effective_to", lead(col(tsCol), 1).over(w))
      .withColumn("version", row_number().over(w).cast("long"))
      .withColumn("is_current", col("effective_to").isNull)
      .select(
        (col(keyCol) +: attrCols.map(col)) ++ Seq(col("effective_from"),
          col("effective_to"), col("version"), col("is_current")): _*)
  }

  /** Apply a NEW batch of change observations to an existing SCD2
    * dimension incrementally. Precondition (caller-enforced; the spec
    * verifies the demo corpus satisfies it): every batch
    * observation is strictly later than the touched key's open row's
    * `effective_from` — out-of-order history belongs in a rebuild, not
    * a delta apply.
    *
    * Equivalence contract (spec-enforced):
    * `scd2Apply(scd2Build(old), batch) == scd2Build(old ∪ batch)`.
    *
    * Only the touched keys are rebuilt: their existing intervals are
    * re-expanded to change observations and re-run through the same
    * window pass as the batch rows; untouched keys pass through via a
    * broadcast-able anti-join on the batch's (small) key set. */
  def scd2Apply(dim: DataFrame, batch: DataFrame, keyCol: String,
      tsCol: String, seqCol: String, attrCols: Seq[String]): DataFrame = {
    val touchedKeys = batch.select(col(keyCol)).distinct()
    val untouched = dim.join(touchedKeys, Seq(keyCol), "left_anti")
    // Existing intervals of touched keys, as change observations again.
    // effective_from is the observation ts; the original seq is gone
    // after collapse, so reuse a constant that sorts before any real
    // seq — safe because rebuilt intervals are strictly older than the
    // batch (precondition) and distinct per (key, from).
    val reopened = dim.join(touchedKeys, Seq(keyCol), "left_semi")
      .select((Seq(col(keyCol), col("effective_from").as(tsCol),
        lit(Long.MinValue).as(seqCol)) ++ attrCols.map(col)): _*)
    val rebuilt = scd2Build(
      reopened.unionByName(
        batch.select((Seq(col(keyCol), col(tsCol),
          col(seqCol).cast("long")) ++ attrCols.map(col)): _*)),
      keyCol, tsCol, seqCol, attrCols)
    untouched.unionByName(rebuilt)
  }

  /** Point-in-time (PIT) join: each fact row picks the dimension row
    * whose interval contains `fact.asOfCol` (`from <= ts < to`, open
    * rows unbounded). Inner on the entity key, left on the interval —
    * facts before the key's first interval keep null attributes.
    *
    * Plan shape: equi-join on the key (sort-merge / AQE-broadcast if
    * the dim is small) with the interval predicate as a join-condition
    * residual; a key's intervals are disjoint by construction, so the
    * join is at-most-1:1 and needs no post-dedup. */
  def pitJoin(fact: DataFrame, dim: DataFrame, keyCol: String,
      asOfCol: String, attrCols: Seq[String]): DataFrame = {
    val d = dim.select((Seq(col(keyCol), col("effective_from"),
      col("effective_to")) ++ attrCols.map(col)): _*)
    fact.join(d,
        fact(asOfCol) >= d("effective_from") &&
          (d("effective_to").isNull || fact(asOfCol) < d("effective_to")) &&
          fact(keyCol) === d(keyCol),
        "left")
      .drop(d(keyCol)).drop("effective_from", "effective_to")
  }

  /** Incremental view maintenance for a COUNT/SUM aggregate view — the
    * delta-propagation rule (Griffin & Libkin SIGMOD'95 / the
    * Materialize-style IVM core) that lets a 10¹⁰-row base table's
    * rollup absorb a CDC batch WITHOUT recompute: counts and sums are
    * self-maintainable, so the new view is
    *
    *   cnt' = cnt + Σ(±1),  sum' = sum + Σ(±v)
    *
    * per group over the delta alone (op 'I' adds, 'D' subtracts; an
    * update is D-old + I-new, the [[scd2Apply]] batch convention), with
    * groups reaching cnt' = 0 dropped — by construction identical to
    * recomputing over (base − deletes + inserts), which is exactly what
    * the oracle does. Loud failures: ops outside {I, D} and deletes
    * that drive any group's count negative (a delta the base never
    * contained) refuse rather than silently corrupt the view.
    *
    * Scale shape: the delta aggregates to its own group set (delta-
    * sized, with map-side partials), then one group-keyed full-outer
    * join against the view — the base table is never touched. MIN/MAX
    * are deliberately absent: they are NOT self-maintainable under
    * deletes (a deleted max needs the base to find the runner-up). */
  def ivmAggDelta(view: DataFrame, delta: DataFrame, keyCols: Seq[String],
      opCol: String = "op", valCol: String = "v",
      cntCol: String = "cnt", sumCol: String = "sum_v"): DataFrame = {
    require(keyCols.nonEmpty, "keyCols must be non-empty")
    require(delta.filter(!col(opCol).isin("I", "D")).isEmpty,
      s"delta has $opCol values outside {I, D}")
    val sgn = when(col(opCol) === "I", 1L).otherwise(-1L)
    val dAgg = delta.groupBy(keyCols.map(col): _*)
      .agg(sum(sgn).as("__dc"), sum(sgn * col(valCol)).as("__dv"))
    val merged = view.join(dAgg, keyCols, "full")
      .select(keyCols.map(col) ++ Seq(
        (coalesce(col(cntCol), lit(0L)) + coalesce(col("__dc"), lit(0L)))
          .as(cntCol),
        (coalesce(col(sumCol), lit(0L)) + coalesce(col("__dv"), lit(0L)))
          .as(sumCol)): _*)
      .localCheckpoint()
    require(merged.filter(col(cntCol) < 0).isEmpty,
      "delta deletes rows the view never aggregated (count went negative)")
    merged.filter(col(cntCol) =!= 0)
  }
}
