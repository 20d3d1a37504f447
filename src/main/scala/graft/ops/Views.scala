package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Aggregate-query ROUTING over a materialized grouping lattice — the
  * read-side complement of HRU view selection (q324 picks which views
  * to materialize; this picks which materialized view ANSWERS a
  * query): a groupBy(q) aggregate whose measures are additive
  * (COUNT/SUM — AVG derives from them) can be answered from any view
  * whose grouping columns SUBSUME q by re-aggregating |view| rows
  * instead of scanning the base table, the classic summary-management
  * rewrite (Gupta/Mumick's lattice framing).
  *
  * Routing rule (deterministic, oracle-replayable): among subsuming
  * views, take the one with the FEWEST rows — the actual
  * re-aggregation cost — breaking ties to the lexicographically
  * smallest view name; refuse loudly when nothing subsumes (silently
  * falling back to the base table would hide a 100 TB scan behind an
  * API that promises view-sized work).
  *
  * Scale shape: views are grouping-dimension-sized by construction;
  * the routing decision reads one bounded count per candidate (the IVF
  * probe-ranking cost class) and the answer re-aggregates the chosen
  * view only — the base table is never touched.
  */
object Views {

  /** Route `groupCols` + additive `measures` to the cheapest subsuming
    * view and answer from it. `views` maps name → (grouping columns,
    * materialized frame); each frame must carry `measures` as
    * already-aggregated additive columns. Returns the re-aggregated
    * answer with a `served_from` column naming the chosen view. */
  def routeAndAnswer(views: Map[String, (Seq[String], DataFrame)],
      groupCols: Seq[String], measures: Seq[String]): DataFrame = {
    require(groupCols.nonEmpty && measures.nonEmpty,
      "need at least one grouping column and one measure")
    val q = groupCols.toSet
    val candidates = views.filter { case (_, (cols, _)) =>
      q.subsetOf(cols.toSet)
    }
    require(candidates.nonEmpty,
      s"no materialized view subsumes groupBy(${groupCols.mkString(", ")})" +
        s" — candidates were ${views.keys.toSeq.sorted.mkString(", ")}")
    val sized = candidates.toSeq.map { case (name, (_, df)) =>
      (name, df, df.count())
    }
    val (name, chosen, _) = sized.minBy { case (n, _, rows) => (rows, n) }
    chosen.groupBy(groupCols.map(col): _*)
      .agg(sum(col(measures.head)).as(measures.head),
        measures.tail.map(m => sum(col(m)).as(m)): _*)
      .withColumn("served_from", lit(name))
  }

  /** Incremental maintenance for the whole lattice — the q325 IVM move
    * applied to every materialized view at once: an insert batch
    * pre-aggregates ONCE PER VIEW to its grouping (each delta is
    * grouping-dimension-sized, with map-side combine) and merges into
    * the stored view by re-summing the additive measures — the base
    * table is never rescanned, which is the entire point of keeping
    * views at 100 TB. Under additivity refresh-then-route equals
    * recompute-then-route bit-for-bit (q354 proves it against a
    * full recompute). `aggs` are the views' defining aggregate
    * expressions (e.g. count(*) as cnt, sum(cents) as sum_cents) —
    * applied to the raw batch; the merge re-sums by measure NAME, so
    * every aggregate must be SUM-mergeable (COUNT is; AVG must be
    * carried as sum+count). */
  def applyDelta(views: Map[String, (Seq[String], DataFrame)],
      batch: DataFrame, aggs: Seq[org.apache.spark.sql.Column])
      : Map[String, (Seq[String], DataFrame)] = {
    require(aggs.nonEmpty, "need at least one aggregate expression")
    views.map { case (name, (cols, v)) =>
      val measureCols = v.columns.filterNot(cols.contains).toSeq
      val delta = batch.groupBy(cols.map(col): _*)
        .agg(aggs.head, aggs.tail: _*)
        .select(v.columns.map(col).toSeq: _*)
      val merged = v.unionByName(delta)
        .groupBy(cols.map(col): _*)
        .agg(sum(col(measureCols.head)).as(measureCols.head),
          measureCols.tail.map(m => sum(col(m)).as(m)): _*)
      name -> (cols, merged)
    }
  }
}
