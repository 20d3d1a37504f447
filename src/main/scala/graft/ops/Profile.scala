package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** ANALYZE-style data profiling: per-column stats a pipeline needs
  * before and after every transformation at 100 TB (skew checks, null
  * audits, partition-sizing inputs).
  *
  * ONE aggregation pass computes every column's stats simultaneously
  * (map-side partial combine; the only shuffle is the final single-group
  * reduce), then `stack` unpivots the wide row into (column, stat…)
  * rows — profiling cost is one scan regardless of column count.
  */
object Profile {

  /** Per-column profile of numeric columns: non-null count, distinct
    * count, null count, min, max (min/max as 6-dp doubles so output is
    * engine-portable). */
  def columnStats(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "columnStats needs at least one column")
    val aggs = cols.flatMap(c => Seq(
      count(col(c)).as(s"${c}__n"),
      countDistinct(col(c)).as(s"${c}__d"),
      sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}__nulls"),
      round(min(col(c)).cast("double"), 6).as(s"${c}__min"),
      round(max(col(c)).cast("double"), 6).as(s"${c}__max")))
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val stackArgs = cols.map(c =>
      s"'$c', `${c}__n`, `${c}__d`, `${c}__nulls`, `${c}__min`, `${c}__max`")
      .mkString(", ")
    wide.select(expr(s"stack(${cols.length}, $stackArgs) " +
      "as (col_name, n, n_distinct, n_nulls, min_v, max_v)"))
  }
}
