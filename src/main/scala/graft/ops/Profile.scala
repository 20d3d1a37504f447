package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
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

  /** Misra–Gries heavy hitters: the frequent items in a column WITHOUT
    * shuffling the full (value, count) table — the sketch-tier answer
    * when cardinality is corpus-sized (distinct tokens/URLs at 100 TB)
    * and an exact `groupBy(value).count` would shuffle billions of keys
    * to find twenty.
    *
    * Each partition maintains a bounded `sketchSize`-counter summary
    * (insert; on overflow decrement all — the classic MG step); partial
    * summaries merge associatively up a treeAggregate. Guarantees of
    * the merged sketch: every value with true count > N/(sketchSize+1)
    * IS present, and each reported estimate undercounts by at most
    * N/(sketchSize+1). Run with sketchSize ≥ k/ε to resolve the top k
    * at error εN; confirm exact counts for the surviving candidates
    * with one cheap semi-joined recount when exactness matters.
    *
    * Returns the candidate set as (value, est_count), est desc / value
    * asc, driver-materialized (≤ sketchSize rows by construction). */
  def heavyHitters(df: DataFrame, valueCol: String,
      sketchSize: Int = 64): DataFrame = {
    require(sketchSize >= 1, "sketchSize must be positive")
    type Sketch = scala.collection.mutable.HashMap[String, Long]
    def insert(s: Sketch, v: String, w: Long): Sketch = {
      if (v != null) {
        s.get(v) match {
          case Some(c) => s.update(v, c + w)
          case None if s.size < sketchSize => s.update(v, w)
          case None => // decrement-all by the new item's weight, drop zeros
            val dec = math.min(w, s.values.min)
            val dead = new scala.collection.mutable.ArrayBuffer[String]
            s.foreach { case (k, c) =>
              if (c - dec <= 0) dead += k else s.update(k, c - dec) }
            dead.foreach(s.remove)
            if (w > dec) s.update(v, w - dec)
        }
      }
      s
    }
    def merge(a: Sketch, b: Sketch): Sketch = {
      b.foreach { case (v, c) => insert(a, v, c) }
      a
    }
    val spark = df.sparkSession
    val sketch = df.select(col(valueCol).cast("string")).rdd
      .map(_.getString(0))
      .treeAggregate(new Sketch)(insert(_, _, 1L), merge)
    import spark.implicits._
    sketch.toSeq.sortBy { case (v, c) => (-c, v) }
      .toDF(valueCol, "est_count")
  }

  /** EXACT heavy hitters through the sketch: MG candidates (a superset
    * of every value with count ≥ threshold, by the sketch guarantee),
    * then one semi-joined recount confirms exact counts and drops the
    * false candidates. The result is exactly `SELECT value, count(*)
    * … HAVING count ≥ threshold` — independent of partition layout and
    * merge order, because completeness only needs the guarantee — but
    * the only shuffle is the recount of ≤ sketchSize candidate values
    * (broadcast semi-join prunes the rest map-side), never the full
    * value space.
    *
    * Requires threshold > N/(sketchSize+1) — below that the sketch
    * cannot promise completeness, and this method refuses loudly
    * rather than return a silently-partial answer. */
  def heavyHittersExact(df: DataFrame, valueCol: String, threshold: Long,
      sketchSize: Int = 64): DataFrame = {
    val vals = df.select(col(valueCol).cast("string").as(valueCol))
    exactCore(vals, valueCol, vals.count(), threshold, sketchSize)
  }

  /** [[heavyHittersExact]] with the threshold as a corpus fraction —
    * the scale-portable form (an absolute count means different things
    * at sf 0.01 and at 100 TB; "values covering ≥ phi of rows" means
    * the same). threshold = ceil(phi · N). */
  def heavyHittersExactFrac(df: DataFrame, valueCol: String, phi: Double,
      sketchSize: Int = 64): DataFrame = {
    require(phi > 0 && phi <= 1, s"phi $phi outside (0,1]")
    val vals = df.select(col(valueCol).cast("string").as(valueCol))
    val n = vals.count()
    exactCore(vals, valueCol, n, math.ceil(phi * n).toLong, sketchSize)
  }

  /** Incremental distinct-count maintenance: per-batch HLL sketches
    * (Datasketches, binary-portable) that UNION across batches — the
    * pattern that answers "distinct users this quarter" over 100 TB
    * without ever re-scanning history: each day materializes a
    * `lgK`-sized sketch (kilobytes), and any window's distinct count is
    * a union over its days' sketches. `groupCols` gives per-group
    * sketches (per source, per language). */
  def distinctSketch(df: DataFrame, valueCol: String,
      groupCols: Seq[String] = Seq.empty, lgK: Int = 12): DataFrame = {
    val agg = hll_sketch_agg(col(valueCol), lit(lgK)).as("sketch")
    if (groupCols.isEmpty) df.agg(agg)
    else df.groupBy(groupCols.map(col): _*).agg(agg)
  }

  /** Merge previously materialized sketches and estimate the distinct
    * count of their union. */
  def mergedDistinctEstimate(sketches: DataFrame,
      sketchCol: String = "sketch"): Long =
    sketches
      .agg(hll_sketch_estimate(hll_union_agg(col(sketchCol), lit(false))))
      .first().getLong(0)

  /** Functional-dependency violation audit: `lhs` values that map to
    * more than one distinct `rhs` — the dirty-dimension probe run before
    * trusting lhs as a join/dedup key (a source that spans languages, an
    * id that spans variants). One (lhs)-keyed distinct-count aggregate;
    * returns (lhs, n_rhs) for violators only. Empty result = the FD
    * lhs → rhs holds. */
  def fdViolations(df: DataFrame, lhs: String, rhs: String): DataFrame =
    df.groupBy(col(lhs))
      .agg(countDistinct(col(rhs)).as("n_rhs"))
      .filter(col("n_rhs") > 1)

  /** Count-Min hash bucket for a string value on sketch row `row`:
    * first 8 hex chars of md5("row#value"), mod `width`. md5-derived so
    * Spark, DuckDB, and any future engine place every value in the SAME
    * cell — the sketch table itself is engine-portable (and the oracle
    * can re-derive it end to end). */
  private def cmBucket(row: Column, v: Column, width: Int): Column =
    conv(substring(md5(concat_ws("#", row.cast("string"), v).cast("binary")),
      1, 8), 16, 10).cast("long") % width

  /** Count-Min sketch build: a depth × width grid of counters, each row
    * an independent hash of the value space. The sketch answers point
    * frequency queries with ≤ εN overestimate (ε ≈ e/width) at
    * confidence 1−δ (δ ≈ e^−depth) in O(depth·width) space — the
    * streaming-frequency complement of the MG candidate sketch above
    * (MG: WHICH values are heavy; CM: HOW OFTEN is this value, for any
    * value, without storing the value space).
    *
    * Scale shape: one explode (×depth) + one (row, bucket)-keyed count
    * with map-side partial aggregation into at most depth·width cells —
    * the shuffle carries the GRID, never the values. Cells with zero
    * count are simply absent (estimate treats missing as 0). */
  def countMinBuild(df: DataFrame, valueCol: String,
      depth: Int = 4, width: Int = 256): DataFrame = {
    require(depth >= 1 && width >= 2, s"bad sketch shape $depth x $width")
    df.select(col(valueCol).cast("string").as("__v"))
      .filter(col("__v").isNotNull)
      .select(col("__v"), explode(sequence(lit(0), lit(depth - 1))).as("row"))
      .select(col("row"), cmBucket(col("row"), col("__v"), width).as("bucket"))
      .groupBy("row", "bucket").agg(count(lit(1)).as("cnt"))
  }

  /** [[countMinBuild]] from pre-aggregated (value, weight) rows — the
    * batch-pipeline form: when a frequency table already exists (or
    * several shards' tables do), the sketch is the weighted cell sum,
    * additive and order-independent, so shard sketches merge by summing
    * cells. Identical result to the raw build over the expanded
    * stream. */
  def countMinBuildCounts(counts: DataFrame, valueCol: String,
      weightCol: String, depth: Int = 4, width: Int = 256): DataFrame = {
    require(depth >= 1 && width >= 2, s"bad sketch shape $depth x $width")
    counts.select(col(valueCol).cast("string").as("__v"),
        col(weightCol).cast("long").as("__w"))
      .filter(col("__v").isNotNull)
      .select(col("__v"), col("__w"),
        explode(sequence(lit(0), lit(depth - 1))).as("row"))
      .select(col("row"), cmBucket(col("row"), col("__v"), width).as("bucket"),
        col("__w"))
      .groupBy("row", "bucket").agg(sum("__w").as("cnt"))
  }

  /** Merge Count-Min sketches built over disjoint shards (or days —
    * the incremental-maintenance pattern [[distinctSketch]] uses for
    * HLL): cells are additive, so the union sketch is a cell-wise sum
    * and any window's sketch is a merge over its shards' sketches,
    * never a re-scan of history. */
  def countMinMerge(sketches: DataFrame): DataFrame =
    sketches.groupBy("row", "bucket").agg(sum("cnt").as("cnt"))

  /** Point-frequency estimates from a [[countMinBuild]] sketch: for each
    * distinct query value, min over the depth cells it hashes to —
    * never an underestimate, overestimate bounded as documented above.
    * The sketch broadcasts (≤ depth·width rows by construction); the
    * query side never shuffles more than its own distinct values. */
  def countMinEstimate(sketch: DataFrame, queries: DataFrame,
      valueCol: String, depth: Int = 4, width: Int = 256): DataFrame = {
    require(depth >= 1 && width >= 2, s"bad sketch shape $depth x $width")
    queries.select(col(valueCol).cast("string").as(valueCol)).distinct()
      .filter(col(valueCol).isNotNull)
      .select(col(valueCol), explode(sequence(lit(0), lit(depth - 1))).as("row"))
      .select(col(valueCol), col("row"),
        cmBucket(col("row"), col(valueCol), width).as("bucket"))
      .join(broadcast(sketch), Seq("row", "bucket"), "left")
      .groupBy(valueCol)
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est"))
  }

  private def exactCore(vals: DataFrame, valueCol: String, n: Long,
      threshold: Long, sketchSize: Int): DataFrame = {
    require(threshold > n / (sketchSize + 1),
      s"threshold $threshold not covered by sketch guarantee " +
        s"N/(size+1) = ${n / (sketchSize + 1)}: raise sketchSize")
    val candidates = heavyHitters(vals, valueCol, sketchSize)
      .select(col(valueCol))
    vals.join(broadcast(candidates), Seq(valueCol), "left_semi")
      .groupBy(valueCol).agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= threshold)
  }

  /** Cluster–label purity audit: per group (e.g. an IVF centroid cell),
    * total membership and the majority label with its count — the
    * clustering-quality check a mixture/curriculum pipeline runs before
    * trusting cluster assignments as domain proxies (SemDeDup-style
    * pipelines audit exactly this). Exact integers only: purity ratios
    * are left to the caller so the result stays engine-reproducible.
    * Two map-side-combine aggregations over (group, label) — the
    * (group, label) key space is dimension-sized, never corpus-sized;
    * ties on count break to the smallest label (deterministic). */
  def clusterLabelPurity(assigned: DataFrame, groupCol: String = "centroid",
      labelCol: String = "label"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val counts = assigned.groupBy(col(groupCol), col(labelCol))
      .agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy(groupCol).orderBy(desc("cnt"), col(labelCol))
    val majority = counts.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col(groupCol), col(labelCol).as("maj_label"),
        col("cnt").as("maj_n"))
    val totals = counts.groupBy(col(groupCol)).agg(sum("cnt").as("n"))
    totals.join(majority, Seq(groupCol))
      .select(col(groupCol), col("n"), col("maj_label"), col("maj_n"))
  }
}
