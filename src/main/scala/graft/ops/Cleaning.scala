package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Data-cleaning / distribution-profiling operators: equi-width
  * histograms, group-mean imputation, z-score outlier detection.
  *
  * All three are single-aggregation-pass + broadcast-back shapes: the
  * heavy side streams, the per-group statistics frame is tiny (one row
  * per group / per histogram) and broadcasts, so nothing here shuffles
  * payload rows at 100 TB. Engine-portability rules as elsewhere:
  * statistics are rounded to 6 decimals BEFORE they feed any filter or
  * output so independent engines agree despite accumulation-order ulps.
  */
object Cleaning {

  /** Equi-width histogram: `bins` buckets spanning [min, max] computed
    * from the data itself (one tiny aggregate, broadcast back). The max
    * value lands in the last bin. Output: (bin, lo, hi, cnt), lo/hi
    * rounded to 6. */
  def equiWidthHistogram(df: DataFrame, valueCol: String, bins: Int): DataFrame = {
    require(bins > 0, "bins must be positive")
    val v = col(valueCol).cast("double")
    val bounds = df.agg(min(v).as("mn"), max(v).as("mx"))
    df.select(v.as("x")).crossJoin(broadcast(bounds))
      .withColumn("width", (col("mx") - col("mn")) / bins)
      .withColumn("bin",
        when(col("width") === 0.0, lit(0L))
          .otherwise(least(floor((col("x") - col("mn")) / col("width")),
            lit(bins - 1L))).cast("long"))
      .groupBy("bin")
      .agg(round(first(col("mn")) + col("bin") * first(col("width")), 6).as("lo"),
        round(first(col("mn")) + (col("bin") + 1) * first(col("width")), 6).as("hi"),
        count(lit(1)).as("cnt"))
  }

  /** Mean imputation: nulls in `valueCol` are replaced by their group's
    * mean over the non-null rows (rounded to 6 before the fill, so the
    * imputed value is reproducible bit-for-bit in any engine). Adds
    * `<valueCol>_filled` and a boolean `imputed` flag. */
  def groupMeanImpute(df: DataFrame, valueCol: String, groupCol: String): DataFrame = {
    val means = df.groupBy(groupCol)
      .agg(round(avg(col(valueCol).cast("double")), 6).as("__grp_mean"))
    df.join(broadcast(means), Seq(groupCol), "left")
      .withColumn("imputed", col(valueCol).isNull)
      .withColumn(s"${valueCol}_filled",
        coalesce(col(valueCol).cast("double"), col("__grp_mean")))
      .drop("__grp_mean")
  }

  /** Z-score outliers per group: rows with |x − μ| / σ > `threshold`
    * (population σ). The z-score is rounded to 6 BEFORE the comparison —
    * the filter is then a pure function of values any engine computes
    * identically, not of last-ulp accumulator differences. Groups with
    * σ = 0 produce no outliers. */
  def zscoreOutliers(df: DataFrame, valueCol: String, groupCol: String,
      threshold: Double = 3.0): DataFrame = {
    val v = col(valueCol).cast("double")
    val stats = df.groupBy(groupCol).agg(
      avg(v).as("__mu"), stddev_pop(v).as("__sigma"))
    df.join(broadcast(stats), Seq(groupCol))
      .filter(col("__sigma") > 0.0)
      .withColumn("z", round(abs(v - col("__mu")) / col("__sigma"), 6))
      .filter(col("z") > threshold)
      .drop("__mu", "__sigma")
  }

  /** Row-level validation: evaluates named rules and attaches the sorted
    * list of failed rule names as `violations` (empty = clean). A rule
    * that evaluates to NULL counts as failed — a null id IS invalid, and
    * three-valued logic would otherwise wave it through.
    *
    * Narrow projection, no shuffle — validation is per-row by nature.
    * Split the result with [[quarantined]] / [[admitted]] for the
    * dead-letter pattern: bad rows route to a quarantine sink with their
    * reasons instead of failing the job (at 100 TB there is ALWAYS a
    * malformed row; a pipeline that dies on row one of quadrillions
    * never finishes). */
  def validate(df: DataFrame, rules: Seq[(String, Column)]): DataFrame = {
    require(rules.nonEmpty, "validate needs at least one rule")
    val flags = rules.map { case (name, rule) =>
      when(!coalesce(rule, lit(false)), lit(name))
    }
    df.withColumn("violations",
      sort_array(array_compact(array(flags: _*))))
  }

  /** The dead-letter side of [[validate]]: rows failing ≥ 1 rule. */
  def quarantined(df: DataFrame, rules: Seq[(String, Column)]): DataFrame =
    validate(df, rules).filter(size(col("violations")) > 0)

  /** The clean side of [[validate]]: rows passing every rule. */
  def admitted(df: DataFrame, rules: Seq[(String, Column)]): DataFrame =
    validate(df, rules).filter(size(col("violations")) === 0)
      .drop("violations")

  /** Robust outlier detection via the modified z-score (Iglewicz–
    * Hoaglin): `0.6745 · |x − median| / MAD`, flagged above `cutoff`
    * (canonically 3.5). Unlike [[zscoreOutliers]], the estimator
    * itself is outlier-resistant — one extreme value inflates mean and
    * stddev enough to mask its neighbors ("masking"), while median and
    * MAD barely move. Two small per-group aggregates (median, then MAD
    * of residuals) broadcast back; zero-MAD groups (≥ half the values
    * identical) are skipped like zero-variance groups in the z-score
    * sibling. Exact interpolated percentiles + 6-dp rounding keep the
    * score engine-portable. */
  def madOutliers(df: DataFrame, valueCol: String, groupCol: String,
      cutoff: Double = 3.5): DataFrame = {
    val v = col(valueCol).cast("double")
    val med = df.groupBy(groupCol)
      .agg(expr(s"percentile($valueCol, 0.5)").as("__med"))
    val withMed = df.join(broadcast(med), Seq(groupCol))
    val mad = withMed
      .withColumn("__res", abs(v - col("__med")))
      .groupBy(groupCol)
      .agg(expr("percentile(__res, 0.5)").as("__mad"))
    withMed.join(broadcast(mad), Seq(groupCol))
      .filter(col("__mad") > 0.0)
      .withColumn("robust_z",
        round(lit(0.6745) * abs(v - col("__med")) / col("__mad"), 6))
      .filter(col("robust_z") > cutoff)
      .drop("__med", "__mad")
  }

  /** Per-group winsorization: clamp a value column to its group's
    * [lo, hi] exact percentiles — the outlier treatment that keeps the
    * row (unlike a z-score drop) while bounding heavy tails before
    * means/regressions. Exact linear-interpolation percentiles (the
    * same cross-engine-stable `percentile` used by q41), computed in
    * one small per-group aggregate and joined back — AQE broadcasts the
    * bounds table while groups are few; the fact table never sorts.
    * Clamped values and bounds round to 6 dp so engines agree. */
  /** Cross-group quantile normalization — the batch-effect corrector
    * (genomics' standard move, equally at home normalizing quality
    * scores across crawls/sources so a percentile means the same thing
    * everywhere): each row's value is replaced by the POOLED
    * distribution's value at the row's within-group quantile
    * (nearest-rank: pooled position ⌈r_g·N / n_g⌉). After the
    * transform every group has (near-)identical marginals; ordering
    * within a group is preserved exactly.
    *
    * Shape: within-group ranks come from group-partitioned windows
    * (group-sized frames); the pooled order uses the two-pass
    * [[graft.ops.Layout.globalRowNumber]] (never a single-partition
    * window); the mapping is one equi-join on the pooled position.
    * Ties take the (value, id) total order — exact and
    * engine-reproducible. */
  def quantileNormalize(df: DataFrame, groupCol: String, idCol: String,
      valueCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = df.select(col(groupCol).as("grp"), col(idCol).as("id"),
      col(valueCol).cast("long").as("v"))
    val n = base.count()
    require(n > 0, "empty input")
    val wg = Window.partitionBy("grp").orderBy(col("v"), col("id"))
    val ranked = base
      .withColumn("rg", row_number().over(wg).cast("long"))
      .withColumn("ng",
        count(lit(1)).over(Window.partitionBy("grp")).cast("long"))
      // nearest-rank pooled position: ceil(rg·N / ng) in integers
      .withColumn("pooled_pos",
        expr(s"CAST((rg * ${n}L + ng - 1) div ng AS BIGINT)"))
    val pooled = graft.ops.Layout.globalRowNumber(
        base.select(col("v"), col("id")), Seq("v", "id"), 0)
      .select(col("rn").as("pooled_pos"), col("v").as("norm_v"))
    ranked.join(pooled, Seq("pooled_pos"))
      .select(col("grp"), col("id"), col("v"), col("rg"), col("ng"),
        col("pooled_pos"), col("norm_v"))
  }

  def winsorize(df: DataFrame, groupCol: String, valueCol: String,
      lo: Double = 0.05, hi: Double = 0.95): DataFrame = {
    require(lo >= 0 && hi <= 1 && lo < hi, s"bad percentile range [$lo, $hi]")
    val bounds = df.groupBy(groupCol).agg(
      round(expr(s"percentile($valueCol, $lo)"), 6).as("__lo"),
      round(expr(s"percentile($valueCol, $hi)"), 6).as("__hi"))
    df.join(bounds, Seq(groupCol))
      .withColumn(s"${valueCol}_wins",
        round(least(greatest(col(valueCol).cast("double"), col("__lo")),
          col("__hi")), 6))
      .drop("__lo", "__hi")
  }

  /** Corpus-WIDE winsorization with KLL-sketch bounds — the 100 TB form
    * of [[winsorize]]: the exact-percentile bounds there need a
    * per-group sort and don't merge across batches; at corpus scope the
    * [lo, hi] cuts instead come from the mergeable quantile sketch
    * ([[Profile.quantileSketchOf]], q177's tier) in ONE sketch-build
    * pass (the shuffle carries O(k)-item sketches, never values), and
    * clamping is a map-side pass against two literal scalars. The cuts
    * carry the sketch's rank-error contract (|estRank − trueRank| ≤
    * ⌈3N/k⌉; cut-derived decisions allow ±⌈6N/k⌉ — the q177 contract),
    * which q216's oracle verifies for every clamp decision. Output
    * carries `<valueCol>_wins` plus the two cuts as columns (callers
    * persist them next to the batch — the q195 sketch-driven-layout
    * move applied to cleaning). */
  def winsorizeSketched(df: DataFrame, valueCol: String,
      lo: Double = 0.05, hi: Double = 0.95, k: Int = 256): DataFrame = {
    require(lo >= 0 && hi <= 1 && lo < hi, s"bad percentile range [$lo, $hi]")
    val sk = graft.ops.Profile.quantileSketchOf(df, valueCol, k)
    val loCut = sk.quantile(lo)
    val hiCut = sk.quantile(hi)
    df.withColumn(s"${valueCol}_wins",
        round(least(greatest(col(valueCol).cast("double"), lit(loCut)),
          lit(hiCut)), 6))
      .withColumn(s"${valueCol}_lo_cut", lit(loCut))
      .withColumn(s"${valueCol}_hi_cut", lit(hiCut))
  }

  /** Forward fill (LOCF — last observation carried forward): each null
    * in `valueCols` takes the most recent non-null value of the same
    * column within its `partCols` group, in `orderCol` order. The
    * standard densification step after joining a sparse observation
    * table onto a regular time grid (sensor feeds, feature snapshots).
    *
    * Scale shape: one shuffle on the partition key; the running
    * "last non-null" is a single window agg per column (no self-join,
    * no per-row scan-back). Leading nulls — nothing observed yet —
    * stay null rather than inventing a value. */
  def forwardFill(df: DataFrame, partCols: Seq[String], orderCol: String,
      valueCols: Seq[String]): DataFrame = {
    require(valueCols.nonEmpty, "need at least one column to fill")
    val w = Window.partitionBy(partCols.map(col): _*).orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    valueCols.foldLeft(df) { (acc, c) =>
      acc.withColumn(c, last(col(c), ignoreNulls = true).over(w))
    }
  }

  /** Distribution-drift monitor between two row populations (train vs
    * serve, last week vs this week): fixed-width bins over an integer
    * value, per-period counts side by side, absolute difference
    * attached. This is the integer-exact CORE of PSI/KL drift scores —
    * the bin counts — with the logarithm left to the caller (libm would
    * cost cross-engine bit-identity, and alerting thresholds are policy
    * anyway). One aggregation over (bin); periods never join.
    *
    * The two period labels are parameters (defaulting to "a"/"b"); any
    * row whose period matches neither label — including NULL — raises
    * at execution time rather than silently counting in neither side
    * and understating drift. */
  def binnedDrift(df: DataFrame, valueCol: String, periodCol: String,
      binWidth: Long, labelA: String = "a", labelB: String = "b"): DataFrame = {
    require(binWidth >= 1, s"binWidth must be positive, got $binWidth")
    require(labelA != labelB, "period labels must differ")
    df.withColumn("bin",
        floor(col(valueCol).cast("long") / binWidth).cast("long"))
      .groupBy("bin")
      .agg(
        sum(when(col(periodCol) === labelA, 1L).otherwise(0L)).as("n_a"),
        sum(when(col(periodCol) === labelB, 1L).otherwise(0L)).as("n_b"),
        count(lit(1)).as("__n_total"))
      // count(1) - n_a - n_b catches both foreign labels and NULLs;
      // assert_true fires lazily per (tiny) bin row, so the guard costs
      // nothing on clean data and cannot be constant-folded away.
      .filter(assert_true(col("__n_total") === col("n_a") + col("n_b"),
        lit(s"binnedDrift: '$periodCol' contains values other than " +
          s"'$labelA'/'$labelB' (or NULL)")).isNull)
      .drop("__n_total")
      .withColumn("abs_diff", abs(col("n_a") - col("n_b")))
  }

  /** Collapse rare category labels into a sentinel (the "other"
    * bucketing every categorical feature pipeline needs before
    * one-hot/target encoding — unseen-at-serving labels map to the same
    * bucket as the training tail). Labels with fewer than `minCount`
    * rows become `sentinel`; the count table is tiny (one row per
    * label) and broadcasts back. */
  def rareLabelCollapse(df: DataFrame, labelCol: String, minCount: Long,
      sentinel: String = "OTHER"): DataFrame = {
    require(minCount >= 1, "minCount must be positive")
    val keep = df.groupBy(labelCol).agg(count(lit(1)).as("__n"))
      .filter(col("__n") >= minCount)
      .select(col(labelCol), lit(true).as("__keep"))
    df.join(keep, Seq(labelCol), "left")
      .withColumn(s"${labelCol}_collapsed",
        when(col("__keep"), col(labelCol)).otherwise(lit(sentinel)))
      .drop("__keep")
  }

  /** Leave-one-out target encoding, exact-integer form: each row gets
    * its category's target SUM AND COUNT with the row's own target
    * removed — (sum − y, n − 1) — so the feature never leaks the row's
    * own label. Emitting the integer pair instead of the mean keeps the
    * result bit-identical on any engine (the caller divides, with
    * whatever smoothing prior it wants). Singleton categories emit
    * (0, 0) — nothing to borrow. One tiny per-category aggregate
    * broadcast back; the fact table never shuffles.
    *
    * NULL categories are kept, not dropped: the join-back is a left
    * join, and a null-category row gets (0, 0) — same as a singleton —
    * since "no category" has no peers to borrow a target from. (An
    * inner join would silently drop such rows from the output.) */
  def targetEncodeLoo(df: DataFrame, catCol: String,
      targetCol: String): DataFrame = {
    val agg = df.groupBy(catCol).agg(
      sum(col(targetCol).cast("long")).as("__sum"),
      count(lit(1)).as("__n"))
      .filter(col(catCol).isNotNull)
    df.join(agg, Seq(catCol), "left")
      .withColumn("loo_sum",
        when(col("__sum").isNull, 0L)
          .otherwise(col("__sum") - col(targetCol).cast("long")))
      .withColumn("loo_n",
        when(col("__n").isNull, 0L).otherwise(col("__n") - 1L))
      .drop("__sum", "__n")
  }

  /** Merge overlapping or touching intervals per key (gaps-and-islands):
    * rows sort by start within each key, an island breaks where a start
    * strictly exceeds the running max of all previous ends (the running
    * max — not `lag(end)` — is what makes a long interval correctly
    * swallow short ones it fully contains), and each island collapses to
    * (min start, max end, row count). The canonical shape behind session
    * coalescing with explicit durations, downtime/uptime windows, and
    * validity-range compaction.
    *
    * One shuffle on the key; integer bounds (epoch micros) keep the
    * result engine-exact. Emits (key, island, start, end, n_rows) with
    * island a 1-based per-key ordinal. */
  def mergeIntervals(df: DataFrame, keyCol: String, startCol: String,
      endCol: String): DataFrame = {
    val byKey = Window.partitionBy(keyCol).orderBy(col(startCol), col(endCol))
    val prevMax = max(col(endCol))
      .over(byKey.rowsBetween(Window.unboundedPreceding, -1))
    df
      .withColumn("__new",
        when(prevMax.isNull || col(startCol) > prevMax, 1L).otherwise(0L))
      .withColumn("island",
        sum("__new").over(byKey.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col(keyCol), col("island"))
      .agg(min(col(startCol)).as(startCol), max(col(endCol)).as(endCol),
        count(lit(1)).as("n_rows"))
  }

  /** Dense per-key time grid at a fixed `step`: one row per key per
    * step instant from that key's first to last observation. The grid a
    * [[forwardFill]] densifies over. Emits (partCols*, gridCol).
    * The grid is generated, not stored — `sequence` + `explode` costs
    * O(rows emitted) with no shuffle beyond the min/max aggregate. */
  def timeGrid(df: DataFrame, partCols: Seq[String], tsCol: String,
      step: String, gridCol: String = "grid_ts"): DataFrame =
    df.groupBy(partCols.map(col): _*)
      .agg(min(col(tsCol)).as("__t0"), max(col(tsCol)).as("__t1"))
      .select(partCols.map(col) :+
        explode(expr(s"sequence(__t0, __t1, interval $step)")).as(gridCol): _*)

  /** Optimizer-statistics quality audit: how well does each histogram
    * type estimate a range-predicate workload's cardinality? The
    * System-R question behind choosing what stats to ANALYZE: an
    * equi-width histogram is one aggregate but lies on skew (one hot
    * bucket swallows the distribution); equi-depth costs a quantile
    * pass but bounds per-bucket error by construction. For each
    * histogram and each (pred_id, q_lo, q_hi) box, the estimate is the
    * textbook per-bucket linear interpolation
    *
    *   est = Σ_b cnt_b · |bucket_b ∩ [q_lo, q_hi]| div width_b
    *
    * on INTEGER inclusive bucket intervals, so every division
    * truncates identically in any engine; err_ppm = |est − actual|·10⁶
    * div n. `valueCol` must be integral (cents-scale floats first —
    * the q127 discipline). Equi-depth boundaries come from Spark's
    * exact `percentile` at i/bins fractions — with bins a power of two
    * the interpolation a + (b − a)·k/bins is EXACT in IEEE doubles
    * (k/bins dyadic, products < 2⁵³), so DuckDB's quantile_cont
    * re-derives bit-equal integers after round().
    *
    * Scale shape: one min/max/count aggregate, one exact-percentile
    * aggregate (B − 1 scalars to the driver — bounded by contract),
    * two bucket-count aggregates whose assignment is a literal-unrolled
    * codegen fold ([[Layout.assignRangeShards]]' rule), and the
    * estimate join runs on the (2·bins × |preds|) manifest — data rows
    * are touched exactly three times, never joined to anything.
    *
    * @return (hist ∈ width|depth, pred_id, est_rows, actual_rows,
    *         err_ppm) */
  /** Population Stability Index (the industry drift score next to
    * [[binnedDrift]]'s raw shares, q247's KS and q236's chi-square):
    * PSI = Σ_b (p_b − q_b)·ln(p_b/q_b) over REFERENCE-quantile bins —
    * the one with the operational rule of thumb (< 0.1 stable, > 0.25
    * act). Bin boundaries come from the reference period's dyadic
    * exact percentiles (the [[histogramSelectivityAudit]] discipline:
    * i/2^k interpolation is exact in IEEE doubles, so any engine
    * re-derives identical integer cuts); shares fix to ppm by
    * truncating division; each bin's ln(p/q) rounds ONCE to micro
    * (the heapsLaw float rule — a single rounding absorbs engine
    * ulps); empty bins clamp to 1 ppm (the standard PSI epsilon, made
    * exact). psi_p12 accumulates in (ppm × micro) = 10⁻¹² units;
    * Σ/10¹² is the classical PSI.
    *
    * Scale shape: one stats pass, one array-fraction percentile on
    * the reference, two bin-count aggregates whose assignment is a
    * literal-unrolled codegen fold — rows never join anything.
    *
    * @param periodCol 0 = reference, 1 = current (integral)
    * @return one row per bin: (bin, ref_ppm, cur_ppm, ln_u6,
    *         psi_contrib_p12, psi_total_p12 — repeated) */
  def psiDrift(df: DataFrame, valueCol: String, periodCol: String,
      bins: Int): DataFrame = {
    require(bins >= 2 && (bins & (bins - 1)) == 0 && bins <= 64,
      s"bins must be a power of two in [2, 64], got $bins")
    val spark = df.sparkSession
    import spark.implicits._
    val v = df.select(col(valueCol).cast("long").as("v"),
      col(periodCol).cast("long").as("p"))
      .filter(col("v").isNotNull && col("p").isin(0L, 1L))
      .localCheckpoint()
    val ref = v.filter(col("p") === 0L)
    require(!ref.isEmpty, "psiDrift needs a non-empty reference period")
    val fracs = (1 until bins).map(i => i.toDouble / bins)
    val cuts = ref
      .agg(expr(s"percentile(v, array(${fracs.mkString(", ")}))").as("c"))
      .head().getSeq[Double](0).map(math.round)
    val assign = cuts.map(b => when(col("v") > b, 1L).otherwise(0L))
      .reduce(_ + _)
    val counts = v.select(col("p"), assign.as("bin"))
      .groupBy("p", "bin").agg(count(lit(1)).as("cnt"))
    val totals = v.groupBy("p").agg(count(lit(1)).as("n"))
    val spine = spark.range(bins).select(col("id").as("bin"))
      .crossJoin(broadcast(Seq(0L, 1L).toDF("p")))
    val shares = spine
      .join(counts, Seq("p", "bin"), "left")
      .join(totals, "p")
      .select(col("p"), col("bin"),
        greatest(expr("CAST(coalesce(cnt, 0) * 1000000 div n AS BIGINT)"),
          lit(1L)).as("share"))
    val wide = shares.filter(col("p") === 0L)
      .select(col("bin"), col("share").as("ref_ppm"))
      .join(shares.filter(col("p") === 1L)
        .select(col("bin"), col("share").as("cur_ppm")), "bin")
      .withColumn("ln_u6",
        round(log(col("ref_ppm").cast("double") / col("cur_ppm")) *
          1000000, 0).cast("long"))
      .withColumn("psi_contrib_p12",
        (col("ref_ppm") - col("cur_ppm")) * col("ln_u6"))
    val total = wide.agg(sum("psi_contrib_p12").as("psi_total_p12"))
    wide.crossJoin(broadcast(total))
      .select("bin", "ref_ppm", "cur_ppm", "ln_u6", "psi_contrib_p12",
        "psi_total_p12")
  }

  def histogramSelectivityAudit(df: DataFrame, valueCol: String,
      preds: DataFrame, bins: Int): DataFrame = {
    require(bins >= 2 && (bins & (bins - 1)) == 0 && bins <= 256,
      s"bins must be a power of two in [2, 256], got $bins")
    val spark = df.sparkSession
    import spark.implicits._
    val v = df.select(col(valueCol).cast("long").as("v"))
      .filter(col("v").isNotNull).localCheckpoint()
    val st = v.agg(count(lit(1)).as("n"), min("v").as("lo"),
      max("v").as("hi")).head()
    val (n, lo, hi) = (st.getLong(0), st.getLong(1), st.getLong(2))
    require(n > 0, "histogramSelectivityAudit over an empty column")
    val w = hi - lo + 1
    // equi-width: bucket(v) = min(B−1, (v−lo)·B div W); bucket b is
    // the inclusive integer interval [lo+⌈bW/B⌉, lo+⌈(b+1)W/B⌉−1]
    val wCnt = v.select(least(lit(bins - 1),
        expr(s"(v - ${lo}L) * $bins div ${w}L")).as("b"))
      .groupBy("b").agg(count(lit(1)).as("cnt"))
    val wBuckets = spark.range(bins).select(col("id").as("b"),
        expr(s"${lo}L + (id * ${w}L + ${bins - 1}) div $bins").as("s"),
        expr(s"${lo}L + ((id + 1) * ${w}L + ${bins - 1}) div $bins - 1")
          .as("e"))
      .join(wCnt, Seq("b"), "left")
      .select(lit("width").as("hist"), col("b"), col("s"), col("e"),
        coalesce(col("cnt"), lit(0L)).as("cnt"))
    // equi-depth: boundaries β_i = round(percentile(v, i/B)); bucket i
    // = (β_i, β_{i+1}] with β_0 = lo−1, β_B = hi
    val fracs = (1 until bins).map(i => i.toDouble / bins)
    // ONE array-fraction percentile: each scalar percentile(v, f)
    // aggregate buffers the whole column independently — 15 separate
    // buffers measured 2× slower than the single shared one
    val pRow = v.agg(
      expr(s"percentile(v, array(${fracs.mkString(", ")}))").as("ps"))
      .head()
    val qs = pRow.getSeq[Double](0)
    val beta: Array[Long] = (lo - 1) +:
      qs.map(math.round).toArray :+ hi
    val dAssign = beta.slice(1, bins)
      .map(b => when(col("v") > b, 1L).otherwise(0L))
      .reduce(_ + _)
    val dCnt = v.select(dAssign.as("b")).groupBy("b")
      .agg(count(lit(1)).as("cnt"))
    val dBuckets = spark.createDataFrame(
        (0 until bins).map(i => (i.toLong, beta(i) + 1, beta(i + 1))))
      .toDF("b", "s", "e")
      .join(dCnt, Seq("b"), "left")
      .select(lit("depth").as("hist"), col("b"), col("s"), col("e"),
        coalesce(col("cnt"), lit(0L)).as("cnt"))
    val p = broadcast(preds.select(col("pred_id").cast("long").as("pred_id"),
      col("q_lo").cast("long").as("q_lo"),
      col("q_hi").cast("long").as("q_hi")))
    val est = wBuckets.unionByName(dBuckets).crossJoin(p)
      .select(col("hist"), col("pred_id"),
        when(col("e") < col("s"), lit(0L)).otherwise(
          col("cnt") *
            greatest(lit(0L), least(col("e"), col("q_hi")) -
              greatest(col("s"), col("q_lo")) + 1))
          .as("num"),
        greatest(col("e") - col("s") + 1, lit(1L)).as("den"))
      .groupBy("hist", "pred_id")
      .agg(sum(when(col("num") > 0, expr("num div den"))
        .otherwise(0L)).as("est_rows"))
    val actual = v.crossJoin(p)
      .filter(col("v") >= col("q_lo") && col("v") <= col("q_hi"))
      .groupBy("pred_id").agg(count(lit(1)).as("ar"))
    est.join(p.select("pred_id"), Seq("pred_id"))
      .join(actual, Seq("pred_id"), "left")
      .select(col("hist"), col("pred_id"), col("est_rows"),
        coalesce(col("ar"), lit(0L)).as("actual_rows"),
        expr(s"CAST(abs(est_rows - coalesce(ar, 0)) * 1000000 " +
          s"div ${n}L AS BIGINT)").as("err_ppm"))
  }
}
