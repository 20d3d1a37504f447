package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data curation.
  *
  * Down-sampling a dominant stratum (language, source, quality band) is
  * a standard step when assembling a training corpus. `sample()`/`rand()`
  * are wrong for it at scale: they draw a NEW sample when a task is
  * re-executed after a fetch failure (the SPARK-23207 class of bug), and
  * they can't be reproduced by another engine auditing the pipeline.
  *
  * Here membership is a pure function of the row's id: the first 8 hex
  * digits of `md5(id)` are uniform over [0, 16^8), so `hexKey < threshold`
  * keeps an `rate` fraction — deterministically, on every engine that can
  * compute md5 of the same bytes. The predicate is narrow (no shuffle),
  * pushes into the scan, and a row's fate never changes across retries,
  * re-runs, or engines.
  */
object Sampling {

  /** 8-hex-digit lowercase threshold for a keep-rate in [0, 1]:
    * `floor(rate · 16^8)` hex-formatted, so `hexKey(id) < rateThreshold(r)`
    * keeps the exact bucket fraction ⌊r·2^32⌋/2^32. */
  def rateThreshold(rate: Double): String = {
    require(rate >= 0.0 && rate <= 1.0, s"rate $rate outside [0,1]")
    val buckets = math.min(math.floor(rate * 4294967296.0).toLong, 0xffffffffL)
    f"$buckets%08x"
  }

  /** The row's sampling key: first 8 hex digits of md5 of the id's string
    * form (lowercase — comparable against [[rateThreshold]] output, and
    * reproducible as `substr(md5(CAST(id AS VARCHAR)), 1, 8)` in DuckDB
    * or any engine with a standard md5). */
  def hexKey(id: Column): Column =
    substring(md5(id.cast("string").cast("binary")), 1, 8)

  /** Uniform deterministic sample: keep ~`rate` of rows, decided per id. */
  def hashSample(df: DataFrame, idCol: String, rate: Double): DataFrame =
    df.filter(hexKey(col(idCol)) < lit(rateThreshold(rate)))

  /** Deterministic weighted sample without replacement (the
    * Efraimidis–Spirakis A-ES scheme, hash-derandomized): each row gets
    * priority `ln(u) / w` where `u ∈ (0,1]` comes from the row's md5 hex
    * key and `w` is its weight; the global top-k by priority is a
    * weighted sample — a row with twice the weight is (asymptotically)
    * twice as likely to make the cut under a random id assignment, yet
    * the selection is a pure function of (id, weight): retry-safe and
    * reproducible in any engine with md5/ln (the oracle re-derives it).
    *
    * Priorities are rounded to 6 decimals before ranking (cross-engine
    * libm ulps), ties broken on id; the top-k plans as
    * TakeOrderedAndProject — no global sort at scale.
    *
    * Rows with null or non-positive weight are excluded up front — the
    * Efraimidis–Spirakis precondition is w > 0, and without the guard a
    * zero weight yields `ln(u)/0` (NaN when u = 1, else ±Inf) and NaN
    * sorts above every number under `desc`, silently winning a slot. */
  def weightedHashSample(df: DataFrame, idCol: String, weightCol: String,
      k: Int): DataFrame = {
    val w = col(weightCol).cast("double")
    // (hexKey + 1) / 2^32 ∈ (0, 1] — the +1 dodges ln(0) at hexKey = 0
    val u = (conv(hexKey(col(idCol)), 16, 10).cast("double") + 1.0) /
      4294967296.0
    df.filter(w.isNotNull && w > 0)
      .withColumn("priority", round(log(u) / w, 6))
      .orderBy(col("priority").desc, col(idCol).asc)
      .limit(k)
  }

  /** Stratified deterministic sample: per-stratum keep-rates (e.g.
    * down-sample `en` to 10% while keeping low-resource languages whole),
    * `defaultRate` for strata not listed. One narrow filter — no shuffle,
    * no per-stratum pass. */
  def stratifiedHashSample(df: DataFrame, strataCol: String, idCol: String,
      rates: Map[String, Double], defaultRate: Double): DataFrame = {
    val threshold = rates.foldLeft(lit(rateThreshold(defaultRate)): Column) {
      case (acc, (stratum, rate)) =>
        when(col(strataCol) === stratum, lit(rateThreshold(rate))).otherwise(acc)
    }
    df.filter(hexKey(col(idCol)) < threshold)
  }

  /** Deterministic negative sampling for contrastive training: `k`
    * pseudo-random OTHER documents per row, drawn by hashing (id, j) —
    * a pure function of the input, so every retry, re-run, and auditing
    * engine draws the same negatives (`rand()`-based sampling draws new
    * ones per task retry — the SPARK-23207 class of bug, fatal for a
    * reproducible training set).
    *
    * Mechanics: [[Layout.globalRowNumber]] gives each row a dense 0-based
    * index; negative j of a row is the row at index
    * `md5(id "_" j) mod n`, shifted by one when it lands on itself.
    * Scale shape: the candidate side is (index, id) — two narrow columns
    * — joined on the drawn index; AQE broadcasts it while it fits and
    * shuffles both sides on the index beyond that. Output:
    * (id, j, neg_id). */
  def negativeSample(df: DataFrame, idCol: String, k: Int): DataFrame = {
    require(k >= 1, "k must be positive")
    val indexed = Layout.globalRowNumber(df.select(idCol), idCol)
      .withColumn("__idx", col("rn") - 1).drop("rn")
    val n = indexed.count()
    require(n >= 2, s"need at least 2 rows to draw negatives, got $n")
    val cand = indexed.select(col("__idx").as("__nidx"), col(idCol).as("neg_id"))
    val drawn = indexed
      .withColumn("j", explode(array((0 until k).map(j => lit(j.toLong)): _*)))
      .withColumn("__raw",
        conv(substring(md5(concat(col(idCol).cast("string"), lit("_"),
          col("j").cast("string")).cast("binary")), 1, 8), 16, 10)
          .cast("long") % n)
      .withColumn("__nidx",
        when(col("__raw") === col("__idx"), (col("__raw") + 1) % n)
          .otherwise(col("__raw")))
    drawn.join(cand, "__nidx").select(col(idCol), col("j"), col("neg_id"))
  }

  /** Temperature-flattened mixture resampling: down-sample each domain
    * (source, language, crawl) so kept counts follow `c_d^alpha` instead
    * of the raw `c_d` — the standard move when one web domain dwarfs the
    * rest of a training mix (alpha = 1 keeps the natural distribution,
    * alpha → 0 flattens toward uniform). The smallest domain is kept
    * whole and every larger one keeps a `(c_min/c_d)^(1-alpha)` fraction,
    * which maximizes retained data subject to the target shape — no
    * up-sampling, so membership stays a pure keep/drop function.
    *
    * Per-row fate is the same md5-threshold predicate as [[hashSample]],
    * with the threshold looked up per domain: deterministic across
    * retries, re-runs, and engines. alpha = 0.5 routes through `sqrt`
    * (IEEE correctly-rounded everywhere — the oracle-exact setting);
    * other alphas use `pow`, which libms only promise within 1 ulp.
    *
    * Scale shape: one tiny per-domain count aggregate (map-side partials,
    * result rows = |domains|) broadcast back onto the fact side, then a
    * narrow filter — the corpus itself never shuffles. */
  def temperatureSample(df: DataFrame, domainCol: String, idCol: String,
      alpha: Double = 0.5): DataFrame = {
    require(alpha > 0 && alpha <= 1, s"alpha $alpha outside (0,1]")
    val counts = df.groupBy(domainCol).agg(count(lit(1)).as("__c"))
    val cmin = counts.agg(min(col("__c")).as("__cmin"))
    val ratio = col("__cmin").cast("double") / col("__c").cast("double")
    val rate = if (alpha == 0.5) sqrt(ratio) else pow(ratio, 1.0 - alpha)
    val thresholds = counts.crossJoin(cmin)
      .select(col(domainCol), floor(rate * 4294967296.0).cast("long").as("__thr"))
    df.join(broadcast(thresholds), Seq(domainCol))
      .filter(conv(hexKey(col(idCol)), 16, 10).cast("long") < col("__thr"))
      .drop("__thr")
  }

  /** Deterministic train/val/test assignment: the id's hash key falls
    * into one of the cumulative [0,1) intervals defined by `splits`
    * (name → fraction, must sum to 1). Every row keeps its assignment
    * across retries, re-runs, appends, and engines — the property that
    * makes a split *auditable*: eval-set membership can be re-derived
    * from the id alone, with no stored assignment table to drift.
    *
    * Adds a `split` column; no shuffle (a narrow projection — the
    * assignment is a pure function of the id column). */
  def hashSplit(df: DataFrame, idCol: String,
      splits: Seq[(String, Double)]): DataFrame = {
    require(splits.nonEmpty && splits.forall(_._2 >= 0) &&
      math.abs(splits.map(_._2).sum - 1.0) < 1e-9,
      s"split fractions must be non-negative and sum to 1: $splits")
    val cum = splits.map(_._2).scanLeft(0.0)(_ + _).tail
    val key = hexKey(col(idCol))
    // chain of `key < cumThreshold` checks in interval order; the last
    // split is the unconditional fallback (covers the top bucket exactly)
    val assigned = splits.zip(cum).dropRight(1)
      .foldRight(lit(splits.last._1): Column) {
        case (((name, _), c), acc) =>
          when(key < lit(rateThreshold(math.min(c, 1.0))), lit(name))
            .otherwise(acc)
      }
    df.withColumn("split", assigned)
  }

  /** Group-atomic train/val/test assignment — the leakage guard: every
    * row of a group (all chunks of a document, all documents of a
    * source, all near-duplicates sharing a canonical id) lands in the
    * SAME split, because hashing at row grain puts near-identical
    * content on both sides of the eval boundary and the eval set stops
    * measuring generalization. Mechanically [[hashSplit]] keyed on the
    * group column — the point is the grain: split on the coarsest key
    * that still leaks (canonical dedup id > document id > row id).
    * Narrow, exchange-free, auditable from the group key alone. */
  def groupHashSplit(df: DataFrame, groupCol: String,
      splits: Seq[(String, Double)]): DataFrame =
    hashSplit(df, groupCol, splits)

  /** Deterministic k-fold assignment for cross-validation: fold =
    * md5-key mod k — every row keeps its fold across retries, appends,
    * and engines, so fold i's eval set is auditable from ids alone.
    * Folds are equal in expectation (the hex key is uniform); narrow,
    * no shuffle. */
  def kFold(df: DataFrame, idCol: String, k: Int): DataFrame = {
    require(k >= 2, s"k-fold needs k >= 2, got $k")
    df.withColumn("fold",
      conv(hexKey(col(idCol)), 16, 10).cast("long") % k)
  }

  /** Purged k-fold TIME-SERIES cross-validation with embargo (the
    * financial-ML leakage guard, López de Prado 2018 ch. 7, here the
    * time-block variant): folds are k contiguous time blocks; for each
    * test fold, a train row whose timestamp falls within `embargo` of
    * the fold's time span is PURGED — close-in-time rows leak label
    * information across the split that [[kFold]]'s hash assignment
    * (and a plain contiguous split) would hand straight to the model.
    *
    * Returns the full k×n audit grid: one row per (test_fold, row) with
    * `role ∈ {test, purged, train}`. Fold assignment is ntile-style —
    * `fold = (rn−1)·k div n + 1` over the (ts, seq) total order — but
    * computed via [[Layout.globalRowNumber]]'s two-pass ranged
    * numbering, NOT a global window (which would funnel the corpus
    * through one task). The k-row bounds table broadcasts; the grid is
    * a broadcast nested-loop over it, k·n rows of ids and roles only. */
  def purgedTimeFolds(df: DataFrame, idCol: String, tsCol: String, k: Int,
      embargoExpr: String): DataFrame = {
    require(k >= 2, s"purged time folds need k >= 2, got $k")
    val n = df.count()
    require(n >= k, s"need at least k=$k rows, got $n")
    val numbered = graft.ops.Layout.globalRowNumber(
      df.select(col(idCol), col(tsCol)), Seq(tsCol, idCol), 0)
    val folds = numbered.withColumn("fold",
      expr(s"CAST((rn - 1) * $k div $n + 1 AS BIGINT)")).drop("rn")
    val bounds = folds.groupBy("fold").agg(
        min(col(tsCol)).as("__f_min"), max(col(tsCol)).as("__f_max"))
      .select(col("fold").as("test_fold"), col("__f_min"), col("__f_max"))
    val emb = expr(embargoExpr)
    folds.crossJoin(broadcast(bounds))
      .withColumn("role",
        when(col("fold") === col("test_fold"), lit("test"))
          .when(col(tsCol) >= col("__f_min") - emb &&
            col(tsCol) <= col("__f_max") + emb, lit("purged"))
          .otherwise(lit("train")))
      .drop("__f_min", "__f_max")
  }

  /** EXACTLY `n` rows per stratum (the complement of
    * [[stratifiedHashSample]]'s per-stratum RATE): rows rank by their
    * md5 hex key within each stratum and the first `n` win — still a
    * pure function of the id (retry-safe, engine-reproducible), but
    * with a guaranteed per-stratum count (balanced eval sets, per-class
    * few-shot pools). Strata smaller than `n` keep every row.
    *
    * Executes through the custom [[graft.plans.TopK]] plan: bounded
    * per-key heaps, one shuffle on the strata key, no per-stratum
    * global sort. */
  def fixedSizeStratified(df: DataFrame, strataCols: Seq[String],
      idCol: String, n: Int): DataFrame = {
    require(n >= 1, s"need n >= 1 per stratum, got $n")
    graft.plans.TopK.perKey(df.withColumn("__pri", hexKey(col(idCol))),
      strataCols, Seq(("__pri", true), (idCol, true)), n)
      .drop("__pri")
  }

  /** Budgeted selection: keep documents, in md5-priority order, until
    * the cumulative `weightCol` (token/char counts) reaches `budget` —
    * "give me ~1B tokens of this corpus" as a pure function of the ids.
    * The hash order makes the kept set an unbiased sample AND stable
    * under re-runs and appends (a new doc displaces only docs hashed
    * after it). The running sum goes through
    * [[graft.ops.Layout.globalPrefixSum]] — range-partitioned two-pass,
    * no single-partition window — so the selection scales to corpora
    * that could never pass through one task. Emits the kept rows with
    * `cum_<weightCol>` attached (the audit trail: last row shows the
    * budget actually spent). */
  def tokenBudgetSample(df: DataFrame, idCol: String, weightCol: String,
      budget: Long): DataFrame = {
    require(budget >= 1, s"budget must be positive, got $budget")
    graft.ops.Layout.globalPrefixSum(
        df.withColumn("__hk", hexKey(col(idCol))),
        Seq("__hk", idCol), weightCol)
      .filter(col(s"cum_$weightCol") <= budget)
      .drop("__hk")
  }

  /** Budget-constrained mixture allocation (water-filling): split a
    * total token `budget` across sources so small sources keep
    * EVERYTHING they have and the rest share the remainder evenly —
    * the max-min-fair split behind "cap every domain at its fair share"
    * data-mixing policies. Ascending by size, a source is SATISFIED
    * when taking it whole still leaves the others their fair share
    * (`c·remaining + prefix ≤ budget`, a prefix-monotone condition);
    * unsatisfied sources get the floor level plus one extra unit each
    * for the first `remainder` of them (deterministic: smallest first),
    * so allocations are exact integers summing to min(budget, total).
    *
    * The input is a per-source AGGREGATE (dimension-scale — bounded by
    * source cardinality, thousands at most), so the unpartitioned
    * windows here run over a tiny frame; the corpus-scale aggregation
    * that produces it is the caller's distributed pass. */
  def waterfillAllocation(counts: DataFrame, keyCol: String,
      countCol: String, budget: Long): DataFrame = {
    require(budget >= 0, s"budget must be non-negative, got $budget")
    import org.apache.spark.sql.expressions.Window
    val w = Window.orderBy(col("c").asc, col(keyCol).asc)
    val all = Window.partitionBy(lit(1))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val ranked = counts
      .select(col(keyCol), col(countCol).cast("long").as("c"))
      // a NULL count would sort first and null-poison every prefix sum
      // downstream — refuse loudly instead of emitting a wrong split
      .filter(assert_true(col("c").isNotNull && col("c") >= 0,
        lit(s"waterfillAllocation: '$countCol' must be non-null and " +
          "non-negative")).isNull)
      .withColumn("i", row_number().over(w))
      .withColumn("prefix",
        sum("c").over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("n", count(lit(1)).over(all))
      .withColumn("sat",
        col("c") * (col("n") - col("i") + 1) + col("prefix") - col("c")
          <= lit(budget))
    ranked
      .withColumn("k", sum(when(col("sat"), 1L).otherwise(0L)).over(all))
      .withColumn("prefix_k",
        sum(when(col("sat"), col("c")).otherwise(0L)).over(all))
      // `div`, not `/`: Column `/` on longs is DOUBLE division, and
      // floor(double) can misround at exact-quotient boundaries
      .withColumn("level",
        when(col("n") === col("k"), lit(0L)).otherwise(
          expr(s"(${budget}L - prefix_k) div (n - k)")))
      .withColumn("rem",
        when(col("n") === col("k"), lit(0L)).otherwise(
          expr(s"(${budget}L - prefix_k) % (n - k)")))
      .withColumn("alloc",
        when(col("sat"), col("c")).otherwise(
          col("level") +
            when(col("i") - col("k") <= col("rem"), 1L).otherwise(0L)))
      .select(col(keyCol), col("c").as(countCol), col("alloc"))
  }

  /** Sequence packing: assign each document a (shard, seq_idx, pos)
    * slot so documents concatenate into fixed-`capacity` training
    * sequences with minimal padding — the pretraining "pack to context
    * length" step (GPT-style concat-and-chunk, but document-boundary
    * preserving, T5/LLaMA packing family).
    *
    * Deterministic and shard-parallel, because a single global greedy
    * pack is inherently sequential: docs shard by `md5(id) mod nShards`
    * (engine-reproducible), order within a shard by (weight DESC, id) —
    * next-fit-DECREASING, which keeps per-sequence waste low — and one
    * sequential next-fit fold assigns (seq_idx, pos) inside the shard.
    * Packing quality is per-shard; the answer is a pure function of ids
    * and weights, stable under re-runs.
    *
    * Scale: the only shuffle is the repartition on `shard`; each
    * shard's fold is a streaming pass over its sorted rows inside one
    * task (several shards may share a task — the fold resets on shard
    * change). At 100 TB, `nShards` scales with the cluster and each
    * shard stays a bounded stream; there is NO single-partition window
    * anywhere. Oversize docs (`weight > capacity`) land alone in their
    * own sequence at pos 0 — truncation is the trainer's policy call,
    * not silently applied here.
    *
    * Emits (idCol, shard, seq_idx, pos): `pos` is the unit offset of
    * the doc inside its sequence, `seq_idx` numbers sequences within
    * the shard from 0. Requires a numeric id (cast to long for the
    * md5 key, like every sampler here). */
  def packSequences(df: DataFrame, idCol: String, weightCol: String,
      capacity: Long, nShards: Int = 64): DataFrame = {
    require(capacity >= 1, s"capacity must be positive, got $capacity")
    require(nShards >= 1, s"nShards must be positive, got $nShards")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(
        col(idCol).cast("long").as("id"),
        col(weightCol).cast("long").as("w"),
        (conv(hexKey(col(idCol)), 16, 10).cast("long") % nShards)
          .cast("int").as("shard"))
      .repartition(nShards, col("shard"))
      .sortWithinPartitions(col("shard"), col("w").desc, col("id"))
      .as[(Long, Long, Int)]
      .mapPartitions { it =>
        // rows arrive grouped by shard (sortWithinPartitions above);
        // the fold is the textbook next-fit scan, reset per shard
        var curShard = Int.MinValue
        var seq = 0L
        var cum = 0L
        it.map { case (id, w, sh) =>
          if (sh != curShard) { curShard = sh; seq = 0L; cum = 0L }
          if (cum > 0 && cum + w > capacity) { seq += 1; cum = 0L }
          val pos = cum
          cum += w
          (id, sh, seq, pos)
        }
      }
      .toDF(idCol, "shard", "seq_idx", "pos")
  }

  /** Deterministic weighted domain interleave — the ORDER half of data
    * mixing (the allocation half is [[waterfillAllocation]] /
    * [[temperatureSample]]): emit a training order where source `s`
    * appears ∝ `weights(s)` and no source bunches into long runs, with
    * no RNG anywhere. This is weighted-fair-queuing virtual time
    * applied to corpora: the r-th item of source s (r in md5 order —
    * append-stable like every sampler here) is scheduled at
    * `vt = (r · granularity) div w_s`, and the global order is
    * (vt, source, id) — a heavier source gets proportionally more slots
    * in every prefix, exactly the property curriculum/mixture training
    * wants from "interleave these sources 5:3:1".
    *
    * Scale shape: one per-source rank window (partitioned on the
    * source key), a broadcast weight join, then
    * [[graft.ops.Layout.globalRowNumber]]'s two-pass range-partitioned
    * numbering (multi-column form — native (vt, source, id) range
    * partitioning, no concatenated keys) for the global position — NO
    * single-partition window. Weights are integers ≥ 1; `granularity`
    * bounds the schedule's resolution (sources weighted beyond
    * granularity collapse together). Emits (idCol, srcCol, vt, pos),
    * pos 1-based. */
  def interleaveBySource(df: DataFrame, idCol: String, srcCol: String,
      weights: Map[String, Long], defaultWeight: Long = 1L,
      granularity: Long = 10000L): DataFrame = {
    require(defaultWeight >= 1, s"defaultWeight must be >= 1, got $defaultWeight")
    require(weights.values.forall(_ >= 1), s"weights must be >= 1: $weights")
    require(granularity >= weights.values.fold(defaultWeight)(math.max),
      "granularity must be at least the largest weight")
    import org.apache.spark.sql.expressions.Window
    val spark = df.sparkSession
    import spark.implicits._
    val wdf = weights.toSeq.toDF(srcCol, "__w")
    val keyed = df.select(col(idCol), col(srcCol))
      .join(broadcast(wdf), Seq(srcCol), "left")
      .withColumn("__w", coalesce(col("__w"), lit(defaultWeight)))
      .withColumn("__r", row_number().over(
        Window.partitionBy(col(srcCol))
          .orderBy(hexKey(col(idCol)), col(idCol))).cast("long"))
      .withColumn("vt", expr(s"(__r * ${granularity}L) div __w"))
    graft.ops.Layout
      .globalRowNumber(keyed, Seq("vt", srcCol, idCol), partitions = 0)
      .select(col(idCol), col(srcCol), col("vt"), col("rn").as("pos"))
  }

  /** Domain mixture reweighting by multiplicative weights — the
    * DoReMi-shaped move (Xie et al. 2023): domains whose per-example
    * score sits ABOVE the corpus mean ("excess") get exponentially
    * upweighted, the rest down, then the mixture renormalizes — how a
    * pretraining data recipe shifts mass toward the domains the proxy
    * model finds hardest. Exact integers throughout (the
    * bradley-terry/pagerank discipline — no libm exp, reproducible by
    * any engine):
    *
    *  - excess_d = (Σ score)/n_d − (Σ score)/N, floored integer
    *    divisions; bucketed to k_d = clamp(excess_d div bucket, ±kMax)
    *  - per round: w_d ← w_d · upNum^k / upDen^k (negative k divides),
    *    then renormalize to Σ = 1e6 by floored division
    *
    * The per-domain aggregate is the ONE distributed pass (map-side
    * combinable); the weight iteration runs on the domain-dimension
    * table (like the k-means/Bradley-Terry fits) on the driver, in
    * BigInt so kMax·rounds can't overflow. Returns
    * (domain, n_rows, mean_score, excess, bucket, w_ppm). */
  def domainMixtureWeights(df: DataFrame, domainCol: String,
      scoreCol: String, bucket: Long, kMax: Int, rounds: Int,
      upNum: Long = 11L, upDen: Long = 10L): DataFrame = {
    require(bucket > 0 && kMax >= 1 && rounds >= 1 && upNum > upDen &&
      upDen > 0, "need bucket > 0, kMax >= 1, rounds >= 1, upNum > upDen")
    val spark = df.sparkSession
    import spark.implicits._
    val agg = df.groupBy(col(domainCol).cast("string").as("domain"))
      .agg(count(lit(1)).as("n_rows"),
        sum(col(scoreCol).cast("long")).as("s"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    require(agg.nonEmpty, "empty input")
    val nTotal = agg.map(_._2).sum
    val ref = agg.map(_._3).sum / nTotal
    val rows = agg.map { case (d, n, s) =>
      val mean = s / n
      val excess = mean - ref
      // plain Long division truncates toward zero — the same semantics
      // as DuckDB's // and Spark SQL's div on negative excess
      val k = math.max(-kMax.toLong,
        math.min(kMax.toLong, excess / bucket)).toInt
      (d, n, mean, excess, k)
    }
    var w = rows.map(_ => BigInt(1000000L))
    for (_ <- 1 to rounds) {
      val stepped = rows.zip(w).map { case ((_, _, _, _, k), wi) =>
        if (k >= 0) wi * BigInt(upNum).pow(k) / BigInt(upDen).pow(k)
        else wi * BigInt(upDen).pow(-k) / BigInt(upNum).pow(-k)
      }
      val s = stepped.sum
      w = stepped.map(_ * 1000000L / s)
    }
    rows.zip(w).map { case ((d, n, mean, excess, k), wi) =>
      (d, n, mean, excess, k.toLong, wi.toLong)
    }.toSeq
      .toDF("domain", "n_rows", "mean_score", "excess", "bucket", "w_ppm")
  }

  /** Deterministic half-sample bootstrap CI for the mean (the
    * m-out-of-n subsampling bootstrap, Politis–Romano family,
    * hash-derandomized): resample r keeps row i iff the first hex
    * digit of md5("i:r") is 0-7 (a fair coin per (row, resample) —
    * the jlSign construction), the B resample means fix to milli by
    * truncating division, and the CI is the pair of COUNT-BASED
    * order statistics at ⌈(B+1)·α/2⌉ from each end — a pure function
    * of the table any engine replays, where a classic RNG bootstrap
    * could never be re-checked. The error bar the release-datasheet
    * tier can attach to every corpus mean it reports.
    *
    * Scale shape: the B-fold explode is the bootstrap's stated cost,
    * but partial aggregation collapses it to B rows per partition
    * before the exchange; the CI window runs on the (B-sized)
    * resample-mean dimension. Returns one row
    * (n_rows, b, mean_u3, ci_lo_u3, ci_hi_u3). */
  def bootstrapCi(df: DataFrame, idCol: String, valueCol: String,
      b: Int = 200, alphaPct: Long = 5L): DataFrame = {
    require(b >= 2, s"b must be >= 2, got $b")
    val kLo = ((b + 1).toLong * alphaPct + 199L) / 200L
    val kHi = (b + 1).toLong - kLo
    require(kLo >= 1L && kLo < kHi,
      s"b=$b too small for alphaPct=$alphaPct (k_lo=$kLo, k_hi=$kHi)")
    import org.apache.spark.sql.expressions.Window
    val base = df.select(col(idCol).cast("long").as("id"),
      col(valueCol).cast("long").as("v"))
    val means = base
      .withColumn("r", explode(sequence(lit(0), lit(b - 1))))
      .filter(substring(md5(concat(col("id").cast("string"), lit(":"),
        col("r").cast("string")).cast("binary")), 1, 1) < "8")
      .groupBy("r")
      .agg(expr("CAST(sum(v) * 1000 div count(1) AS BIGINT)").as("m_u3"))
    val wr = Window.orderBy("m_u3")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = means.groupBy("m_u3").agg(count(lit(1)).as("c"))
      .withColumn("cum", sum("c").over(wr)).localCheckpoint()
    val lo = cum.filter(col("cum") >= kLo).agg(min("m_u3").as("ci_lo_u3"))
    val hi = cum.filter(col("cum") >= kHi).agg(min("m_u3").as("ci_hi_u3"))
    base.agg(count(lit(1)).as("n_rows"),
        expr("CAST(sum(v) * 1000 div count(1) AS BIGINT)").as("mean_u3"))
      .withColumn("b", lit(b.toLong))
      .crossJoin(broadcast(lo)).crossJoin(broadcast(hi))
      .select("n_rows", "b", "mean_u3", "ci_lo_u3", "ci_hi_u3")
  }
}
