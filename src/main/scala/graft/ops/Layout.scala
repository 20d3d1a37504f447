package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Data-layout optimization: Z-order (Morton-curve) clustering.
  *
  * A table sorted on one column prunes beautifully on that column and
  * not at all on any other. Interleaving the bits of two columns into a
  * Z-value and range-partitioning + sorting on it makes every output
  * file cover a small RECTANGLE of the (a, b) space instead of a thin
  * full-height stripe — so parquet min/max statistics prune row groups
  * for predicates on EITHER column (the Delta/Iceberg `ZORDER BY`
  * capability, expressed with plain Spark + parquet).
  *
  * Write-time op: the interleave UDF prices into the one-off layout
  * job, never into reads. Values must be non-negative; callers bucket
  * or offset signed/continuous domains first (document the mapping —
  * determinism is what makes the layout reproducible).
  */
object Layout {

  /** Bit-interleave two non-negative longs (low `bits` of each):
    * a's bit i lands at 2i, b's at 2i+1. 21 bits each stays within a
    * positive Long (42 result bits). */
  private[ops] def interleaveBits(a: Long, b: Long, bits: Int): Long =
    graft.functions.Morton.interleave(a, b, bits)

  /** The Morton code of two non-negative integral columns — a native
    * codegen'd [[graft.functions.MortonInterleave]] expression (was a
    * boxed-Long UDF; the write path evaluates this per row over the
    * whole table being laid out, so it belongs inside the codegen
    * span). Null inputs propagate as null — a null key must not Z-sort
    * to the origin. */
  def zValue(a: Column, b: Column, bits: Int = 21): Column = {
    require(bits >= 1 && bits <= 31, s"bits=$bits outside [1, 31]")
    import org.apache.spark.sql.GraftSqlBridge
    GraftSqlBridge.column(graft.functions.MortonInterleave(
      GraftSqlBridge.expression(a.cast("long")),
      GraftSqlBridge.expression(b.cast("long")), bits))
  }

  /** The Hilbert-curve index of two non-negative integral columns
    * (the classic xy2d walk, level by level from the top bit) — the
    * locality upgrade over [[zValue]]: consecutive Hilbert indices are
    * ALWAYS grid-adjacent (the spec proves it cell-by-cell), where
    * Z-order jumps across the plane at every power-of-two seam, so
    * range-partitioned files span tighter (a, b) rectangles and
    * min/max pruning cuts deeper on both dimensions. A native
    * codegen'd [[graft.functions.HilbertIndex]] expression — a Column-
    * algebra fold is a trap here: each xy2d level reads the previous
    * level's (x, y) several times, the tree grows ~5^bits, and
    * Catalyst OOMs analyzing it (observed at bits = 10). Inputs must
    * be non-negative and below 2^bits (the zValue contract); nulls
    * propagate. */
  def hilbertValue(a: Column, b: Column, bits: Int = 21): Column = {
    require(bits >= 1 && bits <= 31, s"bits=$bits outside [1, 31]")
    import org.apache.spark.sql.GraftSqlBridge
    GraftSqlBridge.column(graft.functions.HilbertIndex(
      GraftSqlBridge.expression(a.cast("long")),
      GraftSqlBridge.expression(b.cast("long")), bits))
  }

  /** Consistent-hash ring assignment (Karger et al. STOC 1997, the
    * memcached/Dynamo routing scheme) — the shard router whose
    * defining property mod-N hashing lacks: adding a node moves only
    * ~1/(N+1) of the keys, not all of them. Each node plants `vnodes`
    * ring points at md5("node:v"); a key routes to the first point
    * clockwise from md5(key) (smallest point ≥ the key's, wrapping to
    * the ring's minimum). Pure md5 integers — any engine re-derives
    * the whole routing table and every assignment.
    *
    * Scale shape: the ring is (nodes × vnodes)-sized — broadcast by
    * construction; assignment is one broadcast candidate join + a
    * per-key min (a compiled binary-search UDF is the constant-factor
    * upgrade at serving time; the relational form is the auditable
    * reference). Returns (id, node, kp). */
  def consistentHashAssign(df: DataFrame, idCol: String,
      nodes: Seq[String], vnodes: Int = 64): DataFrame = {
    require(nodes.nonEmpty && vnodes >= 1,
      s"need nodes and vnodes >= 1: $nodes/$vnodes")
    val spark = df.sparkSession
    def pt(s: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      d.take(4).foldLeft(0L)((a, b) => (a << 8) | (b & 0xffL))
    }
    val ring = spark.createDataFrame(for {
        n <- nodes; v <- 0 until vnodes
      } yield (n, pt(s"$n:$v")))
      .toDF("node", "point")
    val minRow = ring.agg(min(struct(col("point"), col("node")))
      .as("m")).select(col("m.node").as("wrap_node"))
    val keys = df.select(col(idCol).as("id"),
      conv(graft.ops.Sampling.hexKey(col(idCol)), 16, 10)
        .cast("long").as("kp"))
    keys.crossJoin(broadcast(ring))
      .filter(col("point") >= col("kp"))
      .groupBy("id", "kp")
      .agg(min(struct(col("point"), col("node"))).as("m"))
      .select(col("id"), col("m.node").as("node"), col("kp"))
      .unionByName(
        keys.join(
          keys.crossJoin(broadcast(ring))
            .filter(col("point") >= col("kp"))
            .select("id").distinct(),
          Seq("id"), "left_anti")
          .crossJoin(broadcast(minRow))
          .select(col("id"), col("wrap_node").as("node"), col("kp")))
  }

  /** Rendezvous (highest-random-weight) hashing (Thaler & Ravishankar
    * 1998) — [[consistentHashAssign]]'s sibling scheme with the
    * complementary property: REMOVING a node reassigns exactly that
    * node's keys (spread evenly over the survivors), with no ring and
    * no vnodes — each key simply routes to the node maximizing
    * md5("node:key"). Pure integer argmax (ties by node name — md5
    * collisions on 32 bits are possible in principle), a pure
    * function of (nodes, key) any engine replays.
    *
    * Scale shape: an N-node broadcast expansion per key (N is the
    * cluster size — a constant multiplier) and a per-key argmax; at
    * serving time the same loop runs in a compiled UDF, this
    * relational form is the auditable reference. Returns (id, node). */
  def rendezvousAssign(df: DataFrame, idCol: String,
      nodes: Seq[String]): DataFrame = {
    require(nodes.nonEmpty, "need at least one node")
    import org.apache.spark.sql.expressions.Window
    val spark = df.sparkSession
    val nd = spark.createDataFrame(nodes.map(Tuple1(_))).toDF("node")
    val w = Window.partitionBy("id")
      .orderBy(desc("score"), col("node"))
    df.select(col(idCol).as("id"))
      .crossJoin(broadcast(nd))
      .withColumn("score", conv(substring(md5(concat(col("node"),
        lit(":"), col("id").cast("string")).cast("binary")), 1, 8),
        16, 10).cast("long"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select("id", "node")
  }

  /** Z-order-clustered parquet write: range-partition on the Morton
    * code into `files` output files, sort within each, drop the helper
    * column. Every file then spans a bounded rectangle of (a, b) —
    * min/max stats prune on both dimensions. `repartitionByRange`
    * samples the z distribution, so skewed domains still split evenly. */
  def zorderWrite(df: DataFrame, colA: String, colB: String, path: String,
      files: Int, bits: Int = 21): Unit = {
    require(files >= 1, "files must be positive")
    df.withColumn("__z", zValue(col(colA), col(colB), bits))
      .repartitionByRange(files, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }

  /** Posting-list compression model (delta + varint) — the index-size
    * planning number BEFORE building a 100 TB inverted index: sorted
    * doc-id postings store as gaps, gaps as LEB128 varints; this
    * reports, per term, the exact varint byte cost vs the raw 8-byte
    * encoding. Frequent terms (dense postings → tiny gaps → 1-byte
    * varints) compress ~8×; rare terms don't — the audit tells you
    * which dictionary split / block scheme pays.
    *
    *   varint_bytes(g) = 1 + ⌊log₁₂₈ g⌋, expressed as exact threshold
    *   CASEs (g < 2⁷ → 1, < 2¹⁴ → 2, < 2²¹ → 3, < 2²⁸ → 4, else 5 —
    *   doc ids up to 2³⁵ covered)
    *
    * Shape: (term, doc) dedupes, gaps come from a term-keyed lag
    * window (each term's postings sort within their own partition —
    * never a global sort), per-term sums are map-side combinable.
    * The first posting's gap is the doc id itself (delta from 0). */
  def postingsCompressionAudit(df: DataFrame, termCol: String,
      docCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("term")).orderBy(col("doc"))
    val gaps = df.select(col(termCol).as("term"),
        col(docCol).cast("long").as("doc")).distinct()
      .withColumn("gap",
        col("doc") - coalesce(lag(col("doc"), 1).over(w), lit(0L)))
      .withColumn("vbytes",
        when(col("gap") < 128L, 1L)
          .when(col("gap") < 16384L, 2L)
          .when(col("gap") < 2097152L, 3L)
          .when(col("gap") < 268435456L, 4L)
          .otherwise(5L))
    gaps.groupBy("term")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("vbytes")).as("varint_bytes"))
      .withColumn("raw_bytes", col("n_docs") * 8)
      .withColumn("ratio_pm",
        expr("CAST(varint_bytes * 1000 div raw_bytes AS BIGINT)"))
  }

  /** Global row numbering WITHOUT the single-partition funnel: the naive
    * `row_number() OVER (ORDER BY …)` plans one window over one
    * partition — the whole table through one task. Here: range-partition
    * on the (unique) order key, count rows per partition (a `p`-row
    * aggregate), broadcast the cumulative offsets back, and number
    * within each partition — `rn = offset(partition) + intra_rank`.
    * Equals the naive window's output exactly; every stage is
    * distributed and the only driver state is one long per partition.
    *
    * The ranged frame is localCheckpoint-pinned: `repartitionByRange`
    * samples boundaries per execution, so the counts pass and the
    * numbering pass MUST see the same physical partitioning — without
    * the pin they could each sample differently and skew every offset.
    * `orderCol` must be unique (ties could straddle a range boundary and
    * make the numbering run-dependent). */
  def globalRowNumber(df: DataFrame, orderCol: String,
      partitions: Int = 0): DataFrame =
    globalRowNumber(df, Seq(orderCol), partitions)

  /** Multi-column form of [[globalRowNumber]]: the COMBINATION of
    * `orderCols` must be a total order (a unique tie-break column
    * last). Composite orders go through native multi-column range
    * partitioning rather than a concatenated string key — string keys
    * can't reproduce SQL's shorter-string-sorts-first semantics at
    * value boundaries (a separator char compares against data chars). */
  def globalRowNumber(df: DataFrame, orderCols: Seq[String],
      partitions: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(orderCols.nonEmpty, "orderCols must be non-empty")
    val spark = df.sparkSession
    val p = if (partitions > 0) partitions
            else spark.sparkContext.defaultParallelism
    val staged = df.repartitionByRange(p, orderCols.map(col): _*)
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint()
    val counts = staged.groupBy("__pid").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    var acc = 0L
    val offsets = counts.map { case (pid, n) => val o = (pid, acc); acc += n; o }
    val offDf = spark.createDataFrame(offsets.toSeq).toDF("__pid", "__off")
    staged
      .join(broadcast(offDf), "__pid")
      .withColumn("rn", col("__off") +
        row_number().over(Window.partitionBy("__pid")
          .orderBy(orderCols.map(col): _*)))
      .drop("__pid", "__off")
  }

  /** Global running sum of `weightCol` in `orderCols` order WITHOUT the
    * single-partition window funnel — the same two-pass construction as
    * [[globalRowNumber]] (range-partition, per-partition totals, offsets
    * broadcast back, within-partition running sum + offset). The
    * enabling primitive for budgeted selection ("keep documents until
    * the token budget is spent") over corpora that could never pass
    * through one task. `orderCols` must be a total order (include a
    * unique tie-break) for run-independence. Adds `cum_<weightCol>`;
    * null weights are rejected loudly rather than silently skipped. */
  def globalPrefixSum(df: DataFrame, orderCols: Seq[String],
      weightCol: String, partitions: Int = 0): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val spark = df.sparkSession
    val p = if (partitions > 0) partitions
            else spark.sparkContext.defaultParallelism
    val staged = df
      .withColumn("__w", col(weightCol).cast("long"))
      .repartitionByRange(p, orderCols.map(col): _*)
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint()
    require(staged.filter(col("__w").isNull).isEmpty,
      s"null $weightCol would silently vanish from the running sum")
    val sums = staged.groupBy("__pid").agg(sum("__w").as("__s")).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    var acc = 0L
    val offsets = sums.map { case (pid, s) => val o = (pid, acc); acc += s; o }
    val offDf = spark.createDataFrame(offsets.toSeq).toDF("__pid", "__off")
    staged
      .join(broadcast(offDf), "__pid")
      .withColumn(s"cum_$weightCol",
        col("__off") + sum(col("__w")).over(
          Window.partitionBy("__pid")
            .orderBy(orderCols.map(col): _*)
            .rowsBetween(Window.unboundedPreceding, 0)))
      .drop("__pid", "__off", "__w")
  }

  /** Per-file min/max manifest — the data-skipping statistics layer
    * Delta/Iceberg keep in their metadata, computed for a plain parquet
    * table: one row per file with each tracked column's bounds and row
    * count. An external reader (or a planner hook) intersects a
    * predicate with these bounds and prunes files before listing splits
    * — the payoff of [[zorderWrite]]'s clustering is exactly that these
    * rectangles get tight. One scan, aggregated by `input_file_name()`
    * (a shuffle keyed on file path — rows-per-key = rows-per-file,
    * bounded by file size). */
  def fileStats(spark: SparkSession, path: String,
      cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "fileStats needs at least one column")
    val df = spark.read.parquet(path)
    val aggs = count(lit(1)).as("n_rows") +: cols.flatMap(c => Seq(
      min(col(c)).as(s"${c}_min"), max(col(c)).as(s"${c}_max")))
    df.withColumn("__file", input_file_name())
      .groupBy("__file")
      .agg(aggs.head, aggs.tail: _*)
      .withColumnRenamed("__file", "file")
  }

  /** The files a predicate over `statsCol` bounds cannot rule out —
    * the pruning decision [[fileStats]] enables, as a standalone query
    * over the manifest (tiny: one row per file). */
  def candidateFiles(stats: DataFrame, statsCol: String, lo: Long,
      hi: Long): DataFrame =
    stats.filter(col(s"${statsCol}_max") >= lo && col(s"${statsCol}_min") <= hi)
      .select("file")

  /** Clustering-depth audit over a [[fileStats]] manifest — the
    * OPTIMIZE/ZORDER effectiveness metric (Delta's "clustering depth")
    * for plain parquet: a file's depth is how many manifest files
    * (itself included) its `[min, max]` interval overlaps on `c`.
    * Depth 1 everywhere = perfectly range-clustered (a point predicate
    * prunes to one file); depth ≈ n_files = fully interleaved (hash
    * layout, min/max stats prune nothing) — the signal a table
    * maintenance job uses to decide when re-clustering pays. The
    * interval self-join runs on the manifest DIMENSION (one row per
    * file), never on data rows. */
  def clusteringDepth(stats: DataFrame, c: String): DataFrame = {
    val a = stats.select(col("file"), col(s"${c}_min").as("mn"),
      col(s"${c}_max").as("mx"), col("n_rows"))
    val b = stats.select(col(s"${c}_min").as("bmn"),
      col(s"${c}_max").as("bmx"))
    a.join(b, col("mn") <= col("bmx") && col("bmn") <= col("mx"))
      .groupBy("file", "mn", "mx", "n_rows")
      .agg(count(lit(1)).as("depth"))
  }

  /** Sketch-derived range-shard boundaries: the `nShards − 1` interior
    * quantile cuts of `valueCol` from one distributed
    * [[Profile.quantileSketchOf]] pass — the boundary-estimation step
    * `repartitionByRange` does with reservoir sampling, made sample-free
    * and MERGEABLE (per-batch sketch rows union across days;
    * RangePartitioner's sample is neither). Balance contract follows
    * the sketch's rank error: each shard holds N/nShards rows ± 6N/k.
    * Cut values may vary within that bound across rebuilds (KLL
    * compaction is merge-order-dependent) — the guarantee is the rank
    * bound, not bit-identity, q185's contract. */
  def rangeShardBounds(df: DataFrame, valueCol: String, nShards: Int,
      k: Int = 256): Array[Double] = {
    require(nShards >= 2, s"nShards must be >= 2, got $nShards")
    val sk = Profile.quantileSketchOf(df, valueCol, k)
    (1 until nShards).map(i => sk.quantile(i.toDouble / nShards)).toArray
  }

  /** Assign every row its range shard: `shard = |{cuts < value}|`
    * (so cut values themselves land in the LOWER shard — ties on a
    * heavy boundary value never split across engines). The cuts are a
    * driver-side array by construction (nShards − 1 entries), so the
    * comparison UNROLLS into a plain when-sum that stays inside
    * whole-stage codegen — a higher-order `aggregate` lambda would
    * fall out of codegen for no gain. Map-side only; writing with
    * `partitionBy("shard")` (or repartitioning on it) then gives
    * range-clustered files whose min/max stats actually prune —
    * [[clusteringDepth]] is the audit that closes the loop. */
  def assignRangeShards(df: DataFrame, valueCol: String,
      bounds: Array[Double]): DataFrame = {
    val v = col(valueCol).cast("double")
    val shard = bounds.map(b => when(v > lit(b), 1L).otherwise(0L))
      .reduceOption(_ + _).getOrElse(lit(0L))
    df.withColumn("shard", shard)
  }

  /** Dictionary-encoding advisor for string columns — the decision a
    * Parquet/ORC writer makes per column chunk, surfaced as a table:
    * PLAIN costs 4·n + Σlen(values) (length-prefixed); DICT costs the
    * dictionary page (Σlen over DISTINCT values + 4·ndv) plus n
    * bit-packed indices at ceil(log2 ndv) bits (min 1). Ties prefer
    * DICT (the writers' default — dictionary pages also enable page
    * skipping). Byte lengths via octet_length (UTF-8 bytes — DuckDB's
    * strlen), bit width by integer arithmetic (float log2 flips at
    * powers of two).
    *
    * Scale shape: one value-dimension aggregate per column (groupBy
    * value, then one row of moments — the shuffle carries the distinct
    * values once); the per-column verdicts are a ≤|cols| driver read
    * by contract. */
  def encodingAdvisor(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty && cols.size <= 16,
      s"cols must have 1..16 columns, got ${cols.size}")
    require(cols.distinct.size == cols.size, s"duplicate cols in $cols")
    val spark = df.sparkSession
    import spark.implicits._
    val rows = cols.map { c =>
      val r = df.select(col(c).cast("string").as("v"))
        .filter(col("v").isNotNull)
        .groupBy("v").agg(count(lit(1)).as("cnt"))
        .agg(count(lit(1)).as("ndv"),
          sum(octet_length(col("v"))).as("dlen"),
          sum("cnt").as("n"),
          sum(octet_length(col("v")) * col("cnt")).as("slen"))
        .head()
      val (ndv, dlen, n, slen) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      val bits =
        if (ndv <= 2) 1L
        else (64 - java.lang.Long.numberOfLeadingZeros(ndv - 1)).toLong
      val plain = slen + 4 * n
      val dict = dlen + 4 * ndv + (n * bits + 7) / 8
      (c, n, ndv, plain, dict, bits,
        if (dict <= plain) "dict" else "plain")
    }
    spark.createDataFrame(rows).toDF("column_name", "n_rows", "ndv",
      "plain_bytes", "dict_bytes", "bits", "encoding")
  }

  /** Roaring-bitmap container planning (Chambi, Lemire et al. 2016 —
    * the postings layout Lucene/Druid/ClickHouse converged on) for a
    * (term, doc-id) posting table: ids chunk by their high 16 bits,
    * and each chunk independently picks the cheapest of Roaring's
    * three containers from exact statistics —
    *
    *   array  = 2·c bytes (sorted shorts, only when c ≤ 4096),
    *   bitmap = 8192 bytes (fixed 2¹⁶-bit vector),
    *   run    = 2 + 4·r bytes (r = maximal consecutive runs),
    *
    * ties array < bitmap < run at equal size (Roaring's own priority).
    * [[postingsCompressionAudit]] scores ONE encoding (varint gaps);
    * this is the per-chunk adaptive choice that beats any single one.
    * Returns one row per (term, chunk): cardinality, n_runs,
    * container, bytes. Run counting is a lag window per (term, chunk)
    * partition — bounded at 2¹⁶ rows by construction, the partitioner
    * IS the chunk key. */
  def roaringPlan(df: DataFrame, termCol: String,
      docCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = df.select(col(termCol).as("term"),
        col(docCol).cast("long").as("doc")).distinct()
      .select(col("term"), col("doc"),
        expr("doc div 65536").as("chunk"),
        (col("doc") % 65536).as("lo"))
    val w = Window.partitionBy("term", "chunk").orderBy("lo")
    val marked = base
      .withColumn("prev", lag(col("lo"), 1).over(w))
      .withColumn("is_run_start",
        when(col("prev").isNull || col("lo") - col("prev") =!= 1L, 1L)
          .otherwise(0L))
    val stats = marked.groupBy("term", "chunk")
      .agg(count(lit(1)).as("cardinality"),
        sum("is_run_start").as("n_runs"))
    stats
      .withColumn("array_bytes",
        when(col("cardinality") <= 4096, col("cardinality") * 2)
          .otherwise(lit(Long.MaxValue)))
      .withColumn("bitmap_bytes", lit(8192L))
      .withColumn("run_bytes", lit(2L) + col("n_runs") * 4)
      .withColumn("container",
        when(col("array_bytes") <= col("bitmap_bytes") &&
          col("array_bytes") <= col("run_bytes"), lit("array"))
          .when(col("bitmap_bytes") <= col("run_bytes"), lit("bitmap"))
          .otherwise(lit("run")))
      .withColumn("bytes",
        least(col("array_bytes"), col("bitmap_bytes"), col("run_bytes")))
      .select("term", "chunk", "cardinality", "n_runs", "container",
        "bytes")
  }

  /** Greedy materialized-view selection over the data-cube lattice
    * (Harinarayan, Rajaraman & Ullman SIGMOD'96) — the physical-design
    * decision next to [[zorderWrite]] and [[pruningAudit]]: which k
    * GROUP BY views to materialize so the whole cube answers fastest.
    * Every subset of `dims` is a lattice node whose cost-to-answer is
    * the size of its smallest materialized ancestor; the HRU greedy
    * picks, k times, the view maximizing total benefit
    * Σ_{w ⊆ v} max(0, cost(w) − |v|) — provably within (1 − 1/e) of
    * optimal for this benefit function. Ties break to the smaller
    * lattice mask (deterministic).
    *
    * Scale shape: ALL 2^d view sizes come from ONE cube() scan —
    * grouping_id partitions the cube output by grouping set, so a
    * single count per gid is each view's exact row count. The lattice
    * itself (≤ 2⁶ nodes by the dims guard) is driver-side by
    * contract — the greedy is pure arithmetic on those counts, the
    * same bounded-read discipline as the KMV/KLL sketch readers.
    *
    * @return one row per greedy step: (step, view, mask, size,
    *         benefit) — view names the kept dims ("c,d"; "()" for the
    *         apex), mask has bit i set iff dims(i) is kept. */
  def viewLatticeGreedy(df: DataFrame, dims: Seq[String],
      k: Int): DataFrame = {
    require(dims.size >= 2 && dims.size <= 6,
      s"dims must have 2..6 columns, got ${dims.size}")
    require(dims.distinct.size == dims.size, s"duplicate dims in $dims")
    val d = dims.size
    val full = (1 << d) - 1
    require(k >= 1 && k <= full, s"k must be in [1, $full], got $k")
    val spark = df.sparkSession
    import spark.implicits._
    val gidRows = df.cube(dims.map(col): _*)
      .agg(grouping_id().as("gid"))
      .groupBy("gid").count()
      .collect().map(r => r.getLong(0).toInt -> r.getLong(1))
    // Spark's grouping_id: leftmost dim = MOST significant bit, set
    // bit = dim rolled AWAY. Flip to mask bit i = dims(i) KEPT.
    val sizes: Map[Int, Long] = gidRows.map { case (gid, n) =>
      val mask = (0 until d)
        .filter(i => ((gid >> (d - 1 - i)) & 1) == 0)
        .map(1 << _).sum
      mask -> n
    }.toMap
    def name(m: Int): String =
      if (m == 0) "()"
      else (0 until d).filter(i => (m & (1 << i)) != 0)
        .map(dims).mkString(",")
    var selected = Set(full)
    val res = (1 to k).map { step =>
      val (v, b) = (0 to full).filterNot(selected.contains).map { v =>
        val bv = (0 to full).filter(w => (w & v) == w).map { w =>
          val costW = selected.filter(a => (w & a) == w)
            .map(sizes).min
          math.max(0L, costW - sizes(v))
        }.sum
        (v, bv)
      }.maxBy { case (m, b) => (b, -m.toLong) }
      selected += v
      (step.toLong, name(v), v.toLong, sizes(v), b)
    }
    spark.createDataFrame(res)
      .toDF("step", "view", "mask", "size", "benefit")
  }

  /** Workload-level zone-map pruning audit — the question a table
    * OPTIMIZE job actually has to answer: "for THIS predicate workload,
    * which physical layout prunes more?" [[clusteringDepth]] scores a
    * layout in the abstract; this one simulates it against real
    * predicates. For each candidate layout (name, sort key): rows are
    * range-sharded into `nFiles` files in key order (the write order a
    * `sortBy(key)` table rewrite would produce), each file's 2-d zone
    * — min/max of `xCol` and `yCol` — is computed, and each box
    * predicate in `preds` (pred_id, x_lo, x_hi, y_lo, y_hi, inclusive)
    * must read exactly the files whose zone overlaps its box. Returns
    * one row per (layout, pred_id):
    *
    *   files_total, files_read, rows_scanned (Σ rows of read files),
    *   rows_matched (exact — layout-independent),
    *   prune_ppm  = (files_total − files_read)·10⁶ div files_total,
    *   amp_ppm    = rows_scanned·10⁶ div rows_matched (null when 0) —
    *                read amplification, the cost of loose zones.
    *
    * A linear layout on x prunes x-slices and nothing else; a
    * space-filling-curve key ([[zValue]]/[[hilbertValue]]) trades a
    * little x-tightness for bounded zones on BOTH dimensions — this
    * audit is how you see that trade in numbers before rewriting 100 TB.
    *
    * Scale shape: per layout, one [[globalRowNumber]] pass (range
    * exchange + one long per partition on the driver — its documented
    * contract), one file-dimension zone aggregate (≤ nFiles rows), a
    * broadcast preds × zones overlap join on the MANIFEST (never data
    * rows), and ONE shared broadcast preds × data pass for the exact
    * match counts. `idCol` breaks sort ties so file assignment is
    * run-independent. */
  def pruningAudit(df: DataFrame, xCol: String, yCol: String,
      idCol: String, layouts: Seq[(String, Column)], preds: DataFrame,
      nFiles: Int): DataFrame = {
    require(nFiles >= 2, s"nFiles must be >= 2, got $nFiles")
    require(layouts.nonEmpty, "need at least one layout")
    require(layouts.map(_._1).distinct.size == layouts.size,
      s"duplicate layout names in ${layouts.map(_._1)}")
    val base = df.select(col(idCol).as("__id"),
      col(xCol).cast("long").as("__x"), col(yCol).cast("long").as("__y"))
    val p = broadcast(preds.select(col("pred_id").cast("long").as("pred_id"),
      col("x_lo").cast("long").as("x_lo"), col("x_hi").cast("long").as("x_hi"),
      col("y_lo").cast("long").as("y_lo"), col("y_hi").cast("long").as("y_hi")))
    // inner-join the data against the broadcast preds, then re-attach
    // zero-match preds from the preds side — a LEFT join from the tiny
    // side would force a nested-loop build over the DATA table.
    val hits = base.join(p,
        col("__x") >= col("x_lo") && col("__x") <= col("x_hi") &&
        col("__y") >= col("y_lo") && col("__y") <= col("y_hi"))
      .groupBy("pred_id").agg(count(lit(1)).as("rm"))
    val matched = p.select("pred_id").join(hits, Seq("pred_id"), "left")
      .select(col("pred_id"),
        coalesce(col("rm"), lit(0L)).as("rows_matched"))
    val n = base.count()
    require(n > 0, "pruningAudit over an empty table")
    val perLayout = layouts.map { case (name, key) =>
      val ranked = globalRowNumber(
        df.select(col(idCol).as("__id"), col(xCol).cast("long").as("__x"),
          col(yCol).cast("long").as("__y"), key.as("__k")),
        Seq("__k", "__id"), 0)
      val zones = ranked
        .withColumn("file", expr(s"(rn - 1) * $nFiles div ${n}L"))
        .groupBy("file")
        .agg(min("__x").as("xmn"), max("__x").as("xmx"),
          min("__y").as("ymn"), max("__y").as("ymx"),
          count(lit(1)).as("n_rows"))
      val filesTotal = zones.agg(count(lit(1)).as("files_total"))
      p.join(zones,
          col("xmx") >= col("x_lo") && col("xmn") <= col("x_hi") &&
          col("ymx") >= col("y_lo") && col("ymn") <= col("y_hi"), "left")
        .groupBy("pred_id")
        .agg(count(col("file")).as("files_read"),
          coalesce(sum("n_rows"), lit(0L)).as("rows_scanned"))
        .crossJoin(broadcast(filesTotal))
        .select(lit(name).as("layout"), col("pred_id"), col("files_total"),
          col("files_read"), col("rows_scanned"))
    }
    perLayout.reduce(_ unionByName _)
      .join(broadcast(matched), "pred_id")
      .select(col("layout"), col("pred_id"), col("files_total"),
        col("files_read"), col("rows_scanned"), col("rows_matched"),
        expr("CAST((files_total - files_read) * 1000000 div files_total" +
          " AS BIGINT)").as("prune_ppm"),
        when(col("rows_matched") === 0, lit(null).cast("long"))
          .otherwise(expr(
            "CAST(rows_scanned * 1000000 div rows_matched AS BIGINT)"))
          .as("amp_ppm"))
  }
}
