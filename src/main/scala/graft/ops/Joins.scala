package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal / interval join operators Spark's built-ins don't provide
  * directly — composed from existing ops (the SURVEY's preference order:
  * compose before custom plans), with shuffle profiles that survive
  * scale.
  */
object Joins {

  /** 2-D skyline (Pareto frontier; Börzsönyi et al. ICDE 2001) — the
    * classic multi-criteria operator: keep every row no other row
    * DOMINATES (≥ on both dims, > on at least one). "Best tradeoffs"
    * for maximize-both objectives — quality vs length doc selection,
    * activity vs value account triage — where any single score would
    * bury one axis. Exact window formulation, no self-join: reduce to
    * the a-VALUE dimension (max b per a), take the running max of b
    * over STRICTLY larger a; a row survives iff its b beats that
    * running max AND ties the best b at its own a (an equal-b twin at
    * the same a survives too — equals don't dominate).
    *
    * Scale shape: one (a)-dimension aggregate, one a-value-dimension
    * cumulative window (value-domain bounded, the q267 rule), one
    * broadcast-sized frontier join back. Nulls in either dim are
    * excluded (no dominance order). Returns the surviving rows
    * (id, a, b). */
  def skyline2d(df: DataFrame, idCol: String, aCol: String,
      bCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = df.select(col(idCol).as("id"),
        col(aCol).cast("long").as("a"), col(bCol).cast("long").as("b"))
      .filter(col("a").isNotNull && col("b").isNotNull)
    val perA = base.groupBy("a").agg(max("b").as("bmax"))
    val wPrev = Window.orderBy(desc("a"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val frontier = perA
      .withColumn("bprev", max("bmax").over(wPrev))
      .filter(col("bprev").isNull || col("bmax") > col("bprev"))
      .select(col("a"), col("bmax"))
    base.join(broadcast(frontier), Seq("a"))
      .filter(col("b") === col("bmax"))
      .select("id", "a", "b")
  }

  /** As-of join: for every left row, attach the latest right row with
    * `right.time <= left.time` for the same key (inclusive; left rows
    * before any right row get nulls — ASOF LEFT semantics).
    *
    * Formulation: union both sides tagged, one window pass per key in
    * time order, `last(_, ignoreNulls)` carries the most recent right
    * values forward. ONE shuffle on the key — no broadcast, no
    * per-row subquery, no range cross-product — so it scales to both
    * sides being large (the classic union+LOCF trick from time-series
    * engines).
    *
    * Right-side (key, time) pairs must be unique for deterministic
    * output — pre-aggregate duplicates away (the caller decides how).
    *
    * @param rightCols right columns to carry (renamed as given)
    */
  def asofJoin(left: DataFrame, right: DataFrame, keyCol: String,
      timeCol: String, rightCols: Seq[(String, String)]): DataFrame = {
    val leftExtra = left.columns.filterNot(c => c == keyCol || c == timeCol).toSeq
    val leftTagged = left
      .withColumn("__side", lit(1))
      .select(Seq(col(keyCol), col(timeCol), col("__side")) ++
        leftExtra.map(col) ++
        rightCols.map { case (in, out) =>
          lit(null).cast(right.schema(in).dataType).as(s"__r_$out") }: _*)
    val rightTagged = right
      .withColumn("__side", lit(0))
      .select(Seq(col(keyCol), col(timeCol), col("__side")) ++
        leftExtra.map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        rightCols.map { case (in, out) => col(in).as(s"__r_$out") }: _*)
    // right rows sort BEFORE left rows at equal time (side 0 < 1), so a
    // right row stamped exactly at left.time is visible — inclusive asof
    val w = Window.partitionBy(keyCol).orderBy(col(timeCol), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = rightCols.foldLeft(leftTagged.unionByName(rightTagged)) {
      case (df, (_, out)) =>
        df.withColumn(s"__asof_$out", last(col(s"__r_$out"), ignoreNulls = true).over(w))
    }
    carried
      .filter(col("__side") === 1)
      .select(Seq(col(keyCol), col(timeCol)) ++
        leftExtra.map(col) ++
        rightCols.map { case (_, out) => col(s"__asof_$out").as(out) }: _*)
  }

  /** Range (interval containment) join: match each fact row to the dim
    * intervals containing its value, `lo <= value < hi`.
    *
    * A naive theta-join is a cross-product at scale. Here every dim
    * interval explodes into the fixed-width bins it covers and the join
    * is an equi-join on the fact value's bin — each (fact, interval)
    * match is found in exactly one bin, so no dedup pass is needed; the
    * exact predicate then trims partial-bin overlap. Shuffle carries
    * (bin, keys), and bin width trades dim replication against bucket
    * width, exactly like LSH banding.
    */
  def rangeJoin(fact: DataFrame, dim: DataFrame, valueCol: String,
      loCol: String, hiCol: String, binSize: Double): DataFrame = {
    require(binSize > 0, "binSize must be positive")
    val factBinned = fact.withColumn("__bin",
      floor(col(valueCol) / binSize).cast("long"))
    val dimBinned = dim
      .withColumn("__bin", explode(sequence(
        floor(col(loCol) / binSize).cast("long"),
        // hi is exclusive: an interval ending exactly on a bin edge does
        // not cover that bin
        floor((col(hiCol) - lit(1e-9)) / binSize).cast("long"))))
    factBinned.join(dimBinned, "__bin")
      .filter(col(valueCol) >= col(loCol) && col(valueCol) < col(hiCol))
      .drop("__bin")
  }

  /** Bloom-filtered join: build a Bloom filter over the (selective) build
    * side's keys and pre-filter the probe side with it BEFORE the shuffle,
    * then run the exact join to discard the false positives.
    *
    * This is the runtime-filter pattern (Spark's own
    * `spark.sql.optimizer.runtime.bloomFilter` applies it when statistics
    * let it): at 100 TB the win is that probe rows failing the filter are
    * dropped at the scan — they never enter the exchange — so a 1%-selective
    * dim cuts the probe shuffle ~100×. The final join makes the result
    * EXACTLY equal to the plain join, whatever the filter's fpp; the
    * filter only sheds work, never changes semantics.
    *
    * The build-side key set must be driver-collectable (it is the small,
    * filtered dim by assumption — same regime as a broadcast join, and the
    * filter is ~9.6 bits/key at 1% fpp, far smaller than the rows).
    */
  def bloomFilteredJoin(probe: DataFrame, build: DataFrame,
      probeKey: String, buildKey: String,
      expectedKeys: Long, fpp: Double = 0.01): DataFrame = {
    // Key-type agnostic: both sides are inserted/probed through their
    // canonical string form, so long/int/string keys all work (the
    // filter only sheds rows — the exact join below restores equality
    // semantics on the original typed columns regardless).
    val bf = build.select(col(buildKey).cast("string").as("__k"))
      .stat.bloomFilter("__k", expectedKeys, fpp)
    val might = udf((k: String) => k != null && bf.mightContainString(k))
    probe.filter(might(col(probeKey).cast("string")))
      .join(build, col(probeKey) === col(buildKey))
  }

  /** Idempotently materialize `df` as a bucketed + sorted catalog table
    * — the pre-partitioning that makes every later equi-join on
    * `key` between co-bucketed tables plan with NO exchange and NO sort
    * on either side (large-large fact joins, the case broadcast can't
    * cover at 100 TB: both sides land pre-hashed on disk once, every
    * downstream join rides the layout for free). Skips the write when
    * the table already exists in this session's catalog, so repeated
    * query runs pay only the join. */
  def ensureBucketedTable(df: DataFrame, table: String, key: String,
      buckets: Int = 8, fingerprint: String = ""): Unit = {
    require(buckets >= 1, "buckets must be positive")
    val spark = df.sparkSession
    val wh = spark.conf.get("spark.sql.warehouse.dir")
    val loc = new java.io.File(
      wh.stripPrefix("file:"), table.toLowerCase(java.util.Locale.ROOT))
    // Ownership marker: only directories WE wrote carry it, so a stale
    // path that belongs to someone else is never deleted (underscore
    // prefix → invisible to Spark's file listing, like _SUCCESS).
    val marker = new java.io.File(loc, "_graft_bucketed")
    def markerText: Option[String] =
      if (marker.isFile)
        Some(new String(java.nio.file.Files.readAllBytes(marker.toPath),
          java.nio.charset.StandardCharsets.UTF_8))
      else None
    val upToDate = spark.catalog.tableExists(table) &&
      (fingerprint.isEmpty || markerText.contains(fingerprint))
    if (!upToDate) {
      if (!spark.catalog.tableExists(table)) {
        // The in-memory catalog dies with the session but the managed
        // location survives — and CTAS refuses a location it doesn't
        // own. An orphan dir from an earlier graft session carries the
        // marker — clear and rewrite. Pre-marker graft revisions left
        // marker-LESS orphans, recognizable because CTAS output contains
        // only Spark-written files (part-*, _SUCCESS, checksums): those
        // migrate (delete + rewrite) too. Anything else is not ours —
        // refuse rather than destroy concurrent-session data.
        if (loc.exists() && markerText.isEmpty && !looksLikeSparkOutput(loc))
          throw new IllegalStateException(
            s"ensureBucketedTable: $loc exists but was not written by " +
              "graft (no _graft_bucketed marker, non-Spark files inside); " +
              "refusing to delete. Choose a different table name or " +
              "remove the directory.")
        deleteRecursively(loc)
      }
      df.write.mode("overwrite")
        .bucketBy(buckets, key).sortBy(key)
        .format("parquet").saveAsTable(table)
      // Marker written AFTER the table (overwrite clears the dir);
      // records the source fingerprint so a regenerated source within
      // one session triggers a rebuild instead of stale reads.
      java.nio.file.Files.write(marker.toPath,
        fingerprint.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      ()
    }
  }

  /** Recursive delete (shared by [[ensureBucketedTable]] and index
    * fixture setup — one definition so delete semantics stay uniform). */
  private[graft] def deleteRecursively(f: java.io.File): Unit = {
    if (f.isDirectory)
      Option(f.listFiles()).foreach(_.foreach(deleteRecursively))
    f.delete(); ()
  }

  /** True when every regular file under `dir` is a Spark/Hadoop output
    * artifact (part files, _SUCCESS, checksums, temporary dirs) — the
    * shape a CTAS leaves behind, used to recognize pre-marker graft
    * orphans that are safe to migrate. */
  private def looksLikeSparkOutput(dir: java.io.File): Boolean = {
    def ok(f: java.io.File): Boolean =
      if (f.isDirectory)
        f.getName == "_temporary" ||
          Option(f.listFiles()).forall(_.forall(ok))
      else {
        val n = f.getName
        n.startsWith("part-") || n == "_SUCCESS" || n.endsWith(".crc") ||
          n.startsWith("._") || n.startsWith(".part-")
      }
    dir.isDirectory && Option(dir.listFiles()).forall(_.forall(ok))
  }

  /** Cheap source-data fingerprint for [[ensureBucketedTable]]: an
    * order-independent hash of (name, length, mtime) for every file
    * under the given paths. Regenerating the source parquet changes the
    * mtime/length → the fingerprint → the bucketed table rebuilds. */
  def dataFingerprint(paths: String*): String = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory)
        Option(f.listFiles()).map(_.toSeq.flatMap(walk)).getOrElse(Nil)
      else if (f.isFile) Seq(f) else Nil
    val parts = paths.flatMap(p => walk(new java.io.File(p)))
      .map(f => s"${f.getName}:${f.length}:${f.lastModified}")
      .sorted
    java.security.MessageDigest.getInstance("MD5")
      .digest(parts.mkString("\n").getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
  }

  /** Selinger dynamic-programming join ordering (Selinger et al.
    * SIGMOD'79) with the System-R cardinality model and the C_out cost
    * metric — the planning pass behind every optimizer this library's
    * queries lean on, surfaced as a queryable table. Per equi-join
    * edge, |A ⋈ B| = |A|·|B| / max(ndv_A(k), ndv_B(k)); a subset's
    * estimated size is the row product over its members divided by
    * each internal edge's max-NDV, evaluated in a FIXED order (members
    * by index, then edges by list position, truncating each division)
    * so every engine derives the identical integer; cost(S) =
    * size(S) + min over removable leaves r of cost(S − r), with
    * singletons free — the left-deep DP. Cross joins are never
    * enumerated: only connected subsets appear, and r must join to
    * S − r by at least one edge.
    *
    * Stats gathering is one count + one multi-NDV aggregate per
    * relation (exact `count_distinct` — the estimates must be
    * reproducible, not sampled); the DP itself runs on the ≤ 2⁶-node
    * subset lattice driver-side by contract (the [[Layout
    * .viewLatticeGreedy]] bounded-read discipline). Intermediates are
    * BigInt-exact; outputs cap at Long.MaxValue (the oracle mirrors
    * with HUGEINT + LEAST).
    *
    * @param rels  (name, table) per relation, ≤ 6
    * @param edges (idxA, keyColA, idxB, keyColB) equi-join edges
    * @return one row per connected subset of size ≥ 2: (mask, rels,
    *         size_est, best_cost, best_last) — best_last = the
    *         relation the optimal plan joins LAST (ties: lower cost,
    *         then lower index), which reconstructs the whole tree */
  def selingerJoinOrder(rels: Seq[(String, DataFrame)],
      edges: Seq[(Int, String, Int, String)]): DataFrame = {
    require(rels.size >= 2 && rels.size <= 6,
      s"rels must have 2..6 relations, got ${rels.size}")
    require(edges.nonEmpty, "need at least one join edge")
    edges.foreach { case (a, _, b, _) =>
      require(a >= 0 && a < rels.size && b >= 0 && b < rels.size &&
        a != b, s"bad edge endpoint in $edges")
    }
    val spark = rels.head._2.sparkSession
    import spark.implicits._
    val n = rels.size
    val rows: Seq[Long] = rels.map(_._2.count())
    // one aggregate per relation for all its edge-key NDVs
    val ndvCols: Map[Int, Seq[String]] = (edges.map(e => e._1 -> e._2)
      ++ edges.map(e => e._3 -> e._4))
      .groupBy(_._1).view.mapValues(_.map(_._2).distinct).toMap
    val ndv: Map[(Int, String), Long] = ndvCols.flatMap {
      case (i, cols) =>
        val r = rels(i)._2
          .agg(countDistinct(col(cols.head)).as("c0"),
            cols.tail.zipWithIndex.map { case (c, j) =>
              countDistinct(col(c)).as(s"c${j + 1}") }: _*)
          .head()
        cols.zipWithIndex.map { case (c, j) => (i, c) -> r.getLong(j) }
    }
    val edgeNdv: Seq[(Int, Int, Long)] = edges.map { case (a, ka, b, kb) =>
      (a, b, math.max(ndv((a, ka)), ndv((b, kb))))
    }
    val maxL = BigInt(Long.MaxValue)
    def size(mask: Int): BigInt = {
      var s = (0 until n).filter(i => (mask & (1 << i)) != 0)
        .map(i => BigInt(rows(i))).product
      edgeNdv.foreach { case (a, b, d) =>
        if ((mask & (1 << a)) != 0 && (mask & (1 << b)) != 0 && d > 0)
          s = s / d
      }
      s
    }
    def connected(mask: Int): Boolean = {
      if (mask == 0) return false
      val first = Integer.numberOfTrailingZeros(mask)
      var reach = 1 << first
      var grew = true
      while (grew) {
        grew = false
        edgeNdv.foreach { case (a, b, _) =>
          val ab = (1 << a) | (1 << b)
          if ((ab & mask) == ab &&
              ((reach & ab) != 0) && ((reach & ab) != ab)) {
            reach |= ab; grew = true
          }
        }
      }
      reach == mask
    }
    def joins(r: Int, rest: Int): Boolean = edgeNdv.exists { case (a, b, _) =>
      (a == r && (rest & (1 << b)) != 0) || (b == r && (rest & (1 << a)) != 0)
    }
    val full = (1 << n) - 1
    val cost = scala.collection.mutable.Map[Int, BigInt]()
    val last = scala.collection.mutable.Map[Int, Int]()
    (0 until n).foreach(i => cost(1 << i) = BigInt(0))
    val out = scala.collection.mutable.ArrayBuffer
      .empty[(Long, String, Long, Long, String)]
    for (sz <- 2 to n; mask <- 1 to full
         if Integer.bitCount(mask) == sz && connected(mask)) {
      val szEst = size(mask)
      val (bestR, bestC) = (0 until n)
        .filter(r => (mask & (1 << r)) != 0)
        .flatMap { r =>
          val rest = mask ^ (1 << r)
          if (connected(rest) && joins(r, rest) && cost.contains(rest))
            Some(r -> (cost(rest) + szEst))
          else None
        }
        .minBy { case (r, c) => (c, r) }
      cost(mask) = bestC
      last(mask) = bestR
      val names = (0 until n).filter(i => (mask & (1 << i)) != 0)
        .map(rels(_)._1).mkString(",")
      out += ((mask.toLong, names, szEst.min(maxL).toLong,
        bestC.min(maxL).toLong, rels(bestR)._1))
    }
    spark.createDataFrame(out.toSeq)
      .toDF("mask", "rels", "size_est", "best_cost", "best_last")
  }
}
