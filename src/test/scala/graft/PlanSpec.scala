package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape assertions: the properties that make queries survive a
  * 100× scale-up are checked against `executedPlan`, not just claimed —
  * filter pushdown, column pruning, broadcast of small dims, and
  * TakeOrderedAndProject instead of global sorts.
  */
class PlanSpec extends AnyFunSuite with SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  test("hamming64 evaluates correctly and stays inside whole-stage codegen") {
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    val df = Seq((0L, 0L), (0L, 7L), (-1L, 0L), (12345L, 54321L))
      .toDF("a", "b")
      .select(graft.functions.GraftFunctions.hamming64(col("a"), col("b")).as("d"))
    assert(df.as[Int].collect().toSeq == Seq(0, 3, 64, 5))
    // a local relation constant-folds, so assert the codegen span over a
    // parquet-backed scan: `*(n)` prefix = WholeStageCodegen
    val scan = spark.read.parquet(s"$dir/documents.parquet")
      .select(graft.functions.GraftFunctions
        .hamming64(xxhash64(col("text")), col("doc_id")).as("d"))
    val plan = scan.queryExecution.executedPlan.toString
    assert(plan.linesIterator.exists(l => l.contains("*(") && l.contains("Project")),
      s"hamming64 project not codegen'd:\n$plan")
  }

  test("q294 guard: skyline has no self-join — no cartesian/NLJ, the " +
      "frontier comes back as a broadcast hash join") {
    val df = SparkEntry.queries("q294_skyline")(spark, dir)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"skyline must not self-join all pairs:\n$plan")
    assert(plan.contains("BroadcastHashJoin"),
      s"frontier join should broadcast:\n$plan")
  }

  test("hilbert_index and soundex4 ride whole-stage codegen over a " +
      "parquet scan (no UDF, no eval fallback)") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val h = docs.select(graft.ops.Layout.hilbertValue(
      col("doc_id") % 1024, col("n_chars") % 1024, 10).as("h"))
    h.collect()
    val hp = h.queryExecution.executedPlan.toString
    assert(hp.linesIterator.exists(l => l.contains("*(") &&
      l.contains("Project")), s"hilbert not codegen'd:\n$hp")
    val s = docs.select(graft.ops.Dedup.soundex4(col("text")).as("c"))
    s.collect()
    val sp = s.queryExecution.executedPlan.toString
    assert(sp.linesIterator.exists(l => l.contains("*(") &&
      l.contains("Project")), s"soundex not codegen'd:\n$sp")
    assert(!sp.contains("BatchEvalPython") && !sp.contains("Invoke"),
      s"soundex must be native expressions:\n$sp")
  }

  test("q287 guard: the bootstrap's B-fold explode partial-aggregates " +
      "map-side — only B rows per partition cross the exchange") {
    // the op localCheckpoints the mean table, so assert on the hot
    // path itself (explode → hash filter → per-resample aggregate)
    val means = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id").cast("long").as("id"),
        col("n_chars").cast("long").as("v"))
      .withColumn("r", explode(sequence(lit(0), lit(199))))
      .filter(substring(md5(concat(col("id").cast("string"), lit(":"),
        col("r").cast("string")).cast("binary")), 1, 1) < "8")
      .groupBy("r")
      .agg(expr("CAST(sum(v) * 1000 div count(1) AS BIGINT)").as("m_u3"))
    means.collect()
    val plan = means.queryExecution.executedPlan.toString
    assert(plan.contains("partial_"),
      s"resample means must partial-aggregate before the shuffle:\n$plan")
    assert(plan.contains("Generate"),
      s"expected the resample explode:\n$plan")
  }

  test("md5SimHash48: identical texts coincide, unrelated texts spread, sig < 2^48") {
    import spark.implicits._
    val df = Seq((1L, "alpha beta gamma delta"), (2L, "alpha beta gamma delta"),
      (3L, "totally different words entirely unrelated text")).toDF("id", "text")
    val sigs = df.select(col("id"),
        graft.ops.Dedup.md5SimHash48Udf(col("text")).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sigs(1L) == sigs(2L))
    assert(sigs.values.forall(s => s >= 0L && s < (1L << 48)))
    assert(java.lang.Long.bitCount(sigs(1L) ^ sigs(3L)) > 6)
  }

  test("simHashRadiusPairs finds planted identical twins at distance 0") {
    import spark.implicits._
    val sigs = Seq((1L, 0xBEEFL), (2L, 0xBEEFL), (3L, 0x0001L))
      .toDF("id", "sig")
    val out = graft.ops.Dedup.simHashRadiusPairs(sigs, "id", "sig", maxDist = 0)
      .collect()
    assert(out.length == 1)
    assert(out.head.getLong(0) == 1L && out.head.getLong(1) == 2L &&
      out.head.getInt(2) == 0)
  }

  test("q02: filters reach the parquet scan; unused columns pruned") {
    val df = SparkEntry.queries("q02_filter_project")(spark, dir)
    df.collect()
    val scan = df.queryExecution.executedPlan.toString
      .linesIterator.find(_.contains("FileScan")).getOrElse("")
    assert(scan.contains("PushedFilters: ["), s"no pushed filters in: $scan")
    assert(scan.contains("IsNotNull") || scan.contains("GreaterThanOrEqual"),
      s"expected the n_chars/lang predicates pushed: $scan")
    // projection needs only 4 columns — the scan must not read `text`
    assert(scan.contains("ReadSchema") && !scan.contains("text:string"),
      s"text column should be pruned from the scan: $scan")
  }

  test("q356 guard: the postings-backed sparse branch never scans the " +
      "chunk index — no token explode, only the postings/stats tables") {
    graft.functions.GraftFunctions.register(spark)
    val base = SparkEntry.ensureHybridIndex(spark, dir)
    val index = spark.read.parquet(s"$base/chunks")
    val p = spark.read.parquet(s"$base/params").first()
    val tmp = java.nio.file.Files
      .createTempDirectory("graft_postings_plan").toString
    graft.index.IndexWriter.postings(index)
      .write.mode("overwrite").parquet(s"$tmp/postings")
    val postings = spark.read.parquet(s"$tmp/postings")
    val stats = spark.read.parquet(s"$base/stats")
    val out = graft.search.HybridSearch.bm25TopKPostings(postings, stats,
      p.getLong(0), p.getDouble(1), Seq("filter", "scan"), 25)
    assert(out.count() > 0)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("chunks"),
      s"postings path must not scan the chunk index:\n$plan")
    assert(!plan.contains("Generate"),
      s"postings path must not explode token arrays:\n$plan")
    // the term filter reaches the postings scan — at scale this is the
    // partition-pruning seam
    val scan = plan.linesIterator.filter(_.contains("FileScan"))
      .find(_.contains("postings")).getOrElse("")
    assert(scan.contains("PushedFilters: [") && scan.contains("In(term"),
      s"term predicate must push into the postings scan: $scan")
  }

  test("readPostingsForTerms: the term-bucket predicate prunes " +
      "partitions at plan time; the term filter pushes into the scan") {
    import spark.implicits._
    val base = java.nio.file.Files
      .createTempDirectory("graft_postings_prune").toString
    val pts = (0 until 200).map(i =>
        (s"d$i", Seq(s"term$i", s"term${i % 7}", "common")))
      .toDF("id", "tokens")
    graft.index.IndexWriter.postings(pts)
      .withColumn("term_bucket", pmod(xxhash64(col("term")), lit(64L)))
      .write.mode("overwrite").partitionBy("term_bucket")
      .parquet(s"$base/postings")
    val out = graft.index.IndexWriter.readPostingsForTerms(spark, base,
      Seq("term3", "term5"))
    val got = out.select("term", "id").as[(String, String)].collect()
    assert(got.nonEmpty && got.forall(r => r._1 == "term3" || r._1 == "term5"))
    val scan = out.queryExecution.executedPlan.toString
      .linesIterator.find(_.contains("FileScan")).getOrElse("")
    assert(scan.contains("term_bucket") &&
      (scan.contains("PartitionFilters: [") || scan.contains("partition")),
      s"bucket predicate must prune partitions: $scan")
    assert(scan.contains("In(term"),
      s"residual term filter must push into the scan: $scan")
    // the fixture genuinely spreads buckets, so the pruning is real
    val dirs = new java.io.File(s"$base/postings").listFiles()
      .count(_.getName.startsWith("term_bucket="))
    assert(dirs > 2, s"fixture must spread buckets, got $dirs")
  }

  test("readPositionsForTerms: the phrase path's positional read prunes " +
      "partitions by term bucket and pushes the term filter — the " +
      "served-phrase discipline, proven at the plan level") {
    import spark.implicits._
    val base = java.nio.file.Files
      .createTempDirectory("graft_positions_prune").toString
    val pts = (0 until 200).map(i =>
        (s"d$i", Seq(s"term$i", s"term${i % 7}", "common")))
      .toDF("id", "tokens")
    graft.index.IndexWriter.positionalPostings(pts)
      .withColumn("term_bucket", pmod(xxhash64(col("term")), lit(64L)))
      .write.mode("overwrite").partitionBy("term_bucket")
      .parquet(s"$base/positions")
    val out = graft.index.IndexWriter.readPositionsForTerms(spark, base,
      Seq("term3", "term5"))
    val got = out.select("term", "id").as[(String, String)].collect()
    assert(got.nonEmpty && got.forall(r => r._1 == "term3" || r._1 == "term5"))
    val scan = out.queryExecution.executedPlan.toString
      .linesIterator.find(_.contains("FileScan")).getOrElse("")
    assert(scan.contains("term_bucket") &&
      (scan.contains("PartitionFilters: [") || scan.contains("partition")),
      s"bucket predicate must prune partitions: $scan")
    assert(scan.contains("In(term"),
      s"residual term filter must push into the scan: $scan")
    val dirs = new java.io.File(s"$base/positions").listFiles()
      .count(_.getName.startsWith("term_bucket="))
    assert(dirs > 2, s"fixture must spread buckets, got $dirs")
  }

  test("q05: the nation dim joins via BroadcastHashJoin, not a shuffle") {
    val df = SparkEntry.queries("q05_star_join")(spark, dir)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast dim join:\n$plan")
  }

  test("q07: global top-k plans TakeOrderedAndProject, not a global Sort") {
    val df = SparkEntry.queries("q07_topk_orders")(spark, dir)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), s"expected top-k operator:\n$plan")
  }

  test("q31: no single-partition exchange before the top-20 limits") {
    val df = SparkEntry.queries("q31_rrf_fusion")(spark, dir)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    // the rank windows must consume TakeOrderedAndProject output (≤20
    // rows), never a SinglePartition exchange over the raw tables
    assert(plan.contains("TakeOrderedAndProject"),
      s"expected pre-limited rank inputs:\n$plan")
  }

  test("LSH verification join is pinned to shuffle-hash (never broadcast)") {
    import spark.implicits._
    // big-ish texts so a broadcast would actually carry shingle payloads
    val docs = (1 to 200).map(i =>
      (i.toLong, s"document $i about spark shuffles joins aggregates windows " +
        s"and the token ${i % 7} ${i % 13} repeated material for shingling"))
      .toDF("doc_id", "text")
    val out = graft.ops.Dedup.minHashNearDups(docs, jaccardThreshold = 0.5)
    out.collect()
    val plan = out.queryExecution.executedPlan.toString
    // both verification sides (sh1/sh2 arrays — the multi-TB payload at
    // scale) must arrive via ShuffledHashJoin; the planner would pick
    // broadcast from the tiny test sizes without the hint
    val shj = "ShuffledHashJoin".r.findAllIn(plan).size
    assert(shj >= 2, s"expected ≥2 shuffle-hash verification joins, got $shj:\n$plan")
  }

  test("exact dedup: the aggregation exchange is keyed on the 16-byte digest") {
    import spark.implicits._
    val docs = (1 to 100).map(i => (i.toLong, s"text payload ${i % 40}"))
      .toDF("doc_id", "text")
    val out = graft.ops.Dedup.exact(docs)
    out.collect()
    val plan = out.queryExecution.executedPlan.toString
    val lines = plan.split("\n").toSeq
    // the md5 digest grouping key shows as `_groupingexpression` (Catalyst
    // extracts the non-trivial key) — the exchange must be keyed on it
    val exIdx = lines.indexWhere(l =>
      l.contains("Exchange hashpartitioning(_groupingexpression") ||
      l.contains("Exchange hashpartitioning(__digest"))
    assert(exIdx >= 0, s"expected a digest-keyed exchange:\n$plan")
    // map-side partial min collapses per-partition duplicates BEFORE the
    // shuffle, so the exchange carries only (digest, id) pairs
    assert(lines.drop(exIdx).exists(_.contains("partial_min")),
      s"expected partial_min below the digest exchange:\n$plan")
    assert(plan.contains("LeftSemi"), s"expected left-semi keeper join:\n$plan")
  }

  test("q70 guard: hamming64 verify sits above the join, below the distinct") {
    // regression guard for the verify-before-distinct plan shape: the
    // codegen'd radius predicate must prune candidates BEFORE the
    // distinct's exchange (a refactor that filters after the distinct
    // would shuffle every banding candidate at 100 TB)
    val df = SparkEntry.queries("q70_simhash_radius")(spark, dir)
    val lines = df.queryExecution.executedPlan.toString.split("\n").toSeq
    val aggIdx = lines.indexWhere(_.contains("HashAggregate"))
    // the verify predicate either sits as a Filter on the join output or
    // (better) is fused INTO the join condition — both run pre-distinct
    val verifyIdx = lines.indexWhere(l =>
      l.contains("hamming64(") && (l.contains("Filter") || l.contains("Join")))
    assert(aggIdx >= 0 && verifyIdx >= 0,
      s"distinct + hamming64 verify both expected:\n${lines.mkString("\n")}")
    assert(aggIdx < verifyIdx,
      "distinct must consume VERIFIED pairs — the radius predicate may " +
        "never migrate above the distinct's exchange")
  }

  test("q35/q54 guard: no aux oracle writes when auxEnabled=false (the bench path)") {
    // regression guard: aux tables are Verify-only; a refactor that
    // writes them unconditionally re-adds coalesce(1) write jobs to
    // every bench run of the hybrid queries
    assert(!SparkEntry.auxEnabled, "bench/test default must be aux-off")
    val auxDir = new java.io.File(SparkEntry.auxPath(dir))
    def wipe(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(wipe)
      f.delete()
    }
    wipe(auxDir)
    SparkEntry.queries("q35_hybrid_search")(spark, dir).collect()
    SparkEntry.queries("q54_hybrid_prebuilt")(spark, dir).collect()
    assert(!auxDir.exists(), "hybrid queries must not write aux tables when disabled")
  }

  test("q72 + q57 guard: TopKPerKeyExec over the parquet scan, no WindowExec") {
    for (q <- Seq("q72_topk_per_key", "q57_domain_cap")) {
      val df = SparkEntry.queries(q)(spark, dir)
      df.collect()
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("TopKPerKey"), s"$q must use the custom exec:\n$plan")
      assert(!plan.contains("Window"), s"$q must not fall back to WindowExec:\n$plan")
    }
  }

  test("q01: aggregation runs with map-side partial aggregates") {
    val df = SparkEntry.queries("q01_pricing_agg")(spark, dir)
    df.collect()
    val agg = df.queryExecution.executedPlan.toString
      .linesIterator.filter(_.contains("HashAggregate")).toSeq
    assert(agg.exists(_.contains("partial")),
      s"expected partial_ aggregate before the exchange:\n${agg.mkString("\n")}")
  }

  test("q92 guard: per-domain thresholds broadcast; the corpus side never sort-merges") {
    val dom = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), (col("doc_id") % 7).cast("string").as("dom"))
    val plan = graft.ops.Sampling.temperatureSample(dom, "dom", "doc_id", 0.5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"threshold lookup must broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"corpus must not shuffle for the rate lookup:\n$plan")
  }

  test("q96 guard: changelog apply never windows or sorts the snapshot") {
    val d = spark.read.parquet(s"$dir/documents.parquet").select("doc_id", "text")
    val ch = d.filter(col("doc_id") % 3 === 0)
      .select(col("doc_id"), lit(1L).as("seq"), lit("U").as("op"), col("text"))
    val plan = graft.index.IndexWriter.applyChangelog(d, ch, "doc_id", "seq", "op")
      .queryExecution.executedPlan.toString
    assert(plan.contains("LeftAnti"), s"superseded rows strip via anti-join:\n$plan")
    assert(!plan.contains("Window"),
      s"latest-wins must be an aggregate argmax, not a window sort:\n$plan")
  }

  test("q95 guard: classifier inference is exchange-free whole-stage codegen") {
    val plan = graft.ops.Curation.linearQualityFilter(
        spark.read.parquet(s"$dir/documents.parquet").select("doc_id", "text"),
        "doc_id", "text",
        graft.ops.Curation.QualityWeights(2, 1, -50, -10, -500), 0)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"no shuffle for per-row scoring:\n$plan")
    assert(plan.linesIterator.exists(l => l.contains("*(") && l.contains("Filter")),
      s"the logit filter must run inside whole-stage codegen:\n$plan")
  }

  test("q127 guard: dim filters pushed, customer broadcasts, top-10 is TakeOrdered") {
    val df = SparkEntry.queries("q127_shipping_priority")(spark, dir)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"top-10 must never be a global sort:\n$plan")
    assert(plan.contains("BroadcastHashJoin"),
      s"the filtered customer dim must broadcast:\n$plan")
    val scans = plan.linesIterator.filter(_.contains("FileScan")).toSeq
    assert(scans.exists(s => s.contains("customer") && s.contains("EqualTo")),
      s"segment filter must reach the customer scan:\n${scans.mkString("\n")}")
    assert(scans.exists(s => s.contains("lineitem") && s.contains("GreaterThan")),
      s"shipdate filter must reach the lineitem scan:\n${scans.mkString("\n")}")
  }

  test("q120 guard: triangle join is equi-hash, never a nested-loop product") {
    val df = SparkEntry.queries("q120_triangle_count")(spark, dir)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"triangle counting must stay on equi-joins:\n$plan")
  }

  test("q157 guard: repeated-span discovery stays on equi-joins, gram-keyed") {
    val df = SparkEntry.queries("q157_substring_spans")(spark, dir)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"span discovery must never plan a product:\n$plan")
    // the repeated-gram filter reaches the doc side as a semi-join
    assert(plan.contains("LeftSemi"),
      s"repeated grams must prune positions via a semi-join:\n$plan")
  }

  test("q133 guard: bucketed fact join reads bucketed scans with no exchange") {
    val df = SparkEntry.queries("q133_bucketed_join")(spark, dir)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), s"merge hint must hold:\n$plan")
    // THE scale property: both fact sides ride the on-disk hash layout —
    // zero shuffle. (Bucket-LOCAL sorts remain: Spark only trusts sortBy
    // ordering with one file per bucket under the legacy scan-ordering
    // flag; those sorts are bucket-sized and shuffle nothing.)
    assert(!plan.contains("Exchange hashpartitioning"),
      s"co-bucketed join must not shuffle either side:\n$plan")
    assert(plan.contains("Bucketed: true"),
      s"scans must report the bucketed layout:\n$plan")
  }

  test("q124 guard: zValue is a native expression inside codegen, not a UDF") {
    val df = SparkEntry.queries("q124_zorder")(spark, dir)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("UDF"), s"Morton code must not evaluate as a UDF:\n$plan")
    assert(plan.linesIterator.exists(l =>
      l.contains("*(") && l.contains("morton_interleave")),
      s"morton_interleave must sit inside a whole-stage-codegen span:\n$plan")
  }

  test("q122 guard: the CM sketch broadcasts into the estimate join") {
    val df = SparkEntry.queries("q122_countmin")(spark, dir)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"the bounded depth x width sketch must broadcast:\n$plan")
  }

  test("q165 guard: trigram extraction never windows; count tables join" +
      " without a corpus-side sort") {
    val df = SparkEntry.queries("q165_backoff_lm")(spark, dir)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    // the per-row array transform replaces the lag/lead window a naive
    // formulation would shuffle the whole corpus through
    assert(!plan.contains("Window"),
      s"trigram extraction must not use a window:\n$plan")
    // N+V is a driver-side literal, so every scoring join is an equi-join
    assert(!plan.contains("CartesianProduct"),
      s"scoring joins must stay equi-joins:\n$plan")
  }

  test("q166 guard: adaptive filtered ANN broadcasts the cell dimension;" +
      " top-k is TakeOrdered, not a global sort") {
    val df = SparkEntry.queries("q166_ann_filtered")(spark, dir)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"k winners must come from per-partition top-k, not Sort+Limit:\n$plan")
    assert(plan.contains("BroadcastHashJoin") ||
      plan.contains("BroadcastNestedLoopJoin"),
      s"probe ranking and cutoff (<= nCentroids rows) must broadcast:\n$plan")
  }

  test("q172 guard: prefix-filter join stays on equi-joins; the rank" +
      " window partitions per doc, never globally") {
    val df = SparkEntry.queries("q172_prefix_filter_join")(spark, dir)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"candidate + verify joins must be equi-joins:\n$plan")
    // every Window in the plan must be keyed by the doc id — a global
    // (unpartitioned) rarity rank would serialize the shingle dimension.
    // windowspecdefinition renders partition columns FIRST, so a
    // per-doc window reads windowspecdefinition(id#...; an unpartitioned
    // one would open with the order spec instead.
    val windows = plan.linesIterator.filter(_.contains("Window")).toSeq
    assert(windows.nonEmpty &&
      windows.forall(_.contains("windowspecdefinition(id#")),
      s"rank windows must be per-doc partitioned:\n${windows.mkString("\n")}")
  }

  test("q164 guard: MMR candidate scan is TakeOrdered over a codegen" +
      " cosine project") {
    graft.functions.GraftFunctions.register(spark)
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val qv = emb.filter(col("vec_id") === 0)
      .select(col("embedding")).head.getSeq[Float](0).toArray
    import graft.functions.GraftFunctions.vecCosine
    import org.apache.spark.sql.functions.typedlit
    val cand = emb
      .withColumn("rel", round(vecCosine(col("embedding"), typedlit(qv)), 6))
      .orderBy(desc("rel"), col("vec_id")).limit(50)
    val plan = cand.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"candidate selection must be per-partition top-k:\n$plan")
  }

  test("q191 guard: the KMV sketch is TakeOrdered over a hash-distinct " +
      "of hashes, never a global sort of values") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val plan = graft.ops.Profile.kmvSketch(
        docs.select(col("text").as("v")), "v", 128)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"k smallest must be per-partition top-k, not Sort+Limit:\n$plan")
    assert(plan.contains("HashAggregate"),
      s"distinct must be a hash aggregate (map-side partial):\n$plan")
    assert(!plan.contains("Exchange rangepartitioning"),
      s"no global range sort anywhere:\n$plan")
  }

  test("q195 guard: range-shard assignment is one exchange-free codegen " +
      "pass over a literal cuts array") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val asg = graft.ops.Layout.assignRangeShards(docs, "n_chars",
      Array(100.0, 500.0, 2000.0))
    val plan = asg.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"assignment must not shuffle:\n$plan")
    assert(plan.linesIterator.exists(l => l.contains("*(") && l.contains("Project")),
      s"the cuts fold must stay inside whole-stage codegen:\n$plan")
  }

  test("q196 guard: video near-dup joins band values equi-hash, never a " +
      "nested-loop product; only sig triples cross") {
    import spark.implicits._
    val vids = Seq(
      (1L, graft.ops.Multimodal.renderTestVideo(1L, 3)),
      (2L, graft.ops.Multimodal.renderTestVideo(1L, 3, junkPrefix = 1)),
      (3L, graft.ops.Multimodal.renderTestVideo(2L, 3)))
      .toDF("vid_id", "content")
    val plan = graft.ops.Multimodal.videoNearDupPairs(vids, "vid_id",
        "content").queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"banded join must be equi-hash:\n$plan")
    // the exchanges carry (id, frame_idx, sig, band) — never video bytes
    val exchanges = plan.linesIterator.filter(_.contains("Exchange")).toSeq
    assert(exchanges.nonEmpty && exchanges.forall(!_.contains("content")),
      s"video bytes must not ride an exchange:\n${exchanges.mkString("\n")}")
  }
}
