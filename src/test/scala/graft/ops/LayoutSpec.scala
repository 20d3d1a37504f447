package graft.ops

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class LayoutSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("interleaveBits: known Morton codes") {
    assert(Layout.interleaveBits(0L, 0L, 21) == 0L)
    assert(Layout.interleaveBits(1L, 0L, 21) == 1L)   // a bit 0 → z bit 0
    assert(Layout.interleaveBits(0L, 1L, 21) == 2L)   // b bit 0 → z bit 1
    assert(Layout.interleaveBits(3L, 3L, 21) == 15L)  // 11 ⋈ 11 = 1111
    assert(Layout.interleaveBits(5L, 0L, 21) == 17L)  // 101 spread to 10001
  }

  test("zorderWrite: every file spans a bounded rectangle in BOTH dims") {
    val path = Files.createTempDirectory("graft_zorder").toString + "/t"
    // 100×100 grid: a linear sort on x would give each file the FULL y
    // range; z-order must bound both spans
    val grid = spark.range(10000)
      .select((col("id") % 100).as("x"),
        floor(col("id") / 100).cast("long").as("y"))
    Layout.zorderWrite(grid, "x", "y", path, files = 16, bits = 8)

    val spans = spark.read.parquet(path)
      .groupBy(input_file_name().as("f"))
      .agg((max("x") - min("x")).as("xs"), (max("y") - min("y")).as("ys"),
        count(lit(1)).as("n"))
      .collect()
    assert(spans.map(_.getAs[Long]("n")).sum == 10000L, "no rows lost")
    assert(spans.length > 8, s"range partitioner must actually split: ${spans.length}")
    val xAvg = spans.map(_.getAs[Long]("xs")).sum.toDouble / spans.length
    val yAvg = spans.map(_.getAs[Long]("ys")).sum.toDouble / spans.length
    assert(xAvg < 60.0, s"x span per file must be a fraction of the domain: $xAvg")
    assert(yAvg < 60.0, s"y span per file must be a fraction of the domain: $yAvg")
    // contrast: the same data sorted only by x leaves y unpruned everywhere
    val linPath = Files.createTempDirectory("graft_linear").toString + "/t"
    grid.repartitionByRange(16, col("x")).sortWithinPartitions("x")
      .write.parquet(linPath)
    val yLin = spark.read.parquet(linPath)
      .groupBy(input_file_name()).agg((max("y") - min("y")).as("ys"))
      .collect().map(_.getAs[Long]("ys"))
    assert(yLin.forall(_ == 99L), "linear layout: every file spans all of y")
  }

  test("globalRowNumber equals the naive global window, without its plan") {
    import org.apache.spark.sql.expressions.Window
    val df = spark.range(5000).select((col("id") * 7 % 5000).as("k"))
      .distinct() // unique, scrambled order key
    val got = Layout.globalRowNumber(df, "k", partitions = 8)
    val naive = df.withColumn("rn", row_number().over(Window.orderBy("k")))
    assert(got.select("k", "rn").except(naive.select("k", "rn")).isEmpty &&
      naive.select("k", "rn").except(got.select("k", "rn")).isEmpty,
      "must equal ROW_NUMBER() OVER (ORDER BY k) exactly")
    // the point of the op: no stage funnels the table through ONE partition
    val plan = got.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange SinglePartition"),
      s"global numbering must stay distributed:\n${plan.take(600)}")
    assert(naive.queryExecution.executedPlan.toString.contains("Exchange SinglePartition"),
      "sanity: the naive window DOES funnel (else this test proves nothing)")
  }

  test("property: interleaveBits is a bijection (deinterleave recovers both inputs)") {
    def extract(z: Long, phase: Int, bits: Int): Long = {
      var v = 0L
      var i = 0
      while (i < bits) { v |= ((z >> (2 * i + phase)) & 1L) << i; i += 1 }
      v
    }
    val rnd = new scala.util.Random(42)
    val mask = (1L << 21) - 1
    (1 to 500).foreach { _ =>
      val a = rnd.nextLong() & mask
      val b = rnd.nextLong() & mask
      val z = Layout.interleaveBits(a, b, 21)
      assert(extract(z, 0, 21) == a, s"a not recoverable from z for ($a, $b)")
      assert(extract(z, 1, 21) == b, s"b not recoverable from z for ($a, $b)")
      assert(z >= 0, "42 interleaved bits stay positive")
    }
  }

  test("zValue rejects negative input loudly, propagates null (never coerces to 0)") {
    val ex = intercept[Exception] {
      Seq((-1L, 2L)).toDF("a", "b")
        .select(Layout.zValue(col("a"), col("b"))).collect()
    }
    assert(ex.getMessage != null)
    val out = Seq((Some(1L), Some(2L)), (None, Some(2L)), (Some(1L), None))
      .toDF("a", "b")
      .select(Layout.zValue(col("a"), col("b")).as("z"))
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getLong(0)))
    assert(out(0).contains(9L) && out(1).isEmpty && out(2).isEmpty,
      s"null input must yield null z, not the origin: ${out.toSeq}")
  }

  test("fileStats manifest: per-file bounds; candidateFiles prunes disjoint files") {
    val dir = java.nio.file.Files.createTempDirectory("fstats").toString
    // range-partitioned write -> files with disjoint id ranges
    spark.range(1000).toDF("id").withColumn("v", col("id") * 2)
      .repartitionByRange(4, col("id"))
      .write.mode("overwrite").parquet(dir)
    val stats = Layout.fileStats(spark, dir, Seq("id", "v"))
    val rows = stats.collect()
    assert(rows.length >= 2, "expect multiple files")
    assert(rows.map(_.getAs[Long]("n_rows")).sum == 1000L)
    // bounds are consistent per file
    rows.foreach { r =>
      assert(r.getAs[Long]("id_min") <= r.getAs[Long]("id_max"))
      assert(r.getAs[Long]("v_min") == r.getAs[Long]("id_min") * 2)
    }
    // a narrow predicate prunes to fewer files than the table holds
    val cand = Layout.candidateFiles(stats, "id", 10, 20).collect()
    assert(cand.length < rows.length, "disjoint files must be pruned")
    assert(cand.nonEmpty, "the covering file must survive")
  }

  test("globalPrefixSum equals the naive single-partition window, distributed") {
    import org.apache.spark.sql.expressions.Window
    val df = (1L to 500L).map(i => (i, i % 7 + 1)).toDF("id", "w")
    val got = Layout.globalPrefixSum(df, Seq("id"), "w", partitions = 8)
      .select("id", "cum_w").as[(Long, Long)].collect().toMap
    val naive = df.withColumn("cum", sum("w").over(
        Window.orderBy("id").rowsBetween(Window.unboundedPreceding, 0)))
      .select("id", "cum").as[(Long, Long)].collect().toMap
    assert(got == naive, "two-pass prefix sum must equal the window exactly")
    // no single-partition exchange in the distributed plan
    val plan = Layout.globalPrefixSum(df, Seq("id"), "w", partitions = 8)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange SinglePartition"),
      s"prefix sum must not funnel through one task:\n$plan")
    // null weights refuse loudly instead of silently dropping
    intercept[IllegalArgumentException] {
      Layout.globalPrefixSum(
        Seq((1L, Some(2L)), (2L, None)).toDF("id", "w"), Seq("id"), "w")
    }
  }

  test("clusteringDepth: range layout depth 1 per file, hash layout" +
      " fully interleaved") {
    val dir = java.nio.file.Files.createTempDirectory("depth").toString
    val d = (0L until 100L).toDF("id")
    d.repartitionByRange(4, $"id").write.mode("overwrite").parquet(s"$dir/r")
    d.repartition(4, $"id").write.mode("overwrite").parquet(s"$dir/h")
    def depths(p: String): Seq[Long] =
      Layout.clusteringDepth(Layout.fileStats(spark, p, Seq("id")), "id")
        .select($"depth").as[Long].collect().toSeq.sorted
    assert(depths(s"$dir/r") == Seq(1L, 1L, 1L, 1L),
      "range files must not overlap")
    assert(depths(s"$dir/h") == Seq(4L, 4L, 4L, 4L),
      "hash files must all interleave")
  }

  test("rangeShardBounds + assignRangeShards: monotone cuts, balanced " +
      "shards within the sketch rank bound, rebuild stays in-bound") {
    val n = 4000
    val df = (0 until n).map(i => (i.toLong, ((i * 37) % n).toLong))
      .toDF("id", "v")
    val k = 256
    val nShards = 8
    val bounds = Layout.rangeShardBounds(df, "v", nShards, k)
    assert(bounds.length == nShards - 1)
    assert(bounds.sameElements(bounds.sorted), "cuts must be monotone")
    val counts = Layout.assignRangeShards(df, "v", bounds)
      .groupBy("shard").count().as[(Long, Long)].collect().toMap
    assert(counts.keySet == (0L until nShards).toSet, s"all shards hit: $counts")
    val slack = 2 * 6 * n / k // two cut errors bound one shard's width
    counts.values.foreach(c =>
      assert(math.abs(c - n / nShards) <= slack, s"imbalance: $counts"))
    // KLL compaction is merge-order-dependent (treeAggregate task
    // completion order), so cuts are not bit-identical across builds;
    // the CONTRACT (q185's) is the rank bound, which every build meets
    val again = Layout.rangeShardBounds(df, "v", nShards, k)
    again.zipWithIndex.foreach { case (cut, i) =>
      val rank = (0 until n).count(j => ((j * 37) % n) <= cut)
      val target = (i + 1) * n / nShards
      assert(math.abs(rank - target) <= 6 * n / k,
        s"rebuilt cut $cut rank $rank vs target $target")
    }
  }

  test("assignRangeShards: a value equal to a cut lands in the LOWER shard") {
    val df = (1 to 10).map(i => (i.toLong, 5.0)).toDF("id", "v")
    val got = Layout.assignRangeShards(df, "v", Array(5.0, 7.0))
      .select($"shard").as[Long].collect().toSet
    assert(got == Set(0L), s"ties stay below the cut: $got")
  }

  test("postingsCompressionAudit: gaps from 0, varint thresholds, " +
      "duplicate postings dedupe, exact ratios") {
    // term a: docs 0,1,130 (dup 1) → gaps 0,1,129 → 1+1+2 = 4 bytes,
    // raw 24 → 166‰. term b: doc 20000 → gap 20000 → 3 bytes / 8.
    val df = Seq(("a", 0L), ("a", 1L), ("a", 1L), ("a", 130L),
      ("b", 20000L)).toDF("term", "doc")
    val got = Layout.postingsCompressionAudit(df, "term", "doc")
      .select("term", "n_docs", "varint_bytes", "raw_bytes", "ratio_pm")
      .as[(String, Long, Long, Long, Long)].collect().toSet
    assert(got == Set(("a", 3L, 4L, 24L, 166L),
      ("b", 1L, 3L, 8L, 375L)), s"got $got")
    // threshold boundaries: 127 → 1 byte, 128 → 2; 16383 → 2, 16384 → 3
    val edges = Seq(("e1", 127L), ("e2", 128L), ("e3", 16383L),
      ("e4", 16384L)).toDF("term", "doc")
    val vb = Layout.postingsCompressionAudit(edges, "term", "doc")
      .select("term", "varint_bytes").as[(String, Long)].collect().toMap
    assert(vb == Map("e1" -> 1L, "e2" -> 2L, "e3" -> 2L, "e4" -> 3L),
      s"LEB128 thresholds: $vb")
  }

  test("rendezvousAssign: matches a local argmax reference, removing " +
      "a node reassigns exactly its keys, deterministic, guards") {
    val df = (1L to 60L).toDF("id")
    def md5u32(s: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      d.take(4).foldLeft(0L)((a, b) => (a << 8) | (b & 0xffL))
    }
    def ref(id: Long, nodes: Seq[String]): String =
      nodes.map(n => (md5u32(s"$n:$id"), n))
        .minBy { case (s, n) => (-s, n) }._2
    val three = graft.ops.Layout
      .rendezvousAssign(df, "id", Seq("a", "b", "c"))
      .as[(Long, String)].collect().toMap
    assert(three.forall { case (id, n) =>
      n == ref(id, Seq("a", "b", "c")) }, "matches the reference")
    val two = graft.ops.Layout
      .rendezvousAssign(df, "id", Seq("a", "b"))
      .as[(Long, String)].collect().toMap
    val moved = three.filter { case (id, n) => two(id) != n }
    assert(moved.nonEmpty && moved.forall(_._2 == "c"),
      s"only the removed node's keys move: $moved")
    intercept[IllegalArgumentException] {
      graft.ops.Layout.rendezvousAssign(df, "id", Seq.empty)
    }
  }

  test("consistentHashAssign: matches a local ring reference incl. " +
      "the wrap, adding a node only moves keys TO it, deterministic, " +
      "guards") {
    val df = (1L to 60L).toDF("id")
    def md5u32(s: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      d.take(4).foldLeft(0L)((a, b) => (a << 8) | (b & 0xffL))
    }
    def ref(id: Long, nodes: Seq[String], v: Int): String = {
      val ring = (for { n <- nodes; i <- 0 until v }
        yield (md5u32(s"$n:$i"), n)).sorted
      val kp = md5u32(id.toString)
      ring.find(_._1 >= kp).getOrElse(ring.head)._2
    }
    val two = graft.ops.Layout
      .consistentHashAssign(df, "id", Seq("a", "b"), vnodes = 2)
      .as[(Long, String, Long)].collect()
    assert(two.forall { case (id, n, _) =>
      n == ref(id, Seq("a", "b"), 2) }, "matches the reference ring")
    val three = graft.ops.Layout
      .consistentHashAssign(df, "id", Seq("a", "b", "c"), vnodes = 2)
      .as[(Long, String, Long)].collect().map(r => r._1 -> r._2).toMap
    val moved = two.filter { case (id, n, _) => three(id) != n }
    assert(moved.nonEmpty && moved.forall(m => three(m._1) == "c"),
      s"moves go only TO the new node: ${moved.toSeq}")
    intercept[IllegalArgumentException] {
      graft.ops.Layout.consistentHashAssign(df, "id", Seq.empty)
    }
  }

  test("hilbertValue: full 8x8 grid is a permutation, consecutive " +
      "indices always grid-adjacent (the locality Z-order lacks), " +
      "matches the reference xy2d walk, bits guard") {
    def ref(xi: Long, yi: Long, bits: Int): Long = {
      var x = xi; var y = yi; var d = 0L
      var s = 1L << (bits - 1)
      while (s > 0) {
        val rx = if ((x & s) > 0) 1L else 0L
        val ry = if ((y & s) > 0) 1L else 0L
        d += s * s * ((3 * rx) ^ ry)
        if (ry == 0) {
          if (rx == 1) { x = s - 1 - x; y = s - 1 - y }
          val t = x; x = y; y = t
        }
        s >>= 1
      }
      d
    }
    val cells = for { x <- 0 until 8; y <- 0 until 8 }
      yield (x.toLong, y.toLong)
    val got = cells.toDF("x", "y")
      .select(col("x"), col("y"),
        Layout.hilbertValue(col("x"), col("y"), bits = 3).as("h"))
      .as[(Long, Long, Long)].collect()
    assert(got.forall { case (x, y, h) => h == ref(x, y, 3) },
      "matches reference walk")
    val byH = got.sortBy(_._3)
    assert(byH.map(_._3).toSeq == (0L until 64L), "permutation of 0..63")
    assert(byH.sliding(2).forall { case Array(a, b) =>
      (a._1 - b._1).abs + (a._2 - b._2).abs == 1
    }, "consecutive Hilbert cells are grid-adjacent")
    intercept[IllegalArgumentException] {
      Layout.hilbertValue(col("x"), col("y"), bits = 0)
    }
  }

  test("encodingAdvisor: dict wins on repeats, plain wins on a " +
      "key-like column, nulls excluded, exact byte math and bit " +
      "widths, guards") {
    val df = Seq(
      (Some("a"), "x1"), (Some("a"), "x2"), (Some("bb"), "x3"),
      (Some("ccc"), "x4"), (None, "x5"))
      .toDF("rep", "uniq")
    val got = Layout.encodingAdvisor(df, Seq("rep", "uniq"))
      .as[(String, Long, Long, Long, Long, Long, String)]
      .collect().toSet
    // rep: n=4 ndv=3 slen=7 dlen=6 bits=2 → plain 23, dict 19 → dict
    // uniq: n=5 ndv=5 slen=10 dlen=10 bits=3 → plain 30,
    //   dict 10+20+(15+7)//8=32 → plain
    val want = Set(("rep", 4L, 3L, 23L, 19L, 2L, "dict"),
      ("uniq", 5L, 5L, 30L, 32L, 3L, "plain"))
    assert(got == want, s"got $got")
    intercept[IllegalArgumentException] {
      Layout.encodingAdvisor(df, Seq.empty)
    }
    intercept[IllegalArgumentException] {
      Layout.encodingAdvisor(df, Seq("rep", "rep"))
    }
  }

  test("roaringPlan: array/run/bitmap chosen per chunk from exact " +
      "stats, chunk split at the 2^16 seam, 4096-card tie prefers " +
      "array, duplicates collapse") {
    val rows =
      // t/chunk0: {1,2,3,10} → 2 runs, array 8 B; t/chunk1: {70000}
      Seq("t" -> 1L, "t" -> 2L, "t" -> 3L, "t" -> 10L, "t" -> 10L,
        "t" -> 70000L) ++
      // r: 0..4999 consecutive + 6000,6001 → card 5002, 2 runs → run
      ((0L until 5000L).map("r" -> _) ++ Seq("r" -> 6000L, "r" -> 6001L)) ++
      // b: evens 0..9998 → card 5000, 5000 runs → bitmap
      (0L until 5000L).map(i => "b" -> (i * 2)) ++
      // e: evens 0..8190 → card 4096 exactly: array 8192 = bitmap → array
      (0L until 4096L).map(i => "e" -> (i * 2))
    val got = Layout.roaringPlan(rows.toDF("term", "doc"), "term", "doc")
      .as[(String, Long, Long, Long, String, Long)].collect().toSet
    val want = Set(
      ("t", 0L, 4L, 2L, "array", 8L),
      ("t", 1L, 1L, 1L, "array", 2L),
      ("r", 0L, 5002L, 2L, "run", 10L),
      ("b", 0L, 5000L, 5000L, "bitmap", 8192L),
      ("e", 0L, 4096L, 4096L, "array", 8192L))
    assert(got == want, s"got $got")
  }

  test("viewLatticeGreedy: hand 2-dim lattice — benefits, cost updates " +
      "after each pick, symmetric tie breaks to the smaller mask, " +
      "guards") {
    // 4×2 grid: sizes {}=1, {a}=4, {b}=2, {a,b}=8.
    // Step 1: B(∅)=7, B(a)=4+4=8, B(b)=6+6=12 → pick b (12).
    // Step 2 (cost(∅) now 2): B(∅)=1, B(a)=0+4=4 → pick a (4).
    val df = (for { a <- 0 until 4; b <- 0 until 2 }
      yield (a.toLong, b.toLong)).toDF("a", "b")
    val got = Layout.viewLatticeGreedy(df, Seq("a", "b"), k = 2)
      .as[(Long, String, Long, Long, Long)].collect().toSeq.sortBy(_._1)
    assert(got == Seq((1L, "b", 2L, 2L, 12L), (2L, "a", 1L, 4L, 4L)),
      s"got $got")
    // symmetric 2×2: B(a) = B(b) = 4 → mask asc picks "a"
    val sym = (for { a <- 0 until 2; b <- 0 until 2 }
      yield (a.toLong, b.toLong)).toDF("a", "b")
    val tie = Layout.viewLatticeGreedy(sym, Seq("a", "b"), k = 1)
      .as[(Long, String, Long, Long, Long)].head()
    assert(tie == ((1L, "a", 1L, 2L, 4L)), s"got $tie")
    intercept[IllegalArgumentException] {
      Layout.viewLatticeGreedy(df, Seq("a"), k = 1)
    }
    intercept[IllegalArgumentException] {
      Layout.viewLatticeGreedy(df, Seq("a", "b"), k = 0)
    }
    intercept[IllegalArgumentException] {
      Layout.viewLatticeGreedy(df, Seq("a", "a"), k = 1)
    }
  }

  test("pruningAudit: 4x4 grid — zorder prunes the y-slice linear " +
      "can't, the x-slice trade is visible, empty box yields null amp, " +
      "guards") {
    val rows = for { x <- 0 until 4; y <- 0 until 4 }
      yield ((x * 4 + y).toLong, x.toLong, y.toLong)
    val df = rows.toDF("id", "x", "y")
    val preds = Seq(
      (0L, 0L, 3L, 0L, 1L),   // y-slice: zorder halves the read set
      (1L, 1L, 1L, 0L, 3L),   // x-slice: linear's native win
      (2L, 10L, 20L, 0L, 3L)  // empty box
    ).toDF("pred_id", "x_lo", "x_hi", "y_lo", "y_hi")
    val got = Layout.pruningAudit(df, "x", "y", "id",
        Seq("linear_x" -> col("x"),
          "zorder" -> Layout.zValue(col("x"), col("y"), bits = 2)),
        preds, nFiles = 4)
      .as[(String, Long, Long, Long, Long, Long, Long, Option[Long])]
      .collect().toSet
    val want = Set(
      ("linear_x", 0L, 4L, 4L, 16L, 8L, 0L, Some(2000000L)),
      ("linear_x", 1L, 4L, 1L, 4L, 4L, 750000L, Some(1000000L)),
      ("linear_x", 2L, 4L, 0L, 0L, 0L, 1000000L, None),
      ("zorder", 0L, 4L, 2L, 8L, 8L, 500000L, Some(1000000L)),
      ("zorder", 1L, 4L, 2L, 8L, 4L, 500000L, Some(2000000L)),
      ("zorder", 2L, 4L, 0L, 0L, 0L, 1000000L, None))
    assert(got == want, s"got $got")
    intercept[IllegalArgumentException] {
      Layout.pruningAudit(df, "x", "y", "id", Seq("a" -> col("x")),
        preds, nFiles = 1)
    }
    intercept[IllegalArgumentException] {
      Layout.pruningAudit(df, "x", "y", "id", Seq.empty, preds, 4)
    }
    intercept[IllegalArgumentException] {
      Layout.pruningAudit(df, "x", "y", "id",
        Seq("a" -> col("x"), "a" -> col("y")), preds, 4)
    }
  }
}
