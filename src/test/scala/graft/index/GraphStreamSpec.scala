package graft.index

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** Streaming HNSW admission over versioned snapshots: the StreamUpsert
  * contract applied to the graph index — one pinned (points, edges)
  * version pair per micro-batch, history readable mid-stream, replay
  * convergence, and the frozen-graph rule (batch links only into the
  * stored side). */
class GraphStreamSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def vecOf(i: Int): Seq[Float] = {
    val r = new java.util.Random(i * 1000003L)
    Seq.fill(8)(r.nextGaussian().toFloat)
  }

  test("one snapshot pair per batch; pinned v1 readable; replay " +
      "converges; second batch links only into the stored side") {
    val base = Files.createTempDirectory("graft_graph_stream").toString
    val src = s"$base/src"
    val (pts, edg) = (s"$base/points", s"$base/edges")
    (0 until 50).map(i => (i.toLong, vecOf(i))).toDF("vec_id", "embedding")
      .select($"vec_id", $"embedding".cast("array<float>").as("embedding"))
      .coalesce(1).write.mode("append").parquet(src)
    (100 until 130).map(i => (i.toLong, vecOf(i))).toDF("vec_id", "embedding")
      .select($"vec_id", $"embedding".cast("array<float>").as("embedding"))
      .coalesce(1).write.mode("append").parquet(src)
    val schema = spark.read.parquet(src).schema

    def run(checkpoint: String): Unit = {
      val stream = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(src)
      val q = GraphStream.streamAdmit(spark, stream, pts, edg,
        checkpoint = checkpoint, m = 4, maxLevel = 3, dim = 8)
      q.processAllAvailable(); q.stop()
    }
    run(s"$base/cp1")

    assert(Snapshots.versions(spark, pts) == Seq(1L, 2L))
    assert(Snapshots.versions(spark, edg) == Seq(1L, 2L))
    // pinned v1: only the first batch's state
    val p1 = Snapshots.readVersion(spark, pts, 1).select("id")
      .as[Long].collect().toSet
    assert(p1 == (0L until 50L).toSet, "v1 points pin the first batch")
    val e1 = GraphStream.decodeEdges(Snapshots.readVersion(spark, edg, 1))
      .select("id", "nbr").as[(Long, Long)].collect()
    assert(e1.nonEmpty && e1.forall { case (a, b) => a < 50 && b < 50 })
    // latest: both batches; the admitted batch links ONLY into stored
    val p2 = Snapshots.readVersion(spark, pts).select("id")
      .as[Long].collect().toSet
    assert(p2 == (0L until 50L).toSet ++ (100L until 130L).toSet)
    val e1keys = Snapshots.readVersion(spark, edg, 1).select("id")
      .as[String].collect().toSet
    val newEdges = GraphStream.decodeEdges(
        Snapshots.readVersion(spark, edg, 2)
          .filter(!col("id").isin(e1keys.toSeq: _*)))
      .select("id", "nbr").as[(Long, Long)].collect()
    assert(newEdges.nonEmpty)
    assert(newEdges.forall { case (a, b) => (a >= 100) ^ (b >= 100) },
      "admitted edges must pair batch with stored — frozen-graph rule")

    // replay from a fresh checkpoint: converged (no new versions from
    // already-stored ids, no duplicate points, same edge keys)
    val edgeKeysBefore = Snapshots.readVersion(spark, edg).select("id")
      .as[String].collect().toSet
    run(s"$base/cp2")
    assert(Snapshots.readVersion(spark, pts).groupBy("id").count()
      .filter($"count" > 1).isEmpty, "replay must not duplicate points")
    assert(Snapshots.readVersion(spark, pts).count() == 80L)
    assert(Snapshots.readVersion(spark, edg).select("id")
      .as[String].collect().toSet == edgeKeysBefore,
      "replay must not change the edge set")

    // a pinned version pair SERVES: walk the latest graph end-to-end
    val (points, edges) = GraphStream.readVersioned(spark, pts, edg)
    val idx = new graft.ops.Similarity.HnswIndex(points, m = 4,
      maxLevel = 3, vecCol = "vec", idCol = "id",
      prebuiltGraph = Some(edges))
    val got = idx.search(vecOf(7).toArray, k = 5, ef = 16, hops = 3)
      .select("id").as[Long].collect()
    assert(got.length == 5, s"served walk returns k results: ${got.toSeq}")

    // COMPACTION: rebuild the edges from the full point set as a new
    // REPLACE-committed version — equal to a fresh self-build, admitted
    // residue gone, history intact
    val v3 = GraphStream.compact(spark, pts, edg, m = 4, maxLevel = 3,
      dim = 8)
    assert(v3 == 3L)
    val rebuilt = GraphStream.decodeEdges(Snapshots.readVersion(spark, edg, 3))
      .select("layer", "id", "nbr").as[(Int, Long, Long)].collect().toSet
    val freshIdx = new graft.ops.Similarity.HnswIndex(points, m = 4,
      maxLevel = 3, vecCol = "vec", idCol = "id", build = "nndescent",
      dim = 8)
    val fresh = freshIdx.graph.select("layer", "id", "nbr")
      .as[(Int, Long, Long)].collect().toSet
    assert(rebuilt == fresh, "compacted graph == fresh self-build")
    // the self-build rewires (it may link across former batches —
    // exactly what admission cannot): the rebuilt set differs from the
    // accumulated admission set
    val v2edges = GraphStream.decodeEdges(Snapshots.readVersion(spark, edg, 2))
      .select("layer", "id", "nbr").as[(Int, Long, Long)].collect().toSet
    assert(rebuilt != v2edges, "rebuild differs from accumulated admissions")
    assert(Snapshots.readVersion(spark, edg, 2).select("id")
      .as[String].collect().toSet == edgeKeysBefore,
      "prior edge version untouched by compaction")

    // VERSIONED DELETE: tombstone 20% of ids — the latest pair holds
    // the repaired graph (no deleted endpoint anywhere) and the
    // shrunken point set; prior versions still pin the full state
    val tomb = (0 until 50).map(_.toLong).filter(_ % 5 == 0) ++
      (100 until 130).map(_.toLong).filter(_ % 5 == 0)
    val (pv, ev) = GraphStream.deleteIds(spark,
      tomb.toDF("id"), pts, edg)
    assert(pv == 3L && ev == 4L, s"new versions committed: $pv/$ev")
    val pAfter = Snapshots.readVersion(spark, pts).select("id")
      .as[Long].collect().toSet
    assert(pAfter == p2 -- tomb, "latest points exclude the deletes")
    val eAfter = GraphStream.decodeEdges(Snapshots.readVersion(spark, edg))
      .select("id", "nbr").as[(Long, Long)].collect()
    assert(eAfter.nonEmpty && eAfter.forall { case (a, b) =>
      !tomb.contains(a) && !tomb.contains(b) },
      "repaired edges carry no deleted endpoint")
    // the repaired pair serves a plain walk with no tombstone filter
    val (p3, e3) = GraphStream.readVersioned(spark, pts, edg)
    val idx3 = new graft.ops.Similarity.HnswIndex(p3, m = 4,
      maxLevel = 3, vecCol = "vec", idCol = "id",
      prebuiltGraph = Some(e3))
    val served = idx3.search(vecOf(7).toArray, k = 5, ef = 16, hops = 3)
      .select("id").as[Long].collect()
    assert(served.length == 5 && served.forall(!tomb.contains(_)))
    // history intact: version 2 still holds the pre-delete points
    assert(Snapshots.readVersion(spark, pts, 2).count() == 80L)
  }

  test("tombstone-threshold lifecycle: below-bar waves accumulate with " +
      "no new generation, the pinned generation serves unchanged across " +
      "the cutover, post-sweep recall holds, tombstones clear") {
    val base = Files.createTempDirectory("graft_graph_gen").toString
    val (pts, edg, tmb) = (s"$base/points", s"$base/edges", s"$base/tombs")
    val n = 200
    val points = (0 until n).map(i => (i.toLong, vecOf(i)))
      .toDF("id", "vec").select($"id", $"vec".cast("array<float>").as("vec"))
    Snapshots.upsertVersioned(spark, points, pts)
    GraphStream.compact(spark, pts, edg, m = 6, maxLevel = 3, dim = 8)
    val qv = vecOf(7).toArray

    // wave 1: 5% — below the 10% bar; nothing commits
    GraphStream.tombstone(spark,
      points.filter($"id" % 20 === 3).select("id"), tmb)
    assert(GraphStream.sweepIfDue(spark, pts, edg, tmb, 100).isEmpty)
    assert(Snapshots.versions(spark, edg) == Seq(1L))
    // pre-sweep serving: pinned generation 1 + tombstone filter
    def pinnedSearch(): Seq[(Long, Double)] = {
      val (p1, e1) = GraphStream.readVersioned(spark, pts, edg, 1L, 1L)
      new graft.ops.Similarity.HnswIndex(p1, m = 6, maxLevel = 3,
          vecCol = "vec", idCol = "id", prebuiltGraph = Some(e1))
        .searchTombstoned(qv, k = 10,
          GraphStream.tombstones(spark, tmb), ef = 32, hops = 4)
        .select("id", "cos").as[(Long, Double)].collect().toSeq
    }
    val before = pinnedSearch()
    assert(before.size == 10 && before.forall(_._1 % 20 != 3))

    // wave 2: cumulative ~24% — crosses the bar; generation 2 commits
    GraphStream.tombstone(spark,
      points.filter($"id" % 5 === 0).select("id"), tmb)
    val tombSet = (0 until n).map(_.toLong)
      .filter(i => i % 20 == 3 || i % 5 == 0).toSet
    val swept = GraphStream.sweepIfDue(spark, pts, edg, tmb, 100)
    assert(swept.nonEmpty)
    assert(Snapshots.versions(spark, edg) == Seq(1L, 2L))
    // tombstones consumed: the list is empty again
    assert(GraphStream.tombstones(spark, tmb).count() == 0L)
    // the pinned generation-1 read is BIT-IDENTICAL across the cutover
    // (reconstructing the pre-wave-2 view needs the wave-1 list back —
    // pass it explicitly, as a pinned reader holds its own filter)
    val (p1, e1) = GraphStream.readVersioned(spark, pts, edg, 1L, 1L)
    val afterPinned = new graft.ops.Similarity.HnswIndex(p1, m = 6,
        maxLevel = 3, vecCol = "vec", idCol = "id",
        prebuiltGraph = Some(e1))
      .searchTombstoned(qv, k = 10,
        points.filter($"id" % 20 === 3).select("id"),
        ef = 32, hops = 4)
      .select("id", "cos").as[(Long, Double)].collect().toSeq
    assert(afterPinned == before,
      "the pinned generation must serve unchanged across the sweep")
    // cutover: plain walk over generation 2, no tombstone filter;
    // recall vs survivor brute force stays in the served class
    val (p2g, e2g) = GraphStream.readVersioned(spark, pts, edg)
    val got = new graft.ops.Similarity.HnswIndex(p2g, m = 6,
        maxLevel = 3, vecCol = "vec", idCol = "id",
        prebuiltGraph = Some(e2g))
      .search(qv, k = 10, ef = 32, hops = 4)
      .select("id").as[Long].collect()
    assert(got.length == 10 && got.forall(!tombSet(_)))
    val brute = graft.ops.Similarity.bruteForceTopK(
        points.join(tombSet.toSeq.toDF("id"), Seq("id"), "left_anti")
          .select($"id".as("vec_id"), $"vec".as("embedding")), qv, 10)
      .select("vec_id").as[Long].collect().toSet
    val recall = got.count(brute).toDouble / 10
    assert(recall >= 0.8, s"post-cutover recall $recall < 0.8")
  }

  test("full lifecycle loop: stream-admit, tombstone, sweep, then the " +
      "NEXT admitted batch links into the repaired generation and " +
      "serving covers old + new survivors") {
    val base = Files.createTempDirectory("graft_graph_loop").toString
    val src = s"$base/src"
    val (pts, edg, tmb) = (s"$base/points", s"$base/edges", s"$base/tombs")
    def run(cp: String): Unit = {
      val schema = spark.read.parquet(src).schema
      val q = GraphStream.streamAdmit(spark,
        spark.readStream.schema(schema)
          .option("maxFilesPerTrigger", "1").parquet(src),
        pts, edg, checkpoint = cp, m = 6, maxLevel = 3, dim = 8)
      q.processAllAvailable(); q.stop()
    }
    // batch 1 admits and self-builds
    (0 until 120).map(i => (i.toLong, vecOf(i))).toDF("vec_id", "embedding")
      .select($"vec_id", $"embedding".cast("array<float>").as("embedding"))
      .coalesce(1).write.mode("append").parquet(src)
    run(s"$base/cp1")
    // tombstone 25% and sweep into the repaired generation
    GraphStream.tombstone(spark,
      Snapshots.readVersion(spark, pts).filter($"id" % 4 === 0)
        .select("id"), tmb)
    assert(GraphStream.sweepIfDue(spark, pts, edg, tmb, 100).nonEmpty)
    val sweptEdgeVersion = Snapshots.versions(spark, edg).last
    // batch 2 arrives AFTER the sweep: streamAdmit reads the repaired
    // latest pair and links the newcomers into it
    (200 until 260).map(i => (i.toLong, vecOf(i))).toDF("vec_id", "embedding")
      .select($"vec_id", $"embedding".cast("array<float>").as("embedding"))
      .coalesce(1).write.mode("append").parquet(src)
    run(s"$base/cp1")
    assert(Snapshots.versions(spark, edg).last == sweptEdgeVersion + 1)
    val tombSet = (0 until 120).map(_.toLong).filter(_ % 4 == 0).toSet
    val edges = GraphStream.decodeEdges(Snapshots.readVersion(spark, edg))
      .select("id", "nbr").as[(Long, Long)].collect()
    assert(edges.forall { case (a, b) => !tombSet(a) && !tombSet(b) },
      "no post-sweep edge may touch a swept id")
    assert(edges.exists { case (a, b) => (a >= 200) || (b >= 200) },
      "the new batch must be linked in")
    // serving the latest pair finds survivors from BOTH batches
    val (p2, e2) = GraphStream.readVersioned(spark, pts, edg)
    val idx = new graft.ops.Similarity.HnswIndex(p2, m = 6, maxLevel = 3,
      vecCol = "vec", idCol = "id", prebuiltGraph = Some(e2))
    val gotOld = idx.search(vecOf(7).toArray, k = 10, ef = 32, hops = 4)
      .select("id").as[Long].collect()
    val gotNew = idx.search(vecOf(203).toArray, k = 10, ef = 32, hops = 4)
      .select("id").as[Long].collect()
    assert(gotOld.length == 10 && gotOld.forall(!tombSet(_)))
    assert(gotNew.contains(203L),
      s"a post-sweep admit must be findable: ${gotNew.toSeq}")
  }
}
