package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class ViewsSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private lazy val base = Seq(
    ("A", "x", 1, 10L), ("A", "x", 2, 20L), ("A", "y", 1, 30L),
    ("B", "x", 2, 40L), ("B", "y", 1, 50L), ("B", "y", 2, 60L),
    ("B", "y", 2, 70L)).toDF("rf", "ls", "mth", "cents")

  private def view(cols: String*) = cols.toSeq ->
    base.groupBy(cols.map(col): _*)
      .agg(count(lit(1)).as("cnt"), sum("cents").as("sum_cents"))

  private lazy val views = Map(
    "v_rf_ls" -> view("rf", "ls"),      // 4 rows
    "v_rf_mth" -> view("rf", "mth"),    // 4 rows (tie with v_rf_ls)
    "v_ls_mth" -> view("ls", "mth"),    // 4 rows
    "v_all" -> view("rf", "ls", "mth")) // 6 rows

  test("routeAndAnswer: cheapest subsuming view wins (tie breaks to " +
      "name), answer equals direct base aggregation") {
    val got = Views.routeAndAnswer(views, Seq("rf"),
      Seq("cnt", "sum_cents"))
    // subsuming rf: v_rf_ls (4 rows), v_rf_mth (4 rows), v_all (6) —
    // tie on 4 rows breaks to the smaller name v_rf_ls
    assert(got.select("served_from").distinct().as[String].collect()
      .toSeq == Seq("v_rf_ls"))
    val direct = base.groupBy("rf")
      .agg(count(lit(1)).as("cnt"), sum("cents").as("sum_cents"))
      .as[(String, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    val gotPairs = got.select("rf", "cnt", "sum_cents")
      .as[(String, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(gotPairs == direct, s"view answer must equal base: $gotPairs")
  }

  test("routeAndAnswer: a finer query routes past non-subsuming views; " +
      "nothing subsuming refuses loudly") {
    val got = Views.routeAndAnswer(views, Seq("ls", "mth"),
      Seq("cnt", "sum_cents"))
    assert(got.select("served_from").distinct().as[String].collect()
      .toSeq == Seq("v_ls_mth"))
    intercept[IllegalArgumentException] {
      Views.routeAndAnswer(
        views - "v_all" - "v_rf_ls", Seq("rf", "ls"),
        Seq("cnt", "sum_cents"))
    }
    intercept[IllegalArgumentException] {
      Views.routeAndAnswer(views, Seq.empty, Seq("cnt"))
    }
  }

  test("applyDelta: refreshed lattice equals views rebuilt from the " +
      "full table — new groups appear, existing groups merge") {
    val batch = Seq(("A", "y", 2, 100L), ("C", "z", 3, 200L))
      .toDF("rf", "ls", "mth", "cents")
    val aggs = Seq(count(lit(1)).as("cnt"), sum("cents").as("sum_cents"))
    val refreshed = Views.applyDelta(views, batch, aggs)
    val full = base.unionByName(batch)
    for ((name, (cols, got)) <- refreshed) {
      val want = full.groupBy(cols.map(col): _*)
        .agg(count(lit(1)).as("cnt"), sum("cents").as("sum_cents"))
      val g = got.collect().map(_.toSeq).sortBy(_.toString()).toSeq
      val w = want.select(got.columns.map(col): _*).collect()
        .map(_.toSeq).sortBy(_.toString()).toSeq
      assert(g == w, s"view $name: refresh must equal recompute")
    }
    // routing over the refreshed lattice answers the new group too
    val ans = Views.routeAndAnswer(refreshed, Seq("rf"),
        Seq("cnt", "sum_cents"))
      .select("rf", "cnt").as[(String, Long)].collect().toMap
    assert(ans("C") == 1L && ans("A") == 4L)
  }

  test("routeFromStats: the decision reads ONLY the maintained stats — " +
      "a poisoned losing candidate is never evaluated, flipping the " +
      "stats flips the choice; applyDeltaMaintained keeps stats exact") {
    val boom = udf((x: Long) => {
      sys.error("poisoned candidate view was evaluated"); x
    })
    val poisoned = base.groupBy("rf", "mth")
      .agg(count(lit(1)).as("cnt"), sum("cents").as("sum_cents"))
      .withColumn("cnt", boom(col("cnt")))
    val lat = Views.Lattice(
      Map("v_rf_ls" -> view("rf", "ls"),
        "v_rf_mth" -> (Seq("rf", "mth"), poisoned)),
      Map("v_rf_ls" -> 4L, "v_rf_mth" -> 4L))
    // tie → name order picks v_rf_ls; the poisoned loser is untouched
    val got = Views.routeFromStats(lat, Seq("rf"), Seq("cnt", "sum_cents"))
    val rows = got.select("rf", "cnt", "sum_cents", "served_from")
      .as[(String, Long, Long, String)].collect()
    assert(rows.forall(_._4 == "v_rf_ls"))
    val direct = base.groupBy("rf")
      .agg(count(lit(1)).as("cnt"), sum("cents").as("sum_cents"))
      .as[(String, Long, Long)].collect().toSet
    assert(rows.map(r => (r._1, r._2, r._3)).toSet == direct)
    // stats DRIVE the decision: make the poisoned view the cheapest and
    // the route must now evaluate it — which throws
    val lat2 = lat.copy(stats = Map("v_rf_ls" -> 9L, "v_rf_mth" -> 2L))
    intercept[Exception] {
      Views.routeFromStats(lat2, Seq("rf"), Seq("cnt", "sum_cents"))
        .collect()
    }
    // maintained stats stay EXACT through a delta (new + merged groups)
    val pre = base.filter($"mth" === 1)
    val post = base.filter($"mth" === 2)
      .unionByName(Seq(("C", "z", 3, 200L)).toDF("rf", "ls", "mth", "cents"))
    def preView(cols: String*) = cols.toSeq ->
      pre.groupBy(cols.map(col): _*)
        .agg(count(lit(1)).as("cnt"), sum("cents").as("sum_cents"))
    val lat0 = Views.materialize(Map(
      "v_rf_ls" -> preView("rf", "ls"),
      "v_rf_mth" -> preView("rf", "mth"),
      "v_ls_mth" -> preView("ls", "mth")))
    val lat1 = Views.applyDeltaMaintained(lat0, post,
      Seq(count(lit(1)).as("cnt"), sum("cents").as("sum_cents")))
    val full = pre.unionByName(post)
    for ((name, (cols, _)) <- lat1.views) {
      val want = full.select(cols.map(col): _*).distinct().count()
      assert(lat1.stats(name) == want,
        s"$name: maintained rows ${lat1.stats(name)} != true $want")
    }
    // stats-routed answer equals the recount-routed answer on the
    // refreshed lattice
    val a = Views.routeFromStats(lat1, Seq("rf"), Seq("cnt", "sum_cents"))
      .collect().map(_.toSeq).sortBy(_.toString()).toSeq
    val b = Views.routeAndAnswer(lat1.views, Seq("rf"),
        Seq("cnt", "sum_cents"))
      .collect().map(_.toSeq).sortBy(_.toString()).toSeq
    assert(a == b)
  }

  test("saveLattice/loadLattice: a restart routes from the STORED stats " +
      "— no view is recounted, losers' data stays unread, answers match") {
    val lat0 = Views.materialize(Map(
      "v_rf_ls" -> view("rf", "ls"),
      "v_rf_mth" -> view("rf", "mth"),
      "v_ls_mth" -> view("ls", "mth")))
    val batch = Seq(("A", "y", 2, 100L), ("C", "z", 3, 200L))
      .toDF("rf", "ls", "mth", "cents")
    val lat = Views.applyDeltaMaintained(lat0, batch,
      Seq(count(lit(1)).as("cnt"), sum("cents").as("sum_cents")))
    val path = java.nio.file.Files
      .createTempDirectory("views_lattice").toString
    Views.saveLattice(lat, path)
    // "restart": a fresh lattice from disk — stored stats must equal
    // the maintained ones exactly (no recount happened to fix them up)
    val reloaded = Views.loadLattice(spark, path)
    assert(reloaded.stats == lat.stats)
    assert(reloaded.views.keySet == lat.views.keySet)
    assert(reloaded.views("v_rf_ls")._1 == Seq("rf", "ls"))
    // routing reads ONLY the stats + the chosen view's parquet: poison
    // the losers ON DISK and the route must still answer
    for (loser <- Seq("v_rf_mth", "v_ls_mth"))
      graft.ops.Joins.deleteRecursively(
        new java.io.File(s"$path/views/$loser"))
    val got = Views.routeFromStats(reloaded, Seq("rf"),
        Seq("cnt", "sum_cents"))
      .select("rf", "cnt", "sum_cents", "served_from")
      .as[(String, Long, Long, String)].collect().toSet
    val full = base.unionByName(batch)
    val want = full.groupBy("rf")
      .agg(count(lit(1)).as("cnt"), sum("cents").as("sum_cents"))
      .as[(String, Long, Long)].collect()
      .map(t => (t._1, t._2, t._3, "v_rf_ls")).toSet
    assert(got == want, s"post-restart routed answer drifted: $got")
    // a deleted loser really is unreadable — the poisoning is real
    intercept[Exception] {
      reloaded.views("v_ls_mth")._2.collect()
    }
  }

  test("saveLattice dirty tracking: only the named views' frames " +
      "rewrite, the stats table always does, unknown names refuse") {
    val lat = Views.materialize(Map(
      "v_rf_ls" -> view("rf", "ls"),
      "v_rf_mth" -> view("rf", "mth")))
    val path = java.nio.file.Files
      .createTempDirectory("views_dirty").toString
    Views.saveLattice(lat, path)
    def mtimes(name: String): Map[String, Long] = {
      val d = new java.io.File(s"$path/views/$name")
      d.listFiles().filter(_.getName.startsWith("part-"))
        .map(f => f.getName -> f.lastModified()).toMap
    }
    val cleanBefore = mtimes("v_rf_mth")
    Thread.sleep(1100) // mtime resolution
    // a delta lands; the caller knows only v_rf_ls was refreshed
    val lat2 = lat.copy(
      views = lat.views.updated("v_rf_ls", lat.views("v_rf_ls")._1 ->
        view("rf", "ls")._2),
      stats = lat.stats.updated("v_rf_ls", lat.stats("v_rf_ls")))
    Views.saveLattice(lat2, path, dirty = Some(Set("v_rf_ls")))
    assert(mtimes("v_rf_mth") == cleanBefore,
      "an undirty view's files must stay byte- and mtime-stable")
    // the reloaded lattice is consistent and routes
    val reloaded = Views.loadLattice(spark, path)
    assert(reloaded.stats == lat2.stats)
    assert(Views.routeFromStats(reloaded, Seq("rf"),
      Seq("cnt", "sum_cents")).count() > 0)
    intercept[IllegalArgumentException] {
      Views.saveLattice(lat2, path, dirty = Some(Set("nope")))
    }
  }

  test("saveLattice converse guard (r14 driver advisory): a view newly " +
      "added to the lattice but omitted from dirty refuses — its stats " +
      "row would have no persisted frame and poison the next load") {
    val lat = Views.materialize(Map("v_rf_ls" -> view("rf", "ls")))
    val path = java.nio.file.Files
      .createTempDirectory("views_converse").toString
    Views.saveLattice(lat, path)
    // a new view appears in memory; the caller forgets to mark it dirty
    val lat2 = Views.materialize(Map(
      "v_rf_ls" -> view("rf", "ls"),
      "v_rf_mth" -> view("rf", "mth")))
    val ex = intercept[IllegalArgumentException] {
      Views.saveLattice(lat2, path, dirty = Some(Set("v_rf_ls")))
    }
    assert(ex.getMessage.contains("v_rf_mth"), ex.getMessage)
    // naming the new view (or a full save) both work, and the store
    // then loads consistently
    Views.saveLattice(lat2, path, dirty = Some(Set("v_rf_ls", "v_rf_mth")))
    val reloaded = Views.loadLattice(spark, path)
    assert(reloaded.views.keySet == Set("v_rf_ls", "v_rf_mth"))
    // with both frames persisted, a later delta may again name only one
    Views.saveLattice(lat2, path, dirty = Some(Set("v_rf_mth")))
    assert(Views.loadLattice(spark, path).views.keySet ==
      Set("v_rf_ls", "v_rf_mth"))
  }
}
