package graft.index

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** snapshotDiff: the version-bump audit (added/removed/changed; silence
  * on unchanged; schema evolution counted as change only for non-null
  * values of the exclusive column). */
class SnapshotDiffSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def tmp(): String =
    Files.createTempDirectory("graft_snapdiff").toString + "/idx"

  private def diff(path: String, a: Long, b: Long): Set[(String, String)] =
    Snapshots.snapshotDiff(spark, path, a, b)
      .as[(String, String)].collect().toSet

  test("added / removed / changed / unchanged classification") {
    val path = tmp()
    Snapshots.upsertVersioned(spark,
      Seq(("a", "a1"), ("b", "b1"), ("c", "c1")).toDF("id", "payload"), path)
    Snapshots.upsertVersioned(spark,
      Seq(("b", "b2"), ("d", "d2")).toDF("id", "payload"), path)
    Snapshots.deleteIdsVersioned(spark, Seq("a").toDF("id"), path)

    assert(diff(path, 1, 2) == Set("b" -> "changed", "d" -> "added"))
    assert(diff(path, 2, 3) == Set("a" -> "removed"))
    // reverse direction flips the verbs
    assert(diff(path, 2, 1) == Set("b" -> "changed", "d" -> "removed"))
    // self-diff is empty
    assert(diff(path, 2, 2).isEmpty)
  }

  test("null-safe payload compare and schema evolution") {
    val path = tmp()
    Snapshots.upsertVersioned(spark,
      Seq(("a", Option.empty[String]), ("b", Some("x")))
        .toDF("id", "payload"), path)
    // null → null is unchanged; null → value is changed
    Snapshots.upsertVersioned(spark,
      Seq(("a", Option.empty[String]), ("b", Option.empty[String]))
        .toDF("id", "payload"), path)
    assert(diff(path, 1, 2) == Set("b" -> "changed"))
    // v3 adds a column: ids with a non-null value there are changed,
    // ids where the new column is null are not
    Snapshots.replaceVersioned(spark,
      Seq(("a", Option.empty[String], Some("t1")),
        ("b", Option.empty[String], Option.empty[String]))
        .toDF("id", "payload", "tag"), path)
    assert(diff(path, 2, 3) == Set("a" -> "changed"))
  }
}
