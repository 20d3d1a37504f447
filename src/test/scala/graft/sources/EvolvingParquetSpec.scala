package graft.sources

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class EvolvingParquetSpec extends AnyFunSuite with graft.SparkTestBase {
  import spark.implicits._

  test("readMerged: union-by-name schema, old generations null-filled") {
    val dir = java.nio.file.Files.createTempDirectory("evo").toString
    // generation 1: (id, lang); generation 2 adds score
    Seq((1L, "en"), (2L, "de")).toDF("id", "lang")
      .write.parquet(s"$dir/g1")
    Seq((3L, "fr", 0.9), (4L, "en", 0.4)).toDF("id", "lang", "score")
      .write.parquet(s"$dir/g2")
    val merged = EvolvingParquet.readMerged(spark, Seq(s"$dir/g1", s"$dir/g2"))
    assert(merged.columns.sorted.toSeq == Seq("id", "lang", "score"))
    val rows = merged.select("id", "lang", "score")
      .as[(Long, String, Option[Double])].collect().toSet
    assert(rows == Set((1L, "en", None), (2L, "de", None),
      (3L, "fr", Some(0.9)), (4L, "en", Some(0.4))), rows.toString)
    // column pruning still reaches the scan when only shared columns project
    val plan = merged.select("id").queryExecution.executedPlan.toString
    assert(plan.contains("ReadSchema: struct<id:bigint>"),
      s"projection must prune to id only:\n$plan")
    intercept[IllegalArgumentException] {
      EvolvingParquet.readMerged(spark, Seq.empty)
    }
  }
}
