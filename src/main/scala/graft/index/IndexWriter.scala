package graft.index

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** S7/ST3 — idempotent index-table sink + A7 corpus stats.
  *
  * The reference gets idempotence from deterministic uuid5 point ids +
  * store-side upsert (`/root/reference/data-ingestion/data_extraction.py:288,308-311`).
  * Ours: plain-Parquet "MERGE" = union of existing + new, keep the newest
  * row per id (`row_number` on the deterministic key). On a platform with
  * Delta/Iceberg this becomes a real `MERGE INTO` keyed on `id`; the
  * logic below is the storage-agnostic fallback. At scale the table is
  * partitioned (e.g. by court/date) so the merge shuffles only changed
  * partitions.
  */
object IndexWriter {

  /** Upsert `points` into the parquet index at `path`, keyed on `id`.
    * Re-running with identical input is a no-op on row count (the Spark
    * analog of the reference's `test_duplicates` invariant). */
  def upsert(spark: SparkSession, points: DataFrame, path: String): Long = {
    import org.apache.spark.sql.expressions.Window
    val existing =
      try Some(spark.read.parquet(path)) catch { case _: Exception => None }
    val unioned = existing match {
      case Some(old) =>
        // new rows win over old on the same deterministic id
        val tagged = points.withColumn("__gen", lit(1))
          .unionByName(old.select(points.columns.map(col).toSeq: _*).withColumn("__gen", lit(0)))
        val w = Window.partitionBy(col("id")).orderBy(col("__gen").desc)
        tagged.withColumn("__rn", row_number().over(w))
          .filter(col("__rn") === 1).drop("__rn", "__gen")
      case None => points.dropDuplicates("id")
    }
    val tmp = path + "__staged"
    unioned.write.mode(SaveMode.Overwrite).parquet(tmp)
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(tmp), spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(path), true)
    fs.rename(new org.apache.hadoop.fs.Path(tmp), new org.apache.hadoop.fs.Path(path))
    spark.read.parquet(path).count()
  }

  /** A7 — per-term document frequencies + corpus size for BM25. One
    * shuffle (groupBy term); incremental at scale by unioning per-batch
    * partial stats. */
  def docFrequencies(points: DataFrame): DataFrame =
    points.select(col("id"), explode(array_distinct(col("tokens"))).as("term"))
      .groupBy("term").agg(count("*").as("df"))

  /** Bucketed index write: co-locates rows by id so id-keyed joins and
    * MERGE-style upserts shuffle neither side (bucket pruning + no
    * exchange when both sides share the bucketing). This is the
    * 100 TB-shape of the index table; the plain-parquet `upsert` above is
    * the catalog-free fallback. */
  def writeBucketed(points: DataFrame, table: String, buckets: Int = 64): Unit =
    points.write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, "id").sortBy("id")
      .format("parquet")
      .saveAsTable(table)

  /** A3 — duplicate audit: ids seen more than once (should be empty). */
  def duplicateAudit(index: DataFrame): DataFrame =
    index.groupBy("id").count().filter(col("count") > 1)
      .orderBy(col("count").desc, col("id"))
}
