package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Schema-evolution reads over parquet generations.
  *
  * Long-lived corpora accrete columns: an early ingest generation wrote
  * (doc_id, lang), a later one added n_chars, a future one will add a
  * quality score. A pipeline that re-reads the whole corpus must see ONE
  * frame with the union schema — older generations null-filled on the
  * columns they predate — without rewriting history (at 100 TB a
  * backfill rewrite is the thing you architect to avoid).
  *
  * Spark's native `mergeSchema` does exactly this when asked: schema
  * reconciliation unions field sets by name, widens compatible types,
  * and fails loudly on genuine conflicts (same name, incompatible
  * types) rather than guessing. The merge cost is footer reads only —
  * distributed across the cluster, one footer per file, no data pages —
  * and is paid once at planning; scans afterwards still prune columns
  * and push filters per generation as usual.
  */
object EvolvingParquet {

  /** All `paths` (each a parquet directory, typically one ingest
    * generation) as one DataFrame with the union-by-name schema; rows
    * from generations that predate a column carry null there. */
  def readMerged(spark: SparkSession, paths: Seq[String]): DataFrame = {
    require(paths.nonEmpty, "need at least one generation to read")
    spark.read.option("mergeSchema", "true").parquet(paths: _*)
  }
}
