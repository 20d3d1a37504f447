package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session factory + table helpers shared by entrypoints and tests. */
object GraftSession {

  def build(cpus: String = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")): SparkSession = {
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.register(spark)
    // announce which embedder is live (self-healing ONNX detection —
    // graft.embed.Embedders): a session with a runtime jar + model
    // serves real vectors with zero code change, and every session log
    // states which implementation produced its embeddings
    val (_, embedderLive) = graft.embed.Embedders.detect(spark)
    org.slf4j.LoggerFactory.getLogger("graft.embed")
      .info(s"embedder live: $embedderLive")
    spark
  }

  /** Read one driver-generated table from a scale-factor dir. */
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")
}
