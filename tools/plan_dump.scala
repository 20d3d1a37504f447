// Dump .explain("formatted") for named queries to plans/<tag>/<q>_<suffix>.txt
// Usage: spark-shell --jars target/scala-2.13/lawlmspark_2.13-0.1.0.jar \
//          -i tools/plan_dump.scala
// Env: PLAN_QUERIES=q181_hnsw,q211_... PLAN_TAG=r16 PLAN_SUFFIX=before
//      SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1
import java.nio.file.{Files, Paths}
import org.apache.spark.sql.execution.ExplainMode

val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
val tag = sys.env.getOrElse("PLAN_TAG", "r16")
val suffix = sys.env.getOrElse("PLAN_SUFFIX", "before")
val names = sys.env.getOrElse("PLAN_QUERIES", "").split(",").map(_.trim)
  .filter(_.nonEmpty)
graft.functions.GraftFunctions.register(spark)
Files.createDirectories(Paths.get(s"plans/$tag"))
for (q <- names) {
  try {
    val df = graft.SparkEntry.queries(q)(spark, dir)
    val txt = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
    Files.write(Paths.get(s"plans/$tag/${q}_$suffix.txt"), txt.getBytes("UTF-8"))
    println(s"[plan_dump] wrote plans/$tag/${q}_$suffix.txt (${txt.length} chars)")
  } catch {
    case e: Throwable =>
      println(s"[plan_dump] $q FAILED: ${e.getMessage}")
  }
}
System.exit(0)
