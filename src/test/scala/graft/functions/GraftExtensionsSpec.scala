package graft.functions

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class GraftExtensionsSpec extends AnyFunSuite with SparkTestBase {

  test("extensions inject vec_cosine/hamming64 into a fresh session, no register() call") {
    val base = spark // force the shared session (and its context) up first
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s = SparkSession.builder()
        .master("local[2]")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      // NOTE: never s.stop() here — SparkSession.stop() stops the shared
      // SparkContext underneath every other suite. The extra session is
      // just left to the JVM.
      assert(s ne base) // a genuinely new session on the shared context
      val cos = s.sql(
        "SELECT vec_cosine(CAST(array(1.0, 0.0) AS ARRAY<FLOAT>), " +
          "CAST(array(1.0, 0.0) AS ARRAY<FLOAT>))").first().getDouble(0)
      assert(math.abs(cos - 1.0) < 1e-12)
      assert(s.sql("SELECT hamming64(0L, 7L)").first().getInt(0) == 3)
      // strict input typing: misuse is an analysis error, not an
      // executor-side ClassCastException (and not a silent null)
      val err = intercept[org.apache.spark.sql.AnalysisException] {
        s.sql("SELECT hamming64('a', 'b')").collect()
      }
      assert(err.getMessage.toLowerCase.contains("hamming64"))
    } finally {
      SparkSession.setDefaultSession(base)
      SparkSession.setActiveSession(base)
    }
  }
}
