package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** `SparkSessionExtensions` injection point: lets a cluster load graft's
  * native expressions at session build time —
  *
  * {{{
  * spark-submit --conf spark.sql.extensions=graft.functions.GraftExtensions ...
  * }}}
  *
  * — so `SELECT vec_cosine(a, b)` works in plain `spark.sql` with no
  * driver-side `GraftFunctions.register` call. Only the native Catalyst
  * expressions are injectable here (extensions run before any session
  * exists, so UDF closures over session state cannot be); the UDF family
  * still registers per-session via [[GraftFunctions.register]], which
  * remains idempotent and safe to call as well.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage,
      "", "", "", "math_funcs", "1.0.0", "", "built-in")

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((FunctionIdentifier("vec_cosine"),
      info("vec_cosine", "vec_cosine(a, b) - cosine similarity of two float arrays"),
      (exprs: Seq[Expression]) => CosineSimilarity(exprs(0), exprs(1))))
    ext.injectFunction((FunctionIdentifier("vec_dot"),
      info("vec_dot", "vec_dot(a, b) - dot product of two float arrays"),
      (exprs: Seq[Expression]) => DotProduct(exprs(0), exprs(1))))
    ext.injectFunction((FunctionIdentifier("hamming64"),
      info("hamming64", "hamming64(a, b) - popcount of XOR of two longs"),
      (exprs: Seq[Expression]) => Hamming64(exprs(0), exprs(1))))
  }
}
