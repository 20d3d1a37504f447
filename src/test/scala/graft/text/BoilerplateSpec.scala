package graft.text

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** Densitometric boilerplate classification (q335's rule tier). */
class BoilerplateSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("densitometricContent: context rescues the short sandwiched " +
      "block, a 40-word paragraph after a linky nav needs the >40 " +
      "rule, link-dense block dies, chrome dies") {
    val body = (1 to 45).map(i => s"w$i").mkString(" ")
    val html = "<html><body><nav><a>home about contact</a></nav>" +
      s"<div>$body</div><p>Share this now</p>" +
      "<p><a>x y z</a></p></body></html>"
    val feats = Seq(0L -> html).toDF("doc_id", "html")
      .select(col("doc_id"),
        explode(HtmlExtract.blockDensityUdf(col("html"))).as("b"))
      .select(col("doc_id"), col("b._1").cast("long").as("block_idx"),
        col("b._2").cast("long").as("words"),
        col("b._3").cast("long").as("text_len"),
        col("b._4").cast("long").as("link_len"),
        col("b._5").cast("long").as("chrome"))
    val w = Window.partitionBy("doc_id").orderBy("block_idx")
    val got = feats
      .withColumn("pw", coalesce(lag("words", 1).over(w), lit(0L)))
      .withColumn("pt", coalesce(lag("text_len", 1).over(w), lit(0L)))
      .withColumn("pl", coalesce(lag("link_len", 1).over(w), lit(0L)))
      .withColumn("nw", coalesce(lead("words", 1).over(w), lit(0L)))
      .withColumn("content",
        HtmlExtract.densitometricContent(col("words"), col("text_len"),
          col("link_len"), col("pw"), col("pt"), col("pl"), col("nw"),
          col("chrome")))
      .select("block_idx", "words", "content")
      .as[(Long, Long, Boolean)].collect().toSeq.sortBy(_._1)
    // nav: chrome → false. div: prev is FULLY linky (9·l > 5·t) so the
    // strict branch applies — 45 > 40 → content (44 words would die).
    // "Share this now": prev is the 45-word div (pl = 0) → first
    // branch, pw > 4 rescues it. last p: 3·link > text → dies.
    assert(got == Seq((0L, 3L, false), (1L, 45L, true),
      (2L, 3L, true), (3L, 3L, false)), s"got $got")
  }
}
