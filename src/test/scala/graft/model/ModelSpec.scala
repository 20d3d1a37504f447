package graft.model

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase
import graft.ingest.ChunkPipeline

class ModelSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("typedChunkPoints yields a Dataset[ChunkPoint] with intact fields") {
    val docs = Seq(
      (42L, (1 to 60).map(i => s"Sentence number $i of the opinion ends here.").mkString(" ")))
      .toDF("doc_id", "text")
    val ds = ChunkPipeline.typedChunkPoints(spark, docs)
    val pts: Seq[ChunkPoint] = ds.collect().toSeq
    assert(pts.nonEmpty)
    pts.foreach { p =>
      assert(p.doc_id == 42L)
      assert(p.id == graft.text.Uuid5(p.chunk_id))
      assert(p.dense_vec.length == 384)
      assert(p.tokens.nonEmpty)
      assert(p.chunk_text.length >= 400)
    }
    // typed transformations compile against fields
    val total = ds.map(p => p.tokens.size).reduce(_ + _)
    assert(total > 0)
  }
}
