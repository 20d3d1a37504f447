package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Embedding-column maintenance operators for the vector half of a
  * training/retrieval pipeline: pooling chunk embeddings up to document
  * embeddings, and int8 scalar quantization for storage.
  *
  * Both are expressed in ROW form — (id, dimension-index, value) — not
  * array form: the shuffles then carry narrow numeric triples, any engine
  * can re-derive them (the DuckDB oracle does), and at 100 TB the
  * group-by keys are (id, dim) — perfectly partitionable with no skew
  * (every vector contributes exactly `dim` rows).
  */
object VectorOps {

  /** Mean-pool embeddings per group (e.g. chunks → parent document).
    * Output: one row per (group, 1-based dimension) with the pooled
    * value rounded to 6 decimals (double accumulation; rounding absorbs
    * association-order ulps so independent engines agree). */
  def poolEmbeddings(emb: DataFrame, groupCol: String,
      vecCol: String = "embedding"): DataFrame =
    emb.select(col(groupCol).as("grp"),
        posexplode(col(vecCol)).as(Seq("pos", "x")))
      .groupBy(col("grp"), (col("pos") + 1).as("i"))
      .agg(round(avg(col("x").cast("double")), 6).as("avg_val"))

  /** Symmetric int8 scalar quantization: per vector, scale by
    * 127 / max|x| and round half-up. |q| ≤ 127 by construction (no clamp
    * needed); `floor(v + 0.5)` is used instead of round() because its
    * half-up semantics are identical in every engine, while round() ties
    * differ (half-even vs half-away). Zero vectors quantize to zeros. */
  def scalarQuantize(emb: DataFrame, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val ex = emb.select(col(idCol).as("vec_id"),
      posexplode(col(vecCol)).as(Seq("pos", "x")))
      .select(col("vec_id"), (col("pos") + 1).as("i"),
        col("x").cast("double").as("x"))
    val mx = ex.groupBy("vec_id").agg(max(abs(col("x"))).as("maxabs"))
    ex.join(mx, "vec_id")
      .select(col("vec_id"), col("i"),
        when(col("maxabs") === 0.0, lit(0L))
          .otherwise(floor(col("x") * 127.0 / col("maxabs") + 0.5).cast("long"))
          .as("q"))
  }

  /** Matryoshka (MRL) truncation: keep the first `dims` dimensions and
    * L2-renormalize — the storage/latency dial MRL-trained embedders
    * expose (half the dims ≈ most of the recall at half the ANN cost).
    * Row form (vec_id, i, xn) like its siblings; values round to 6 dp
    * (the rounding absorbs sum-order ulps in the norm, the same
    * convention as poolEmbeddings/cosine). Zero-norm prefixes emit
    * zeros rather than NaN. */
  def truncateRenorm(emb: DataFrame, dims: Int, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    require(dims >= 1, s"dims must be positive, got $dims")
    val ex = emb.select(col(idCol).as("vec_id"),
        posexplode(col(vecCol)).as(Seq("pos", "x")))
      .filter(col("pos") < dims)
      .select(col("vec_id"), (col("pos") + 1).cast("long").as("i"),
        col("x").cast("double").as("x"))
    val nrm = ex.groupBy("vec_id").agg(sqrt(sum(col("x") * col("x"))).as("nrm"))
    ex.join(nrm, "vec_id")
      .select(col("vec_id"), col("i"),
        when(col("nrm") === 0.0, lit(0.0))
          .otherwise(round(col("x") / col("nrm"), 6)).as("xn"))
  }
}
