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

  /** Int8 serving-recall audit — closes the loop on
    * [[scalarQuantize]]: ranks the corpus for one query by the pure
    * INTEGER dot product of int8 codes (the arithmetic a quantized
    * serving tier actually executes — 4× less memory bandwidth than
    * float, SIMD-friendly) and flags which of the quantized top-k
    * survive in the exact float-cosine top-k. Per-vector symmetric
    * scaling means code dot products rank by dot/(m_a·m_b) rather
    * than cosine — exactly the distortion this audit measures; ties
    * break by id both sides. Scale shape: the d query codes broadcast,
    * the integer dot is one codegen map pass + id-keyed aggregate,
    * both top-ks are TakeOrderedAndProject — nothing corpus-sized
    * ever sorts globally. Returns the quantized top-k as
    * (rn, vec_id, dot_q, in_exact); Σ in_exact / k is recall@k. */
  def int8RecallAudit(emb: DataFrame, queryId: Long, k: Int = 10,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    require(k >= 1, s"k must be positive, got $k")
    import org.apache.spark.sql.expressions.Window
    val codes = scalarQuantize(emb, idCol, vecCol)
    val qv = codes.filter(col("vec_id") === queryId)
      .select(col("i"), col("q").as("qv"))
    val topQ = codes.join(broadcast(qv), "i")
      .groupBy("vec_id").agg(sum(col("q") * col("qv")).as("dot_q"))
      .orderBy(desc("dot_q"), col("vec_id")).limit(k)
    val query = emb.filter(col(idCol) === queryId)
      .select(col(vecCol)).first().getSeq[Float](0).toArray
    val exact = graft.ops.Similarity
      .bruteForceTopK(emb, query, k, vecCol, idCol)
      .select(col(idCol).as("vec_id"), lit(1L).as("in_exact"))
    val w = Window.orderBy(desc("dot_q"), col("vec_id"))
    topQ.withColumn("rn", row_number().over(w).cast("long"))
      .join(exact, Seq("vec_id"), "left")
      .select(col("rn"), col("vec_id"), col("dot_q"),
        coalesce(col("in_exact"), lit(0L)).as("in_exact"))
  }

  /** Binary (sign-bit) quantization recall audit — the 1-bit extreme
    * of the quantization dial next to [[int8RecallAudit]] (the move
    * behind vector-DB "binary quantization": 32× smaller codes, XOR +
    * popcount distance, rescore survivors with full floats): each
    * dimension contributes sign(x) as one bit, packed into 32-bit
    * words (bit 63 is deliberately never used — engines disagree on
    * 1<<63 overflow), Hamming distance = Σ_w popcount(code_w XOR
    * query_w), and the audit reports how much of the exact
    * float-cosine top-k the Hamming top-k keeps. Ties break by id on
    * both sides.
    *
    * Scale shape: packing is one posexplode + (id, word)-keyed bit_or
    * with map-side combine (bit_or is the overflow-free aggregate —
    * a SUM of shifted bits would wrap differently per engine); the
    * query's ≤ d/32 words broadcast; both top-ks are
    * TakeOrderedAndProject. Returns (rn, vec_id, hamming, in_exact);
    * Σ in_exact / k is recall@k. */
  def binaryRecallAudit(emb: DataFrame, queryId: Long, k: Int = 10,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    require(k >= 1, s"k must be positive, got $k")
    import org.apache.spark.sql.expressions.Window
    val spark = emb.sparkSession
    val dims = emb.select(size(col(vecCol))).head().getInt(0)
    val nWords = (dims + 31) / 32
    val bits = emb
      .select(col(idCol).as("vec_id"),
        posexplode(col(vecCol)).as(Seq("i", "v")))
      .filter(col("v") > 0f)
      .groupBy(col("vec_id"), expr("i div 32").as("w"))
      .agg(expr("bit_or(shiftleft(1L, i % 32))").as("code"))
    val codes = emb.select(col(idCol).as("vec_id"))
      .crossJoin(broadcast(spark.range(nWords).select(col("id").as("w"))))
      .join(bits, Seq("vec_id", "w"), "left")
      .select(col("vec_id"), col("w"),
        coalesce(col("code"), lit(0L)).as("code"))
    val qc = broadcast(codes.filter(col("vec_id") === queryId)
      .select(col("w"), col("code").as("qc")))
    val topH = codes.join(qc, "w")
      .groupBy("vec_id")
      .agg(sum(expr("bit_count(code ^ qc)")).as("hamming"))
      .orderBy(col("hamming"), col("vec_id")).limit(k)
    val query = emb.filter(col(idCol) === queryId)
      .select(col(vecCol)).first().getSeq[Float](0).toArray
    val exact = graft.ops.Similarity
      .bruteForceTopK(emb, query, k, vecCol, idCol)
      .select(col(idCol).as("vec_id"), lit(1L).as("in_exact"))
    val w = Window.orderBy(col("hamming"), col("vec_id"))
    topH.withColumn("rn", row_number().over(w).cast("long"))
      .join(exact, Seq("vec_id"), "left")
      .select(col("rn"), col("vec_id"), col("hamming"),
        coalesce(col("in_exact"), lit(0L)).as("in_exact"))
  }

  /** Top principal component by power iteration — EXACT-INTEGER end
    * to end, so any engine replays it bit-for-bit: components enter as
    * micro ints (one per-element round, order-free), the d×d second-
    * moment matrix accumulates in integer sums (map-side partial
    * combine — only d² rows per partition ever cross the exchange, the
    * scale shape that survives 100 TB), the covariance numerator
    * M_ij = (n·Σxy − Σx·Σy) div n² is exact BigInt arithmetic, and
    * each of the `iters` mat-vec steps renormalizes by max-|component|
    * with truncating division (the DuckDB `//` contract). Seed is
    * e₀ (first coordinate) — loud-fails if dimension 0 carries no
    * signal rather than silently returning a zero vector.
    *
    * The d×d matrix and the iteration itself are a BOUNDED driver
    * read/loop (d²-sized, the IVF-fit contract — never corpus-sized);
    * everything row-scale stays distributed. PCA here is the
    * whitening/compression fit BEFORE indexing — the learned direction
    * pairs with [[truncateRenorm]]/[[randomProject]] as the third
    * dimensionality dial, the one that looks at the data. Returns
    * (dim_i, v_u6): the component in micro units, max-normalized. */
  def pcaPowerIteration(emb: DataFrame, dim: Int, iters: Int = 8,
      vecCol: String = "embedding"): DataFrame =
    pcaFromMoments(momentCounts(emb, vecCol), dim, iters)

  /** The additive moment table behind [[pcaFromMoments]]: second
    * moments as (i, j, Σxᵢxⱼ) rows, per-dim sums as (i, −1, Σxᵢ), the
    * row count as (−1, −1, n) — one schema, every row a plain integer
    * SUM, so per-batch tables UNION into exactly the full-corpus
    * table (the q218 incremental-maintenance contract: no sketch, no
    * error term — incremental ≡ batch bit-for-bit). Components enter
    * as micro ints (one per-element round, order-free); the d²
    * aggregate partial-combines map-side. */
  def momentCounts(emb: DataFrame,
      vecCol: String = "embedding"): DataFrame = {
    val e1 = emb.select(col(vecCol).as("arr"),
        posexplode(col(vecCol)).as(Seq("i", "x")))
      .select(col("arr"), col("i").cast("long").as("i"),
        round(col("x").cast("double") * 1000000, 0).cast("long").as("xi"))
    val ms = e1
      .select(col("i"), col("xi"),
        posexplode(col("arr")).as(Seq("j", "y")))
      .withColumn("xj",
        round(col("y").cast("double") * 1000000, 0).cast("long"))
      .groupBy(col("i"), col("j").cast("long").as("j"))
      .agg(sum(col("xi") * col("xj")).as("s"))
    val sx = e1.groupBy("i").agg(sum("xi").as("s"))
      .select(col("i"), lit(-1L).as("j"), col("s"))
    val n = emb.select(lit(-1L).as("i"), lit(-1L).as("j"))
      .groupBy("i", "j").agg(count(lit(1)).as("s"))
    ms.select("i", "j", "s").unionByName(sx).unionByName(n)
  }

  /** Drive the [[pcaPowerIteration]] BigInt loop from a (possibly
    * batch-unioned) [[momentCounts]] table — the merge aggregate
    * re-sums per (i, j) key, so the result is identical whether the
    * moments came from one pass or from incremental maintenance. */
  def pcaFromMoments(moments: DataFrame, dim: Int,
      iters: Int = 8): DataFrame = {
    require(dim >= 1 && iters >= 1, s"bad dim/iters: $dim/$iters")
    val merged = moments.groupBy("i", "j").agg(sum("s").as("s"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    val n = BigInt(merged.getOrElse((-1L, -1L), 0L))
    require(n > 0, "empty moment table")
    val m = Array.tabulate(dim, dim) { (i, j) =>
      (n * BigInt(merged.getOrElse((i.toLong, j.toLong), 0L)) -
        BigInt(merged.getOrElse((i.toLong, -1L), 0L)) *
          BigInt(merged.getOrElse((j.toLong, -1L), 0L))) /
        (n * n)
    }
    var v = Array.tabulate(dim)(i => if (i == 0) BigInt(1000000) else BigInt(0))
    for (_ <- 1 to iters) {
      val w = Array.tabulate(dim) { i =>
        (0 until dim).foldLeft(BigInt(0))((acc, j) => acc + m(i)(j) * v(j))
      }
      val mx = w.map(_.abs).max
      require(mx > 0,
        "power iteration collapsed to zero — dimension 0 carries no signal")
      v = w.map(_ * 1000000 / mx)
    }
    val spark = moments.sparkSession
    spark.createDataFrame(
        (0 until dim).map(i => (i.toLong, v(i).toLong)))
      .toDF("dim_i", "v_u6")
  }

  /** The Rademacher sign for JL projection cell (inDim i, outDim j):
    * +1 when the first hex digit of md5("i_j") is 0-7, −1 on 8-f — a
    * fair coin any engine reproduces from its own md5. */
  private[graft] def jlSign(i: Int, j: Int): Int = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val h = md.digest(s"${i}_$j".getBytes("UTF-8"))
    if (((h(0) >> 4) & 0xf) < 8) 1 else -1
  }

  /** Johnson–Lindenstrauss random projection with a DETERMINISTIC
    * Rademacher (±1) matrix: project `dim`-d embeddings down to
    * `outDims` via `p_j = Σ_i sign(i,j) · round(x_i · 10^6)` — exact
    * integer arithmetic after the one rounding step, so the projection
    * is bit-reproducible on any engine with md5 (the Achlioptas 2001
    * database-friendly JL construction; the caller divides by 10^6 and
    * by √outDims if it wants calibrated distances).
    *
    * This is the storage/bandwidth dial BEFORE indexing: at 100 TB a
    * 64-d float corpus projected to 16-d is a 4× scan-cost cut for
    * LSH/IVF candidate generation, with distances preserved to the JL
    * bound. The pass is map-side only — the ±1 matrix is a literal
    * folded into whole-stage codegen, nothing shuffles — and output is
    * row form (id, out_dim, proj) like the rest of this module.
    *
    * Matrix size is `dim × outDims` signs computed ONCE on the driver
    * (dimension-scale, thousands of cells — never per row: md5-per-cell
    * inside the row loop would put a hash in the hot path). */
  def randomProject(emb: DataFrame, dim: Int, outDims: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    require(outDims >= 1 && dim >= 1, s"bad dims: $dim -> $outDims")
    val xi = transform(col(vecCol),
      x => round(x.cast("double") * 1e6).cast("long"))
    val projCols = (0 until outDims).map { j =>
      val signs = array((0 until dim).map(i => lit(jlSign(i, j).toLong)): _*)
      aggregate(
        zip_with(col("__xi"), signs, (x, s) => x * s),
        lit(0L), (acc, v) => acc + v).as(s"p$j")
    }
    emb.select(col(idCol), col(vecCol))
      .withColumn("__xi", xi)
      .select(col(idCol) +: projCols: _*)
      .select(col(idCol), posexplode(array((0 until outDims).map(j =>
        col(s"p$j")): _*)).as(Seq("out_dim", "proj")))
      .withColumn("out_dim", col("out_dim").cast("long"))
  }
}
