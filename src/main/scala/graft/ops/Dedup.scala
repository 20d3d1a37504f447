package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for large-scale training-data pipelines.
  *
  * Five families, each designed around its shuffle profile at 100 TB:
  *
  *  - exact: one hash-groupBy shuffle on a 16-byte digest (not the text).
  *  - MinHash+LSH: signatures are narrow per-row work; only the
  *    (band_id, band_hash) → candidate-pair join shuffles, and it
  *    shuffles keys not documents.
  *  - SimHash: narrow per-row signature; near-dup = same signature
  *    bucket (or Hamming-adjacent probes).
  *  - n-gram Jaccard: verification step on candidate pairs only — never
  *    the O(n²) cross join.
  *  - embedding cosine: blocked self-join (block key caps pair count).
  */
object Dedup {

  /** Exact dedup: keep the first (min orderCol) row per normalized text
    * digest. Shuffles 16-byte keys, not documents. */
  def exact(df: DataFrame, textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val w = Window.partitionBy(md5(col(textCol))).orderBy(col(idCol))
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
  }

  /** Rows that have at least one exact duplicate (audit view). */
  def exactDuplicateGroups(df: DataFrame, textCol: String = "text"): DataFrame =
    df.groupBy(md5(col(textCol)).as("text_hash"))
      .agg(count(lit(1)).as("n"), min(col("doc_id")).as("keep_id"))
      .filter(col("n") > 1)

  /** Word k-shingles of a text column (the MinHash/Jaccard unit). */
  def shingles(textCol: Column, k: Int = 3): Column = {
    val toks = split(lower(trim(textCol)), "\\s+")
    // sliding k-grams via transform over indexes; distinct for set semantics
    array_distinct(
      filter(
        transform(sequence(lit(0), greatest(size(toks) - k, lit(0))),
          i => when(size(toks) >= k, concat_ws(" ", slice(toks, i + lit(1), lit(k))))),
        x => x.isNotNull))
  }

  /** MinHash signature: for each of `numHashes` seeded hash functions,
    * the min over shingle hashes. Default hash is xxhash64 (Spark-native,
    * codegen'd); `hashFn` is pluggable so results can be reproduced by an
    * external oracle (e.g. md5-keyed). */
  def minHashSignature(shinglesCol: Column, numHashes: Int = 16,
      hashFn: (Int, Column) => Column = (seed, c) => xxhash64(lit(seed), c)): Column =
    array((0 until numHashes).map { seed =>
      array_min(transform(shinglesCol, s => hashFn(seed, s)))
    }: _*)

  /** LSH banding: split the signature into `bands` equal bands; a pair
    * sharing any band's hash is a candidate. Emits
    * (idCol, band_id, band_hash) — the only thing that shuffles. */
  def lshBands(df: DataFrame, sigCol: String, bands: Int, idCol: String = "doc_id",
      bandHash: Column => Column = c => xxhash64(c)): DataFrame = {
    val sigLen = df.select(size(col(sigCol))).first().getInt(0)
    val rowsPerBand = sigLen / bands
    df.select(col(idCol), posexplode(
        array((0 until bands).map { b =>
          bandHash(slice(col(sigCol), b * rowsPerBand + 1, rowsPerBand)).cast("string")
        }: _*)).as(Seq("band_id", "band_hash")))
  }

  /** Candidate near-dup pairs from LSH buckets (id1 < id2, distinct). */
  def lshCandidates(bandsDf: DataFrame, idCol: String = "doc_id"): DataFrame = {
    val a = bandsDf.select(col("band_id"), col("band_hash"), col(idCol).as("id1"))
    val b = bandsDf.select(col("band_id"), col("band_hash"), col(idCol).as("id2"))
    a.join(b, Seq("band_id", "band_hash"))
      .filter(col("id1") < col("id2"))
      .select("id1", "id2").distinct()
  }

  /** Full MinHash-LSH near-dup pipeline: shingle → sign → band →
    * candidate pairs → exact Jaccard verification ≥ threshold. */
  def minHashNearDups(df: DataFrame, textCol: String = "text",
      idCol: String = "doc_id", numHashes: Int = 16, bands: Int = 4,
      shingleK: Int = 3, jaccardThreshold: Double = 0.8,
      hashFn: (Int, Column) => Column = (seed, c) => xxhash64(lit(seed), c),
      bandHash: Column => Column = c => xxhash64(c)): DataFrame = {
    val sh = df.select(col(idCol), shingles(col(textCol), shingleK).as("sh"))
      .filter(size(col("sh")) > 0)
    val sig = sh.withColumn("sig", minHashSignature(col("sh"), numHashes, hashFn))
    val cands = lshCandidates(lshBands(sig, "sig", bands, idCol, bandHash), idCol)
    val left = sh.select(col(idCol).as("id1"), col("sh").as("sh1"))
    val right = sh.select(col(idCol).as("id2"), col("sh").as("sh2"))
    cands.join(left, "id1").join(right, "id2")
      .withColumn("inter", size(array_intersect(col("sh1"), col("sh2"))))
      .withColumn("jaccard",
        col("inter").cast("double") /
          (size(col("sh1")) + size(col("sh2")) - col("inter")))
      .filter(col("jaccard") >= jaccardThreshold)
      .select(col("id1"), col("id2"), col("jaccard"))
  }

  /** SimHash signature (`bits` ≤ 32): per-token hash votes per bit;
    * sign of the vote sum sets the bit. Pure expression — codegen'd. */
  def simHash(textCol: Column, bits: Int = 32): Column = {
    val toks = split(lower(trim(textCol)), "\\s+")
    val bitCols = (0 until bits).map { b =>
      // vote_b = Σ_tokens (bit b of hash(token) ? +1 : -1)
      val votes = aggregate(toks, lit(0),
        (acc, t) => acc + when(shiftright(xxhash64(t), b).bitwiseAND(1) === 1, 1).otherwise(-1))
      when(votes > 0, lit(1L << b)).otherwise(lit(0L))
    }
    bitCols.reduce((a, b) => a + b)
  }

  /** n-gram Jaccard similarity between two token-array columns
    * (set semantics; integer arithmetic — deterministic). */
  def jaccard(a: Column, b: Column): Column = {
    val da = array_distinct(a); val db = array_distinct(b)
    val inter = size(array_intersect(da, db))
    inter.cast("double") / (size(da) + size(db) - inter)
  }

  /** Embedding-cosine near-dup pairs: blocked self-join (same blockCol)
    * so the pair count stays bounded; exact cosine verification. */
  def embeddingNearDups(df: DataFrame, vecCol: String = "embedding",
      idCol: String = "vec_id", blockCol: String = "label",
      threshold: Double = 0.9): DataFrame = {
    import graft.functions.GraftFunctions.vecCosine
    val a = df.select(col(blockCol).as("blk"), col(idCol).as("id1"), col(vecCol).as("v1"))
    val b = df.select(col(blockCol).as("blk"), col(idCol).as("id2"), col(vecCol).as("v2"))
    a.join(b, Seq("blk"))
      .filter(col("id1") < col("id2"))
      .withColumn("cos", round(vecCosine(col("v1"), col("v2")), 6))
      .filter(col("cos") >= threshold)
      .select(col("id1"), col("id2"), col("cos"))
  }
}
