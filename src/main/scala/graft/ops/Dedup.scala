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

  /** Word k-shingles of a text column (the MinHash/Jaccard unit).
    *
    * The token split is bound ONCE per row by wrapping it in a
    * single-element array and using the outer lambda variable — naively
    * referencing `split(...)` inside the per-index lambda re-tokenizes
    * the text for every shingle position (O(len²) interpreted eval; this
    * was a 100× slowdown on the bench corpus). */
  def shingles(textCol: Column, k: Int = 3): Column =
    element_at(
      transform(array(split(lower(trim(textCol)), "\\s+")), toks =>
        array_distinct(
          filter(
            transform(sequence(lit(0), greatest(size(toks) - k, lit(0))),
              i => when(size(toks) >= k, concat_ws(" ", slice(toks, i + lit(1), lit(k))))),
            x => x.isNotNull))),
      1)

  /** MinHash signature: for each of `numHashes` seeded hash functions,
    * the min over shingle hashes. Default hash is xxhash64 (Spark-native,
    * codegen'd); `hashFn` is pluggable so results can be reproduced by an
    * external oracle (e.g. md5-keyed). */
  def minHashSignature(shinglesCol: Column, numHashes: Int = 16,
      hashFn: (Int, Column) => Column = (seed, c) => xxhash64(lit(seed), c)): Column =
    array((0 until numHashes).map { seed =>
      array_min(transform(shinglesCol, s => hashFn(seed, s)))
    }: _*)

  /** md5-keyed MinHash signature as a compiled UDF.
    *
    * Semantically identical to `minHashSignature` with
    * `hashFn = md5("<seed>_" || shingle)` (hex-string min per seed), but
    * ~50× faster: `transform`/`array_min` are higher-order functions that
    * never enter whole-stage codegen, so the expression form pays
    * interpreter overhead per element × per seed. A deterministic scalar
    * UDF is the documented escape hatch for genuinely imperative per-row
    * loops (SURVEY.md §2.12). */
  def md5MinHashSignatureUdf(numHashes: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    udf { sh: Seq[String] =>
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = "0123456789abcdef".toCharArray
      def md5Hex(s: String): String = {
        val d = md.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        val out = new Array[Char](32)
        var i = 0
        while (i < 16) {
          out(2 * i) = hex((d(i) >> 4) & 0xf)
          out(2 * i + 1) = hex(d(i) & 0xf)
          i += 1
        }
        new String(out)
      }
      (0 until numHashes).map { seed =>
        val prefix = seed + "_"
        var min: String = null
        sh.foreach { s =>
          val h = md5Hex(prefix + s)
          if (min == null || h.compareTo(min) < 0) min = h
        }
        min
      }
    }

  /** LSH banding: split the signature into `bands` equal bands; a pair
    * sharing any band's hash is a candidate. Emits
    * (idCol, band_id, band_hash) — the only thing that shuffles. */
  def lshBands(df: DataFrame, sigCol: String, bands: Int, idCol: String = "doc_id",
      bandHash: Column => Column = c => xxhash64(c),
      sigLen: Int = -1): DataFrame = {
    // avoid a data-probing action when the caller knows the length — a
    // first() here would force a full materialization of the upstream
    // exchange just to read one array size
    val len = if (sigLen > 0) sigLen
              else df.select(size(col(sigCol))).first().getInt(0)
    val rowsPerBand = len / bands
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
      signature: (Column, Int) => Column = (sh, n) => minHashSignature(sh, n),
      bandHash: Column => Column = c => xxhash64(c),
      persistShingles: Boolean = false): DataFrame = {
    // The shingle table feeds THREE plan branches (banding + both sides
    // of the verification self-join). A hash exchange with an explicit
    // partition count spreads the CPU-heavy/byte-light hashing (AQE would
    // coalesce the byte-small exchange to one partition) and lets
    // exchange reuse share one computation; `persistShingles` pins it in
    // the storage layer instead, for callers that run the plan once and
    // want the reuse guaranteed rather than best-effort.
    val p = df.sparkSession.sparkContext.defaultParallelism
    // cheap pre-filter on token count — filtering on size(shingles) would
    // push the whole shingle expression into the scan and eval it twice
    val toks = split(lower(trim(col(textCol))), "\\s+")
    val sh0 = df.filter(size(toks) >= shingleK)
      .select(col(idCol), shingles(col(textCol), shingleK).as("sh"))
      .repartition(p, col(idCol))
    val sig0 = sh0.withColumn("sig", signature(col("sh"), numHashes))
      .repartition(p, col(idCol)) // one signature pass shared by both band-join sides
    // persist the sig table (it carries the shingles too): ALL four plan
    // consumers — two band-join sides, two verification-join sides — read
    // one materialization instead of relying on best-effort reuse
    val sig = if (persistShingles) sig0.persist() else sig0
    val cands = lshCandidates(
      lshBands(sig, "sig", bands, idCol, bandHash, sigLen = numHashes), idCol)
    val left = sig.select(col(idCol).as("id1"), col("sh").as("sh1"))
    val right = sig.select(col(idCol).as("id2"), col("sh").as("sh2"))
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
