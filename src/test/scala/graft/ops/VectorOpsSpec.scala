package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class VectorOpsSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("poolEmbeddings averages per (group, dimension)") {
    val emb = Seq(
      (1L, Array(1.0f, 2.0f)),
      (1L, Array(3.0f, 6.0f)),
      (2L, Array(10.0f, 20.0f))).toDF("grp", "embedding")
    val out = VectorOps.poolEmbeddings(emb, "grp")
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getDouble(2)).toMap
    assert(out((1L, 1)) == 2.0 && out((1L, 2)) == 4.0)
    assert(out((2L, 1)) == 10.0 && out((2L, 2)) == 20.0)
  }

  test("scalarQuantize maps max|x| to ±127 and zero vectors to zeros") {
    val emb = Seq(
      (1L, Array(0.5f, -1.0f, 0.25f)),
      (2L, Array(0.0f, 0.0f, 0.0f))).toDF("vec_id", "embedding")
    val out = VectorOps.scalarQuantize(emb)
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(out((1L, 2)) == -127L)           // the max-magnitude element
    assert(out((1L, 1)) == 64L)             // 0.5/1.0*127 = 63.5 → half-up 64
    assert(out((1L, 3)) == 32L)             // 0.25*127 = 31.75 → 32
    assert(Seq(1, 2, 3).forall(i => out((2L, i)) == 0L))
    // bound law: nothing exceeds ±127
    assert(out.values.forall(q => q >= -127 && q <= 127))
  }

  test("weightedHashSample is deterministic, size-k, and weight-monotone in expectation") {
    val df = (1L to 500L).map(i => (i, if (i <= 250) 10L else 1000L))
      .toDF("doc_id", "n_chars")
    val s1 = Sampling.weightedHashSample(df, "doc_id", "n_chars", k = 50)
      .select("doc_id").as[Long].collect().toSet
    val s2 = Sampling.weightedHashSample(df, "doc_id", "n_chars", k = 50)
      .select("doc_id").as[Long].collect().toSet
    assert(s1 == s2 && s1.size == 50)
    // 100× heavier rows should dominate the sample
    val heavy = s1.count(_ > 250)
    assert(heavy > 40, s"expected heavy-weight rows to dominate, got $heavy/50")
  }

  test("weightedHashSample excludes null/zero/negative weights (A-ES precondition)") {
    val df = Seq((1L, Some(5L)), (2L, Some(0L)), (3L, Some(-4L)), (4L, None),
      (5L, Some(2L))).toDF("doc_id", "w")
    val got = Sampling.weightedHashSample(df, "doc_id", "w", k = 10)
      .select("doc_id").as[Long].collect().toSet
    // only the two positive-weight rows are eligible — a zero weight used
    // to produce NaN priority, which sorts above every number under desc
    assert(got == Set(1L, 5L))
  }

  test("weightedHashSample plans TakeOrderedAndProject (no global sort)") {
    val df = (1L to 100L).map(i => (i, i)).toDF("doc_id", "n_chars")
    val plan = Sampling.weightedHashSample(df, "doc_id", "n_chars", k = 10)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  test("truncateRenorm: prefix kept, unit norm, zero vectors stay zero") {
    val emb = Seq(
      (1L, Array(3.0f, 4.0f, 99.0f, 99.0f)),  // prefix (3,4) -> (0.6, 0.8)
      (2L, Array(0.0f, 0.0f, 5.0f, 5.0f)))    // zero prefix -> zeros, not NaN
      .toDF("vec_id", "embedding")
    val got = VectorOps.truncateRenorm(emb, dims = 2)
      .as[(Long, Long, Double)].collect().map(r => (r._1, r._2) -> r._3).toMap
    assert(got == Map((1L, 1L) -> 0.6, (1L, 2L) -> 0.8,
      (2L, 1L) -> 0.0, (2L, 2L) -> 0.0), got.toString)
    // renormalized prefix is unit length
    val n = math.sqrt(got((1L, 1L)) * got((1L, 1L)) + got((1L, 2L)) * got((1L, 2L)))
    assert(math.abs(n - 1.0) < 1e-9)
  }

  test("randomProject: exact integer sums, deterministic, JL norm preservation") {
    // hand-check one cell: vec (1, -1, 0, ...), proj_j = sign(0,j) - sign(1,j)
    val dim = 8
    val v = Array(1.0f, -1.0f) ++ Array.fill(dim - 2)(0.0f)
    val one = Seq((7L, v)).toDF("vec_id", "embedding")
    val got = VectorOps.randomProject(one, dim, outDims = 4)
      .as[(Long, Long, Long)].collect().map(r => r._2 -> r._3).toMap
    (0 until 4).foreach { j =>
      val want = (VectorOps.jlSign(0, j).toLong - VectorOps.jlSign(1, j)) * 1000000L
      assert(got(j.toLong) == want, s"out_dim $j: ${got(j.toLong)} != $want")
    }
    // determinism across invocations
    val again = VectorOps.randomProject(one, dim, outDims = 4)
      .as[(Long, Long, Long)].collect().map(r => r._2 -> r._3).toMap
    assert(got == again)
    // E[||p||^2] = outDims * ||x||^2 (Rademacher JL): check the mean
    // ratio over 64 deterministic pseudo-random vectors is within 30%
    val rnd = new scala.util.Random(42)
    val many = (0 until 64).map(i =>
      (i.toLong, Array.fill(16)(rnd.nextGaussian().toFloat)))
      .toDF("vec_id", "embedding")
    val norms = many.as[(Long, Array[Float])].collect()
      .map { case (id, arr) =>
        id -> arr.map(x => math.round(x.toDouble * 1e6).toDouble).map(x => x * x).sum
      }.toMap
    val projs = VectorOps.randomProject(many, 16, outDims = 8)
      .as[(Long, Long, Long)].collect()
      .groupBy(_._1).map { case (id, rows) =>
        rows.map(r => r._3.toDouble * r._3.toDouble).sum / (8.0 * norms(id))
      }
    val mean = projs.sum / projs.size
    assert(math.abs(mean - 1.0) < 0.3, s"JL norm ratio off: $mean")
  }

  test("int8RecallAudit: per-vector scaling collapses magnitude, a " +
      "low-cosine vector enters the quantized top-k and is flagged") {
    // query (1,0): every code0 saturates to 127, so ALL integer dots
    // tie at 16129 and rank by id — id2 (cos 0.8) displaces id3
    // (cos 0.96) from the quantized top-3; exact top-3 is {0,1,3}.
    val emb = Seq((0L, Seq(1f, 0f)), (1L, Seq(0.5f, 0f)),
      (2L, Seq(0.8f, -0.6f)), (3L, Seq(0.96f, 0.28f)))
      .toDF("vec_id", "embedding")
    val got = VectorOps.int8RecallAudit(emb, queryId = 0L, k = 3)
      .as[(Long, Long, Long, Long)].collect().toSeq.sortBy(_._1)
    assert(got == Seq((1L, 0L, 16129L, 1L), (2L, 1L, 16129L, 1L),
      (3L, 2L, 16129L, 0L)), s"got $got")
    intercept[IllegalArgumentException] {
      VectorOps.int8RecallAudit(emb, 0L, k = 0)
    }
  }

  test("pcaFromMoments: batch-unioned incremental moments reproduce " +
      "the one-pass result bit-for-bit, empty table loud-fails") {
    val emb = Seq((1L, Seq(1f, 1f)), (2L, Seq(2f, 2f)),
      (3L, Seq(3f, 3f)), (4L, Seq(0.5f, 0f))).toDF("vec_id", "embedding")
    val whole = VectorOps.pcaPowerIteration(emb, dim = 2)
      .as[(Long, Long)].collect().toMap
    val m1 = VectorOps.momentCounts(emb.filter(col("vec_id") <= 2))
    val m2 = VectorOps.momentCounts(emb.filter(col("vec_id") > 2))
    val incr = VectorOps.pcaFromMoments(m1.unionByName(m2), dim = 2)
      .as[(Long, Long)].collect().toMap
    assert(incr == whole, s"incremental $incr != batch $whole")
    intercept[IllegalArgumentException] {
      VectorOps.pcaFromMoments(m1.filter(lit(false)), dim = 2)
    }
  }

  test("pcaPowerIteration: diagonal-direction corpus converges to " +
      "(1,1), anti-correlated to (1,-1), zero-signal seed loud-fails") {
    val diag = Seq((1L, Seq(1f, 1f)), (2L, Seq(2f, 2f)),
      (3L, Seq(3f, 3f)), (4L, Seq(0f, 0f))).toDF("vec_id", "embedding")
    val a = VectorOps.pcaPowerIteration(diag, dim = 2)
      .as[(Long, Long)].collect().toMap
    assert(a == Map(0L -> 1000000L, 1L -> 1000000L), s"got $a")
    val anti = Seq((1L, Seq(1f, -1f)), (2L, Seq(2f, -2f)),
      (3L, Seq(0f, 0f))).toDF("vec_id", "embedding")
    val b = VectorOps.pcaPowerIteration(anti, dim = 2)
      .as[(Long, Long)].collect().toMap
    assert(b == Map(0L -> 1000000L, 1L -> -1000000L), s"got $b")
    val dead = Seq((1L, Seq(0f, 1f)), (2L, Seq(0f, 2f)))
      .toDF("vec_id", "embedding")
    intercept[IllegalArgumentException] {
      VectorOps.pcaPowerIteration(dead, dim = 2)
    }
  }

  test("binaryRecallAudit: sign packing (all-negative vector → code 0 " +
      "via the spine), exact Hamming ranks with id tie-breaks, recall " +
      "against float cosine, guards") {
    val emb = Seq(
      (0L, Array(1f, -1f, 1f, -1f)),     // code 0101 = 5
      (1L, Array(0.1f, -5f, 0.1f, 0.1f)), // code 1101 = 13 → ham 1
      (2L, Array(-1f, -1f, -1f, -1f)),   // code 0 → ham popcount(5)=2
      (3L, Array(1f, -1f, 1f, -1f)),     // duplicate of query → ham 0
      (4L, Array(-1f, 1f, -1f, 1f)))     // code 1010 → ham 4
      .toDF("vec_id", "embedding")
    val got = VectorOps.binaryRecallAudit(emb, queryId = 0L, k = 3)
      .as[(Long, Long, Long, Long)].collect().toSeq.sortBy(_._1)
    // hamming: id0 0, id3 0, id1 1 → ranks (ham, id); exact cosine
    // top-3 = {0, 3, 1} (cos 1, 1, ≈0.51) → all retained
    assert(got == Seq((1L, 0L, 0L, 1L), (2L, 3L, 0L, 1L),
      (3L, 1L, 1L, 1L)), s"got $got")
    intercept[IllegalArgumentException] {
      VectorOps.binaryRecallAudit(emb, queryId = 0L, k = 0)
    }
  }
}
