package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** V4 — native Catalyst expressions for the vector hot path.
  *
  * The reference's cosine distance lives inside its vector store
  * (`/root/reference/data-ingestion/qdrant_manager.py:24`); here it is a
  * whole-stage-codegen'd scalar over `array<float>` columns so the dense
  * top-k scan (SURVEY.md T2) stays inside one codegen span instead of
  * paying per-row UDF serialization.
  */
abstract class VectorBinaryExpression extends BinaryExpression {
  // Inputs must already be array<float> — the Column helpers in
  // [[GraftFunctions]] insert the cast, keeping this expression simple.
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
}

/** `dot(a, b)` over two float arrays (null if lengths differ). */
case class DotProduct(left: Expression, right: Expression) extends VectorBinaryExpression {
  override def prettyName: String = "vec_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getFloat(i).toDouble * y.getFloat(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) { ${ev.isNull} = true; } else {
         |  double acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    acc += (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |  }
         |  ${ev.value} = acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** `hamming64(a, b)` — popcount of the XOR of two longs. The SimHash
  * radius-join hot path: a banded self-join verifies millions of
  * candidate pairs with this predicate, so it must stay inside the
  * whole-stage-codegen span (one XOR + POPCNT per pair), not a UDF with
  * per-row boxing. */
case class Hamming64(left: Expression, right: Expression) extends BinaryExpression
    with ExpectsInputTypes {
  override def prettyName: String = "hamming64"
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = left.nullable || right.nullable
  // SQL-exposed (GraftExtensions): strict input types, so a misuse like
  // hamming64('a','b') fails at analysis time, not as an executor-side
  // ClassCastException. Strict (no implicit cast) on purpose: the
  // default-mode string→bigint coercion would turn bad input into
  // silent nulls; callers with int signatures cast explicitly.
  override def inputTypes: Seq[DataType] = Seq(LongType, LongType)

  override def nullSafeEval(a: Any, b: Any): Any =
    java.lang.Long.bitCount(a.asInstanceOf[Long] ^ b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"java.lang.Long.bitCount($a ^ $b)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** `cosine(a, b) = dot / (|a| |b|)` (null on length mismatch or zero norm). */
case class CosineSimilarity(left: Expression, right: Expression) extends VectorBinaryExpression {
  override def prettyName: String = "vec_cosine"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var dot = 0.0; var nx = 0.0; var ny = 0.0
    var i = 0
    while (i < n) {
      val xv = x.getFloat(i).toDouble
      val yv = y.getFloat(i).toDouble
      dot += xv * yv; nx += xv * xv; ny += yv * yv
      i += 1
    }
    if (nx == 0.0 || ny == 0.0) null
    else dot / (math.sqrt(nx) * math.sqrt(ny))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) { ${ev.isNull} = true; } else {
         |  double dot = 0.0, nx = 0.0, ny = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    double xv = (double) $a.getFloat($i);
         |    double yv = (double) $b.getFloat($i);
         |    dot += xv * yv; nx += xv * xv; ny += yv * yv;
         |  }
         |  if (nx == 0.0 || ny == 0.0) { ${ev.isNull} = true; }
         |  else { ${ev.value} = dot / (java.lang.Math.sqrt(nx) * java.lang.Math.sqrt(ny)); }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Shared Morton interleave kernel — one static call site usable from
  * both the interpreted path and generated Java. */
object Morton {
  def interleave(a: Long, b: Long, bits: Int): Long = {
    if (a < 0 || b < 0)
      throw new IllegalArgumentException(
        s"zValue needs non-negative inputs, got ($a, $b)")
    var z = 0L
    var i = 0
    while (i < bits) {
      z |= ((a >> i) & 1L) << (2 * i)
      z |= ((b >> i) & 1L) << (2 * i + 1)
      i += 1
    }
    z
  }
}

object Hilbert {
  /** The xy2d Hilbert index (top-down level walk with flip-and-swap
    * frame rotation). Same contract as [[Morton.interleave]]: inputs
    * non-negative, low `bits` of each; loud reject otherwise. */
  def index(a: Long, b: Long, bits: Int): Long = {
    if (a < 0 || b < 0)
      throw new IllegalArgumentException(
        s"hilbertValue needs non-negative inputs, got ($a, $b)")
    var x = a
    var y = b
    var d = 0L
    var s = 1L << (bits - 1)
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3L * rx) ^ ry)
      if (ry == 0L) {
        if (rx == 1L) { x = s - 1 - x; y = s - 1 - y }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }
}

/** `hilbert_index(a, b)` — the Hilbert clustering key as a native
  * codegen'd expression, [[MortonInterleave]]'s locality upgrade:
  * consecutive indices are always grid-adjacent, so range-partitioned
  * files span tighter rectangles and min/max pruning cuts deeper. A
  * Column-algebra fold of the xy2d walk is NOT an option here: each
  * level reads the previous level's (x, y) several times, so the
  * expression tree grows ~5^bits and Catalyst OOMs analyzing it
  * (observed at bits = 10) — the imperative loop belongs in compiled
  * code riding the codegen span, exactly like Morton. */
case class HilbertIndex(left: Expression, right: Expression, bits: Int)
    extends BinaryExpression with ExpectsInputTypes {
  override def prettyName: String = "hilbert_index"
  override def dataType: DataType = LongType
  override def nullable: Boolean = left.nullable || right.nullable
  override def inputTypes: Seq[DataType] = Seq(LongType, LongType)

  override def nullSafeEval(a: Any, b: Any): Any =
    Hilbert.index(a.asInstanceOf[Long], b.asInstanceOf[Long], bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.Hilbert.index($a, $b, $bits)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** `morton_interleave(a, b)` — the Z-order clustering key as a native
  * codegen'd expression. The Z-order WRITE path evaluates this once per
  * row over the whole table being laid out, so it must ride the
  * whole-stage-codegen span like any other scan projection — a boxed
  * Long UDF there costs serialization on exactly the 100 TB-sized pass
  * the layout tier exists for. Null inputs propagate as null (the
  * BinaryExpression contract — a null key must not Z-sort to the
  * origin); negative inputs fail loudly, matching the documented
  * [[graft.ops.Layout.zValue]] precondition. */
case class MortonInterleave(left: Expression, right: Expression, bits: Int)
    extends BinaryExpression with ExpectsInputTypes {
  override def prettyName: String = "morton_interleave"
  override def dataType: DataType = LongType
  override def nullable: Boolean = left.nullable || right.nullable
  override def inputTypes: Seq[DataType] = Seq(LongType, LongType)

  override def nullSafeEval(a: Any, b: Any): Any =
    Morton.interleave(a.asInstanceOf[Long], b.asInstanceOf[Long], bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.Morton.interleave($a, $b, $bits)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}
