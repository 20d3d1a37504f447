package graft.plans

import scala.collection.mutable

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Descending, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

/** Whole-operator extension tier (the SURVEY preference ladder's step
  * (c)): a custom `LogicalPlan` + `SparkStrategy` + `SparkPlan` for
  * per-key top-k.
  *
  * Spark expresses per-key top-k as `row_number() OVER (PARTITION BY k
  * ORDER BY s) <= n`, which `WindowExec` executes by SORTING every
  * partition's full row set before numbering — at 100 TB that is a
  * complete sort of the corpus to keep n rows per key. This operator
  * keeps a bounded heap of n rows per key per partition instead: memory
  * is O(keys-per-partition × k), nothing is ever fully sorted, and the
  * only exchange is the same hash-by-key shuffle the window needs
  * anyway. The planner inserts that exchange automatically because the
  * exec node declares `ClusteredDistribution(keys)`.
  */
case class TopKPerKey(k: Int, keys: Seq[Expression], order: Seq[SortOrder],
    child: LogicalPlan) extends UnaryNode {
  require(k > 0, "k must be positive")
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKey =
    copy(child = newChild)
}

/** Planner rule mapping the logical node onto its exec. Registered per
  * session via [[TopK.ensureStrategy]] (or `experimental.extraStrategies`
  * directly). */
object GraftStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKey(k, keys, order, child) =>
      TopKPerKeyExec(k, keys, order, planLater(child)) :: Nil
    case _ => Nil
  }
}

case class TopKPerKeyExec(k: Int, keys: Seq[Expression], order: Seq[SortOrder],
    child: SparkPlan) extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output
  override def outputPartitioning = child.outputPartitioning
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(keys) :: Nil

  override protected def doExecute(): RDD[InternalRow] = {
    val kLocal = k
    val keysLocal = keys
    val orderLocal = order
    val childOutput = child.output
    child.execute().mapPartitions({ iter =>
      val keyProj = UnsafeProjection.create(keysLocal, childOutput)
      val ordering = GenerateOrdering.generate(orderLocal, childOutput)
      // max-heap under the sort order: head = worst of the current best
      // k, so an incoming better row evicts it in O(log k)
      val heaps = mutable.HashMap.empty[UnsafeRow, mutable.PriorityQueue[InternalRow]]
      iter.foreach { row =>
        val key = keyProj(row) // reused buffer — copy only on first sight
        val heap = heaps.get(key) match {
          case Some(h) => h
          case None =>
            val h = mutable.PriorityQueue.empty[InternalRow](ordering)
            heaps.put(key.copy(), h)
            h
        }
        if (heap.size < kLocal) heap.enqueue(row.copy())
        else if (ordering.compare(row, heap.head) < 0) {
          heap.dequeue(); heap.enqueue(row.copy())
        }
      }
      // emit each key's survivors in sort order (dequeue yields worst
      // first → reverse)
      heaps.valuesIterator.flatMap(h => h.dequeueAll.reverseIterator)
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyExec =
    copy(child = newChild)
}

/** User-facing API. */
object TopK {

  /** Idempotently register [[GraftStrategy]] on the session. */
  def ensureStrategy(spark: org.apache.spark.sql.SparkSession): Unit =
    org.apache.spark.sql.GraftSqlBridge.addStrategy(spark, GraftStrategy)

  /** Top `k` rows per key, ordered by `orderBy` — `(column, ascending)`
    * pairs evaluated in sequence. Equivalent to the
    * `row_number() OVER (...) <= k` window formulation (the oracle), but
    * executed with bounded per-key heaps instead of a full sort. */
  def perKey(df: DataFrame, keyCols: Seq[String],
      orderBy: Seq[(String, Boolean)], k: Int): DataFrame = {
    import org.apache.spark.sql.GraftSqlBridge
    val spark = df.sparkSession
    ensureStrategy(spark)
    val keys = keyCols.map(c => GraftSqlBridge.expression(df.col(c)))
    val order = orderBy.map { case (c, asc) =>
      SortOrder(GraftSqlBridge.expression(df.col(c)),
        if (asc) Ascending else Descending)
    }
    GraftSqlBridge.ofRows(spark, TopKPerKey(k, keys, order, df.queryExecution.analyzed))
  }
}
