package graft.plans

import java.io.{BufferedInputStream, BufferedOutputStream, DataInputStream, DataOutputStream, EOFException, File, FileInputStream, FileOutputStream}

import scala.collection.mutable

import org.apache.spark.TaskContext
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, BaseOrdering, BoundReference, Descending, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.execution.metric.{SQLMetric, SQLMetrics}

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
  *
  * Memory safety: retained rows are bounded by keys-per-partition × k.
  * When that bound itself is too big (huge key cardinality in one
  * partition), the exec SPILLS: once retained rows cross
  * `maxRetainedRows` it writes the current heaps out as a key-sorted
  * run file, clears the map, and continues; at the end the (few,
  * each ≤ k rows per key) runs are merge-joined by key and re-heaped —
  * the classic external-aggregation shape, so one partition can hold
  * arbitrarily many keys in O(maxRetainedRows) memory.
  *
  * Output is emitted keys-ascending, rows within a key in sort order —
  * declared via `outputOrdering` so a downstream per-key consumer
  * (e.g. `mapGroups` over the same keys) does not re-sort.
  */
case class TopKPerKey(k: Int, keys: Seq[Expression], order: Seq[SortOrder],
    child: LogicalPlan,
    maxRetainedRows: Int = TopK.DefaultMaxRetainedRows) extends UnaryNode {
  require(k > 0, "k must be positive")
  require(maxRetainedRows >= k, "maxRetainedRows must be >= k")
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKey =
    copy(child = newChild)
}

/** Planner rule mapping the logical node onto its exec. Registered per
  * session via [[TopK.ensureStrategy]] (or `experimental.extraStrategies`
  * directly). */
object GraftStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKey(k, keys, order, child, maxRetained) =>
      TopKPerKeyExec(k, keys, order, planLater(child), maxRetained) :: Nil
    case _ => Nil
  }
}

case class TopKPerKeyExec(k: Int, keys: Seq[Expression], order: Seq[SortOrder],
    child: SparkPlan,
    maxRetainedRows: Int = TopK.DefaultMaxRetainedRows) extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output
  override def outputPartitioning = child.outputPartitioning
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(keys) :: Nil

  // Truthful by construction: each partition emits its keys in key
  // ascending order (both the in-memory sort-at-emit and the spill
  // merge), rows within a key in `order`.
  override def outputOrdering: Seq[SortOrder] =
    keys.map(SortOrder(_, Ascending)) ++ order

  override lazy val metrics: Map[String, SQLMetric] = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "output rows"),
    "numKeys" -> SQLMetrics.createMetric(sparkContext, "distinct keys"),
    "spills" -> SQLMetrics.createMetric(sparkContext, "spilled runs"),
    "spilledRows" -> SQLMetrics.createMetric(sparkContext, "spilled rows"))

  override protected def doExecute(): RDD[InternalRow] = {
    val kLocal = k
    val keysLocal = keys
    val orderLocal = order
    val childOutput = child.output
    val maxRetained = maxRetainedRows
    val outRows = longMetric("numOutputRows")
    val keyCount = longMetric("numKeys")
    val spillCount = longMetric("spills")
    val spilledRows = longMetric("spilledRows")
    child.execute().mapPartitions({ iter =>
      val part = new TopKPartition(kLocal, keysLocal, orderLocal, childOutput,
        maxRetained, keyCount, spillCount, spilledRows)
      part.process(iter).map { r => outRows += 1; r }
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyExec =
    copy(child = newChild)
}

/** Per-partition worker: bounded heaps with a spill-and-merge fallback.
  * Separated from the exec node so the logic is unit-testable without a
  * planned query. */
private[plans] final class TopKPartition(
    k: Int, keys: Seq[Expression], order: Seq[SortOrder],
    childOutput: Seq[Attribute], maxRetainedRows: Int,
    keyCount: SQLMetric, spillCount: SQLMetric, spilledRows: SQLMetric) {

  private val keyProj = UnsafeProjection.create(keys, childOutput)
  private val toUnsafe = UnsafeProjection.create(childOutput, childOutput)
  private val rowOrdering = GenerateOrdering.generate(order, childOutput)
  private val unsafeOrdering: Ordering[UnsafeRow] =
    rowOrdering.on((r: UnsafeRow) => r: InternalRow)
  // value ordering over the projected key row (BoundReference per key
  // slot — binding is already done, the schema arg is unused)
  private val keyOrdering: BaseOrdering = GenerateOrdering.generate(
    keys.zipWithIndex.map { case (kx, i) =>
      SortOrder(BoundReference(i, kx.dataType, kx.nullable), Ascending)
    }, Nil)

  private val heaps = mutable.HashMap.empty[UnsafeRow, mutable.PriorityQueue[UnsafeRow]]
  private var retained = 0
  private val spillFiles = mutable.ArrayBuffer.empty[File]

  def process(iter: Iterator[InternalRow]): Iterator[InternalRow] = {
    iter.foreach { raw =>
      val row = toUnsafe(raw)
      val key = keyProj(row) // reused buffer — copy only on first sight
      heaps.get(key) match {
        case Some(heap) =>
          // max-heap under the sort order: head = worst of the current
          // best k, so an incoming better row evicts it in O(log k)
          if (heap.size < k) {
            heap.enqueue(row.copy()); retained += 1
            if (retained >= maxRetainedRows) spill()
          } else if (rowOrdering.compare(row, heap.head) < 0) {
            heap.dequeue(); heap.enqueue(row.copy())
          }
        case None =>
          val h = mutable.PriorityQueue.empty[UnsafeRow](unsafeOrdering)
          h.enqueue(row.copy()); retained += 1
          heaps.put(key.copy(), h)
          if (retained >= maxRetainedRows) spill()
      }
      // retained counts enqueued (not evicted-over) rows, and every
      // enqueue is followed by the threshold check, so partition memory
      // is hard-bounded at maxRetainedRows rows regardless of key
      // cardinality or arrival order. Spilling a partially-filled heap
      // is safe: anything it ever evicted is dominated (transitively) by
      // the k rows written to the run, so the merge can't lose a winner.
    }
    if (spillFiles.isEmpty) { keyCount += heaps.size; sortedEmit() }
    else {
      // the in-memory remainder becomes the last run, then merge
      spill()
      val runs = spillFiles.map(readRun)
      Option(TaskContext.get()).foreach(_.addTaskCompletionListener[Unit] { _ =>
        spillFiles.foreach(_.delete())
      })
      merge(runs.toSeq)
    }
  }

  /** Emit the in-memory map keys-ascending, rows best-first per key. */
  private def sortedEmit(): Iterator[InternalRow] =
    heaps.toSeq.sortBy(e => e._1: InternalRow)(keyOrdering)
      .iterator.flatMap { case (_, h) => h.dequeueAll.reverseIterator }

  /** Write the current heaps as one key-sorted run and clear the map. */
  private def spill(): Unit = {
    if (heaps.isEmpty) return
    val file = File.createTempFile("graft-topk-spill", ".run")
    val out = new DataOutputStream(new BufferedOutputStream(new FileOutputStream(file)))
    try {
      sortedEmit().foreach { r =>
        val u = r.asInstanceOf[UnsafeRow]
        out.writeInt(u.getSizeInBytes)
        out.write(u.getBytes)
        spilledRows += 1
      }
      out.writeInt(-1)
    } finally out.close()
    spillFiles += file
    spillCount += 1
    keyCount += heaps.size
    heaps.clear()
    retained = 0
  }

  /** Stream a run back as (key, row) pairs (key re-projected per row). */
  private def readRun(file: File): scala.collection.BufferedIterator[(UnsafeRow, UnsafeRow)] = {
    val in = new DataInputStream(new BufferedInputStream(new FileInputStream(file)))
    val nFields = childOutput.length
    val runKeyProj = UnsafeProjection.create(keys, childOutput)
    new Iterator[(UnsafeRow, UnsafeRow)] {
      private def readSize(): Int = {
        val s = try in.readInt() catch { case _: EOFException => -1 }
        if (s < 0) in.close() // idempotent
        s
      }
      private var nextSize = readSize()
      def hasNext: Boolean = nextSize >= 0
      def next(): (UnsafeRow, UnsafeRow) = {
        val bytes = new Array[Byte](nextSize)
        in.readFully(bytes)
        val row = new UnsafeRow(nFields)
        row.pointTo(bytes, nextSize)
        nextSize = readSize()
        (runKeyProj(row).copy(), row)
      }
    }.buffered
  }

  /** Merge key-sorted runs: per key, gather ≤ runs×k candidates and
    * re-heap to the global best k. Memory: O(runs × k). */
  private def merge(runs: Seq[scala.collection.BufferedIterator[(UnsafeRow, UnsafeRow)]]): Iterator[InternalRow] =
    new Iterator[InternalRow] {
      private var chunk: Iterator[InternalRow] = Iterator.empty
      def hasNext: Boolean = chunk.hasNext || runs.exists(_.hasNext)
      def next(): InternalRow = {
        while (!chunk.hasNext) {
          var minKey: UnsafeRow = null
          runs.foreach { r =>
            if (r.hasNext) {
              val kk = r.head._1
              if (minKey == null || keyOrdering.compare(kk, minKey) < 0) minKey = kk
            }
          }
          val heap = mutable.PriorityQueue.empty[UnsafeRow](unsafeOrdering)
          runs.foreach { r =>
            while (r.hasNext && keyOrdering.compare(r.head._1, minKey) == 0) {
              val row = r.next()._2
              if (heap.size < k) heap.enqueue(row)
              else if (rowOrdering.compare(row, heap.head) < 0) {
                heap.dequeue(); heap.enqueue(row)
              }
            }
          }
          chunk = heap.dequeueAll.reverseIterator
        }
        chunk.next()
      }
    }
}

/** User-facing API. */
object TopK {

  /** Per-partition retained-row bound before the spill path engages:
    * #keys × k capped at ~4M rows (~hundreds of MB of UnsafeRows at
    * typical widths). Override per call or via the
    * `graft.topk.maxRetainedRows` session conf. */
  val DefaultMaxRetainedRows: Int = 4 << 20

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
    val maxRetained = spark.conf.getOption("graft.topk.maxRetainedRows")
      .map(_.toInt).getOrElse(DefaultMaxRetainedRows)
    GraftSqlBridge.ofRows(spark,
      TopKPerKey(k, keys, order, df.queryExecution.analyzed, maxRetained))
  }
}
