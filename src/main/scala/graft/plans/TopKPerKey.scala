package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.execution.SparkStrategy
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{AllTuples, ClusteredDistribution, Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}
import org.apache.spark.sql.graftbridge.ColumnBridge

/** Custom whole-operator: bounded top-k per key (SURVEY.md §7.3 mechanism
  * (c): LogicalPlan + Strategy + SparkPlan, registered via
  * experimental.extraStrategies / SparkSessionExtensions).
  *
  * Why: the window formulation (`row_number over (partition by k order by
  * o) <= n`) SORTS every key group in full — at 100 TB that is a full
  * shuffle + full sort of the fact table to keep n rows per key. This
  * operator keeps a bounded heap per key instead: a map-side partial pass
  * reduces each partition to <= k rows per key BEFORE the exchange, and
  * the final pass merges per key after it — shuffle volume is
  * O(keys x k x partitions), sort cost O(rows log k), no full sort
  * anywhere.
  */
final case class TopKPerKey(k: Int, keys: Seq[Expression], order: Seq[SortOrder],
                            child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKey =
    copy(child = newChild)
}

final case class TopKPerKeyExec(k: Int, keys: Seq[Expression], order: Seq[SortOrder],
                                partial: Boolean, child: SparkPlan) extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output
  override def outputPartitioning = child.outputPartitioning

  // empty keys = GLOBAL top-k: every row shares the one (empty) heap key,
  // the partial pass bounds each partition to k rows, and the final pass
  // merges them in a single partition (AllTuples — ClusteredDistribution
  // disallows an empty clustering). This is the case that matters most at
  // scale: the window formulation of a global top-k is a single-partition
  // FULL SORT of the input.
  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) Seq(UnspecifiedDistribution)
    else if (keys.isEmpty) Seq(AllTuples)
    else Seq(ClusteredDistribution(keys))

  override protected def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    val keyExprs = keys
    val sortOrder = order
    val kk = k
    child.execute().mapPartitions({ iter =>
      val keyProj = UnsafeProjection.create(keyExprs, childOutput)
      val ord = RowOrdering.create(sortOrder, childOutput)
      // per key: max-heap on "worst of the current top-k" (reverse order)
      val heaps = new java.util.HashMap[UnsafeRow, java.util.PriorityQueue[InternalRow]]()
      val revOrd = new java.util.Comparator[InternalRow] {
        override def compare(a: InternalRow, b: InternalRow): Int = ord.compare(b, a)
      }
      while (iter.hasNext) {
        val row = iter.next()
        val key = keyProj(row)
        var heap = heaps.get(key)
        if (heap == null) {
          // initial capacity bounded: PriorityQueue grows on demand, and a
          // huge k (rank cutoff above the group size) must not pre-allocate
          // k slots — or overflow the capacity int at k = Int.MaxValue
          heap = new java.util.PriorityQueue[InternalRow](math.min(kk, 64) + 1, revOrd)
          heaps.put(key.copy(), heap)
        }
        if (heap.size < kk) {
          heap.add(row.copy())
        } else if (ord.compare(row, heap.peek()) < 0) {
          heap.poll()
          heap.add(row.copy())
        }
      }
      import scala.jdk.CollectionConverters._
      heaps.values().iterator().asScala.flatMap(_.iterator().asScala)
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyExec =
    copy(child = newChild)
}

/** Plans TopKPerKey as partial -> (exchange via EnsureRequirements) -> final. */
object TopKPerKeyStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKey(k, keys, order, child) =>
      val partialExec = TopKPerKeyExec(k, keys, order, partial = true, planLater(child))
      TopKPerKeyExec(k, keys, order, partial = false, partialExec) :: Nil
    case _ => Nil
  }
}

object TopKPerKey {
  /** Install the strategy once per session (idempotent). */
  def install(spark: SparkSession): Unit = {
    val cur = spark.experimental.extraStrategies
    if (!cur.contains(TopKPerKeyStrategy)) {
      spark.experimental.extraStrategies = cur :+ TopKPerKeyStrategy
    }
  }

  /** Bounded top-k rows per key, ordered by `(column, ascending)` specs
    * (best-first). Columns are referenced by name against the input's
    * schema — expressions built directly from the analyzed plan's
    * attributes, so the tree stays free of Column-API origin baggage
    * (ColumnNode origins are not serializable and would poison the task
    * closure). Sort by a computed value by adding it as a column first.
    * Rows within a key come back unsorted — orderBy downstream if
    * presentation order matters. */
  def topK(df: DataFrame, keys: Seq[String], order: Seq[(String, Boolean)], k: Int): DataFrame = {
    val spark = df.sparkSession
    install(spark)
    val analyzed = df.queryExecution.analyzed
    def attr(n: String) = analyzed.output.find(_.name == n).getOrElse(
      throw new IllegalArgumentException(s"column '$n' not in ${analyzed.output.map(_.name)}"))
    val keyExprs: Seq[Expression] = keys.map(attr)
    val sortExprs = order.map { case (n, asc) =>
      SortOrder(attr(n),
        if (asc) org.apache.spark.sql.catalyst.expressions.Ascending
        else org.apache.spark.sql.catalyst.expressions.Descending)
    }
    ColumnBridge.ofRows(spark, TopKPerKey(k, keyExprs, sortExprs, analyzed))
  }
}
