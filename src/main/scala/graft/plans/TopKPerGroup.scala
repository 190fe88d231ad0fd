package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.classic.Strategy
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, SortOrder}
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}
import org.apache.spark.sql.graftbridge.Bridge

/** Native per-group top-k — the whole-operator extension path (brief
  * preference (c): custom LogicalPlan + Rule/Strategy + SparkPlan via
  * SparkSessionExtensions).
  *
  * Why: Spark's built-in route for "k best rows per group" is
  * row_number over a window + filter, which SORTS every partition by
  * (group, order) — O(n log n) per partition and a full sort shuffle.
  * This operator keeps a bounded k-heap per group: O(n log k) with no
  * sort at all; the only exchange is the hash partitioning on the group
  * key, which `requiredChildDistribution` lets Spark's
  * EnsureRequirements insert (and elide when the child is already
  * clustered — e.g. bucketed input).
  *
  * At 100 TB this is the difference between sorting the corpus and
  * streaming it through fixed-size heaps.
  */
case class TopKPerGroup(k: Int, groupCols: Seq[Attribute],
    order: SortOrder, child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan)
      : TopKPerGroup = copy(child = newChild)
}

case class TopKPerGroupExec(k: Int, groupCols: Seq[Attribute],
    order: SortOrder, child: SparkPlan) extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output

  // each group must arrive whole; Spark inserts (or elides) the exchange
  override def requiredChildDistribution: Seq[Distribution] =
    Seq(ClusteredDistribution(groupCols))

  override protected def doExecute(): RDD[InternalRow] = {
    val kLocal = k
    val groupColsLocal = groupCols
    val orderLocal = order
    val childOutput = child.output
    child.execute().mapPartitions { iter =>
      val ordering = GenerateOrdering.generate(Seq(orderLocal), childOutput)
      val groupProj = org.apache.spark.sql.catalyst.expressions
        .UnsafeProjection.create(groupColsLocal, childOutput)
      // per-group bounded heap: head = worst retained row
      val heaps = new java.util.HashMap[InternalRow,
        java.util.PriorityQueue[InternalRow]]()
      iter.foreach { row =>
        val key = groupProj(row)
        var heap = heaps.get(key)
        if (heap == null) {
          heap = new java.util.PriorityQueue[InternalRow](
            kLocal + 1, ordering.reverse)
          heaps.put(key.copy(), heap)
        }
        if (heap.size < kLocal) heap.add(row.copy())
        else if (ordering.compare(row, heap.peek()) < 0) {
          heap.poll(); heap.add(row.copy())
        }
      }
      import scala.jdk.CollectionConverters._
      heaps.values().asScala.iterator.flatMap(_.iterator().asScala)
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan)
      : TopKPerGroupExec = copy(child = newChild)
}

object TopKStrategy extends Strategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerGroup(k, groupCols, order, child) =>
      TopKPerGroupExec(k, groupCols, order, planLater(child)) :: Nil
    case _ => Nil
  }
}

object TopK {
  /** Public API: k best rows per group, `orderCol` descending if `desc`.
    * Registers the strategy on first use (idempotent).
    */
  def topKPerGroup(df: DataFrame, groupCols: Seq[String], orderCol: String,
      desc: Boolean, k: Int): DataFrame = {
    val spark = df.sparkSession
    if (!spark.experimental.extraStrategies.contains(TopKStrategy)) {
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ TopKStrategy
    }
    val analyzed = Bridge.analyzed(df)
    def attr(n: String): Attribute = analyzed.output
      .find(_.name == n)
      .getOrElse(throw new IllegalArgumentException(s"no column $n"))
    val order = SortOrder(attr(orderCol),
      if (desc) org.apache.spark.sql.catalyst.expressions.Descending
      else org.apache.spark.sql.catalyst.expressions.Ascending)
    Bridge.ofRows(spark,
      TopKPerGroup(k, groupCols.map(attr), order, analyzed))
  }
}
