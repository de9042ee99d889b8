package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{AllTuples, ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.{Column, DataFrame}

/** Whole-operator Catalyst extension (brief preference ladder (c)):
  * per-key top-k without sorting each key group.
  *
  * The built-in formulation — `row_number().over(partitionBy(keys)
  * .orderBy(o)) <= k` — shuffles on the keys and then SORTS every
  * partition (O(n log n) per partition, full materialization before
  * the filter). This operator declares the same clustered distribution
  * but keeps only a k-bounded heap per key (O(n log k), O(keys·k)
  * memory) — the difference between sorting 100 TB and streaming it.
  *
  * Pieces: [[TopKPerKey]] logical node → [[TopKStrategy]] planner
  * strategy (via `spark.experimental.extraStrategies` or
  * `GraftExtensions`) → [[TopKPerKeyExec]] physical operator.
  * Output row order within a key is unspecified (like any exchange) —
  * callers add a final orderBy for presentation.
  */
case class TopKPerKey(
    keys: Seq[Expression], order: Seq[SortOrder], k: Int, child: LogicalPlan)
    extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(c: LogicalPlan): TopKPerKey =
    copy(child = c)
}

case class TopKPerKeyExec(
    keys: Seq[Expression], order: Seq[SortOrder], k: Int, child: SparkPlan)
    extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output
  // ClusteredDistribution(Nil) is rejected at planning time; a keyless
  // call means global top-k, which needs every row on one partition.
  // (The optimizer rewrite never produces that shape — this covers
  // direct TopK.perKey(df, Nil, …) use.)
  override def requiredChildDistribution: Seq[Distribution] =
    (if (keys.isEmpty) AllTuples else ClusteredDistribution(keys)) :: Nil

  override protected def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    val keyExprs = keys
    val sortOrder = order
    val limit = k
    child.execute().mapPartitions({ iter =>
      val keyProj = UnsafeProjection.create(keyExprs, childOutput)
      val ord: Ordering[InternalRow] =
        GenerateOrdering.generate(sortOrder, childOutput)
      // heap head = WORST of the current top-k (reverse ordering), so
      // a better row evicts the head in O(log k)
      val heaps = new java.util.HashMap[UnsafeRow, java.util.PriorityQueue[UnsafeRow]]()
      iter.foreach { row =>
        val key = keyProj(row)
        var heap = heaps.get(key)
        if (heap == null) {
          heap = new java.util.PriorityQueue[UnsafeRow](limit + 1, ord.reverse)
          heaps.put(key.copy(), heap)
        }
        if (heap.size < limit) {
          heap.add(row.asInstanceOf[UnsafeRow].copy())
        } else if (ord.compare(row, heap.peek()) < 0) {
          heap.poll()
          heap.add(row.asInstanceOf[UnsafeRow].copy())
        }
      }
      import scala.jdk.CollectionConverters._
      heaps.values().iterator().asScala.flatMap(_.iterator().asScala)
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(c: SparkPlan): TopKPerKeyExec =
    copy(child = c)
}

object TopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKey(keys, order, k, child) =>
      TopKPerKeyExec(keys, order, k, planLater(child)) :: Nil
    case _ => Nil
  }
}

object TopK {
  /** Top `k` rows per key under `order` (ascending = smallest first;
    * pass `col.desc` for largest-first). */
  def perKey(df: DataFrame, keys: Seq[Column], order: Seq[Column], k: Int): DataFrame = {
    val spark = df.sparkSession
    if (!spark.experimental.extraStrategies.contains(TopKStrategy)) {
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ TopKStrategy
    }
    import org.apache.spark.sql.GraftBridge
    val sortOrder = order.map(c => GraftBridge.expr(c) match {
      case s: SortOrder => s
      case e => SortOrder(e, Ascending)
    })
    val plan = TopKPerKey(keys.map(c => GraftBridge.expr(c)), sortOrder, k,
      df.queryExecution.logical)
    org.apache.spark.sql.GraftBridge.ofRows(spark, plan)
  }
}
