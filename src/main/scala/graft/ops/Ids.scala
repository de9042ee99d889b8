package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Surrogate-id assignment strategies (SURVEY.md §2.6 W2).
  *
  * The reference assigns ids with `np.arange(len)+1` after a sort
  * (scr/Transform.py:116-119,351,372). Three strategies, by scale:
  *
  *  1. [[sequential]] — exact parity: global row_number over a sort.
  *     Correct and reproducible, but the window is single-partition —
  *     fine for dimension tables (≤ millions of rows), wrong for facts.
  *  2. [[dense]] — scalable dense ids: per-partition counts + offsets
  *     (the zipWithIndex pattern) — no single-partition bottleneck,
  *     still 1..N contiguous, but tied to current partitioning of the
  *     sorted data.
  *  3. [[hashed]] — stateless 64-bit key hash: no shuffle at all,
  *     stable across runs/clusters; ids are not contiguous. The right
  *     choice at 100 TB when ids only need to be unique + stable.
  */
object Ids {

  /** Exact reference parity: sort globally, number 1..N. */
  def sequential(df: DataFrame, order: Seq[Column], idCol: String): DataFrame =
    df.withColumn(idCol, row_number().over(Window.orderBy(order: _*)))

  /** Contiguous 1..N ids without a single-partition window: a dense
    * id is the exclusive prefix sum of the constant 1, plus one —
    * so this delegates to the shared two-phase partition-offset scan
    * ([[Pack.exclusivePrefixSum]]: range-partition, P partial counts
    * to the driver, broadcast offsets, partition-local numbering).
    * One primitive, two consumers (ids here, byte/token offsets in
    * sequence packing).
    */
  def dense(df: DataFrame, order: Seq[Column], idCol: String): DataFrame = {
    val ONE = "__graft_one"
    Pack.exclusivePrefixSum(df.withColumn(ONE, lit(1L)), order, ONE, idCol)
      .withColumn(idCol, col(idCol) + 1L)
      .drop(ONE)
  }

  /** Stable, shuffle-free 64-bit ids from the natural key. */
  def hashed(df: DataFrame, keys: Seq[String], idCol: String): DataFrame =
    df.withColumn(idCol, xxhash64(keys.map(col): _*))

  /** Dense 1..N_k rank within each key group, without the per-group
    * single-reducer sort of `row_number() OVER (PARTITION BY keys)`:
    * delegates to [[Pack.keyedExclusivePrefixSum]] (range-partition by
    * (keys, order) so one group spans many partitions, per-key-run
    * partials, broadcast offsets). The scalable rank for FEW keys with
    * HUGE groups — domain quotas, per-language sampling; for
    * high-cardinality keys keep the window. */
  def densePerKey(df: DataFrame, keys: Seq[String], order: Seq[Column],
                  idCol: String): DataFrame = {
    val ONE = "__graft_one"
    Pack.keyedExclusivePrefixSum(df.withColumn(ONE, lit(1L)), keys, order,
        ONE, idCol)
      .withColumn(idCol, col(idCol) + 1L)
      .drop(ONE)
  }
}
