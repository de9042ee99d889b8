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

  /** Contiguous 1..N ids without a single-partition window: sort, then
    * add per-partition offsets computed from partition sizes (the
    * RDD zipWithIndex technique expressed over Dataset rows).
    */
  def dense(df: DataFrame, order: Seq[Column], idCol: String): DataFrame = {
    val sorted = df.orderBy(order: _*)
    val spark = df.sparkSession
    val schema = org.apache.spark.sql.types.StructType(
      sorted.schema.fields :+ org.apache.spark.sql.types.StructField(
        idCol, org.apache.spark.sql.types.LongType, nullable = false))
    val withIds = sorted.rdd.zipWithIndex().map { case (row, i) =>
      org.apache.spark.sql.Row.fromSeq(row.toSeq :+ (i + 1L))
    }
    spark.createDataFrame(withIds, schema)
  }

  /** Stable, shuffle-free 64-bit ids from the natural key. */
  def hashed(df: DataFrame, keys: Seq[String], idCol: String): DataFrame =
    df.withColumn(idCol, xxhash64(keys.map(col): _*))
}
