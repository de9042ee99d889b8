package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Sequence packing support: the scalable prefix sum behind
  * concatenate-then-chunk training-data packing (every pretraining
  * pipeline's final step — documents laid end-to-end in a fixed
  * order, then cut into fixed-size token windows).
  *
  * A naive running total is `sum() OVER (ORDER BY ...)` — a
  * SINGLE-partition window, the same bottleneck [[Ids.sequential]]
  * documents. The scalable form is the classic two-phase scan:
  * range-partition by the order key, per-partition partial sums
  * (one long per partition) to the driver, broadcast the exclusive
  * partition offsets back, then add a partition-local running sum.
  * Data crosses the cluster once (the range shuffle); the driver
  * sees P longs, never rows.
  *
  * The sorted input is pinned with an eager `localCheckpoint` before
  * pass 1: both passes MUST observe the identical partitioning and
  * row order, and two independent jobs over the same lazy lineage may
  * legitimately differ (a non-deterministic upstream, or AQE choosing
  * different range boundaries per job) — which would silently
  * misalign the broadcast offsets. Checkpointed blocks make the
  * partition boundaries a materialized fact, not a replayed promise.
  */
object Pack {

  /** Adds `outCol` = exclusive prefix sum of `valueCol` (a
    * NON-NULLABLE LONG column — a null value row fails fast) over the
    * total order `order` — row i gets the sum of all earlier rows'
    * values, first row 0. */
  def exclusivePrefixSum(df: DataFrame, order: Seq[Column],
                         valueCol: String, outCol: String): DataFrame = {
    val spark = df.sparkSession
    val sorted = df.repartitionByRange(order: _*)
      .sortWithinPartitions(order: _*)
      .localCheckpoint() // eager: pins partitioning + order for both passes
    val vIdx = sorted.schema.fieldIndex(valueCol)
    // pass 1: one partial sum per partition — P longs to the driver
    val partials = sorted.rdd
      .mapPartitionsWithIndex { case (pid, it) =>
        var s = 0L
        it.foreach { r =>
          require(!r.isNullAt(vIdx),
            s"exclusivePrefixSum: null in value column '$valueCol'")
          s += r.getLong(vIdx)
        }
        Iterator.single(pid -> s)
      }
      .collect().sortBy(_._1).map(_._2)
    val offsets = spark.sparkContext.broadcast(partials.scanLeft(0L)(_ + _))
    // pass 2: partition-local scan seeded with the broadcast offset
    val schema = StructType(
      sorted.schema.fields :+ StructField(outCol, LongType, nullable = false))
    val rows = sorted.rdd.mapPartitionsWithIndex { case (pid, it) =>
      var s = offsets.value(pid)
      it.map { r =>
        val out = Row.fromSeq(r.toSeq :+ s)
        s += r.getLong(vIdx)
        out
      }
    }
    spark.createDataFrame(rows, schema)
  }
}
