package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension Type 2: turn a change log into validity
  * intervals. The reference rebuilds every dim from scratch each week
  * (scr/Transform.py:75-142 drops and recreates dim tables), losing
  * history; SCD2 is the standard warehouse answer — each key carries
  * one row per attribute VERSION with `eff_from`/`eff_to` bounds and
  * an `is_current` flag, so point-in-time joins ("which team did the
  * player belong to at match date X") stay expressible.
  *
  * Plan shape: ONE hash shuffle on the key, then two window passes
  * over the same (key, ts) sort — Catalyst reuses the exchange, so
  * version suppression (lag) and interval closing (lead) cost one
  * shuffle total. State per key is a sort run, not a buffer: no
  * aggregation holds more than a row, so a 100 TB change log with a
  * billion keys streams through at shuffle speed. Skewed keys are
  * bounded by their own change count, not the table size.
  */
object Scd2 {

  /** Build the version history of `attrs` per `keys` from a change
    * log ordered by `ts` (plus `tie` for a total order on same-ts
    * changes — REQUIRED for determinism; pass a unique id).
    *
    * Consecutive changes with identical `attrs` are suppressed
    * (null-safe struct compare, so NULL attribute values version
    * correctly); each surviving change opens an interval
    * `[eff_from, eff_to)` closed by the next version's `ts`, the
    * latest version per key carrying `eff_to = NULL` /
    * `is_current = true`.
    */
  def history(changes: DataFrame, keys: Seq[String], ts: String,
              tie: String, attrs: Seq[String]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(ts), col(tie))
    val attrStruct = struct(attrs.map(col): _*)
    val versions = changes
      .withColumn("_prev", lag(attrStruct, 1).over(w))
      // first change per key (lag NULL) always opens a version; the
      // null-safe compare keeps NULL-valued attributes versionable
      .filter(col("_prev").isNull || !(col("_prev") <=> attrStruct))
      .drop("_prev")
    versions
      .withColumn("eff_from", col(ts))
      .withColumn("eff_to", lead(col(ts), 1).over(w))
      .withColumn("is_current", col("eff_to").isNull)
  }
}
