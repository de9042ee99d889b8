package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Skew-salted two-phase aggregation (SURVEY §7.3 (8) — "skewed keys →
  * salting or AQE skew-join", here the aggregation half).
  *
  * A plain `groupBy(hotKey).sum` sends EVERY row of a hot key to one
  * reducer — at 100 TB a single skewed key (one language, one
  * event_type) serializes the stage. Salting splits each key into
  * `buckets` sub-groups on a high-cardinality column, partial-sums per
  * (key, salt) across all reducers, then combines the tiny partial
  * table per key. Exact for any algebraic aggregate; sums route
  * through DECIMAL so the regrouping is also order-independent
  * bit-for-bit (the [[graft.queries.QueryDef.dsum]] discipline).
  *
  * AQE's skew handling covers JOINS, not aggregations — for
  * aggregation skew this two-phase shape is still the tool. (Spark's
  * own partial aggregation maps-side combines, which usually suffices;
  * explicit salting matters when the map-side hash table overflows —
  * many distinct group values per mapper — or with
  * `spark.sql.aggregate.partialAggregationOptimization` skipping
  * partials. The operator exists to make the pattern first-class and
  * testable.)
  */
object Salt {

  /** Exact decimal sum + row count per `keys`, two-phase over
    * `pmod(saltSource, buckets)`. */
  def saltedSumCount(df: DataFrame, keys: Seq[Column], value: Column,
                     saltSource: Column, buckets: Int,
                     sumName: String, cntName: String): DataFrame = {
    val salted = df.withColumn("__salt", pmod(saltSource, lit(buckets)))
    val partial = salted
      .groupBy((keys :+ col("__salt")): _*)
      .agg(sum(value.cast(DecimalType(18, 4))).as("__psum"),
        count(lit(1)).as("__pcnt"))
    partial
      .groupBy(keys: _*)
      .agg(sum(col("__psum")).cast("double").as(sumName),
        sum(col("__pcnt")).cast("bigint").as(cntName))
  }

  /** Count-only variant: row count per `keys`, two-phase over
    * `pmod(saltSource, buckets)` — the heavy-hitter/frequency shape
    * (counts are algebraic, so the regrouping is trivially exact). */
  def saltedCount(df: DataFrame, keys: Seq[Column], saltSource: Column,
                  buckets: Int, cntName: String): DataFrame = {
    val salted = df.withColumn("__salt", pmod(saltSource, lit(buckets)))
    salted
      .groupBy((keys :+ col("__salt")): _*)
      .agg(count(lit(1)).as("__pcnt"))
      .groupBy(keys: _*)
      .agg(sum(col("__pcnt")).cast("bigint").as(cntName))
  }
}
