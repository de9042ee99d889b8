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

  /** Total, null-safe salt in 0..buckets-1 from ANY source column:
    * xxhash64 maps every value (null included — it hashes to the
    * seed) to a long, pmod brings it into range. A bare
    * `pmod(source, buckets)` would emit NULL salts for null sources
    * (silently dropping the row from an inner join) and out-of-range
    * salts for non-integral sources — this form cannot. */
  private def saltOf(saltSource: Column, buckets: Int): Column =
    pmod(xxhash64(saltSource), lit(buckets.toLong))

  /** Exact decimal sum + row count per `keys`, two-phase over
    * the hash salt of `saltSource`. */
  def saltedSumCount(df: DataFrame, keys: Seq[Column], value: Column,
                     saltSource: Column, buckets: Int,
                     sumName: String, cntName: String): DataFrame = {
    val salted = df.withColumn("__salt", saltOf(saltSource, buckets))
    val partial = salted
      .groupBy((keys :+ col("__salt")): _*)
      .agg(sum(value.cast(DecimalType(18, 4))).as("__psum"),
        count(lit(1)).as("__pcnt"))
    partial
      .groupBy(keys: _*)
      .agg(sum(col("__psum")).cast("string").cast("double").as(sumName),
        sum(col("__pcnt")).cast("bigint").as(cntName))
  }

  /** Count-only variant: row count per `keys`, two-phase over
    * `pmod(saltSource, buckets)` — the heavy-hitter/frequency shape
    * (counts are algebraic, so the regrouping is trivially exact). */
  def saltedCount(df: DataFrame, keys: Seq[Column], saltSource: Column,
                  buckets: Int, cntName: String): DataFrame = {
    val salted = df.withColumn("__salt", saltOf(saltSource, buckets))
    salted
      .groupBy((keys :+ col("__salt")): _*)
      .agg(count(lit(1)).as("__pcnt"))
      .groupBy(keys: _*)
      .agg(sum(col("__pcnt")).cast("bigint").as(cntName))
  }

  /** Skew-salted equi-JOIN — the join half of the skew toolkit
    * (SURVEY §7.3 (8)). A plain shuffle join on a low-cardinality /
    * skewed key sends every row of a hot key to ONE reducer; salting
    * shuffles the fact on `(keys, salt)` with salt drawn from a
    * high-cardinality fact column, and replicates the (small) `dim`
    * side ×`buckets` via explode so every fact partition still finds
    * its dim row. Exact: each fact row meets each matching dim row in
    * exactly one salt bucket.
    *
    * When to reach for it instead of the built-ins: AQE's skew-join
    * split only fires on sort-merge joins AFTER observing runtime
    * stats, and never inside Structured Streaming; a broadcast join
    * needs the dim to fit in memory. Salted shuffle covers the
    * remaining corner — dim too big to broadcast, skew known up
    * front, or a streaming stateful join. The dim replication
    * multiplies dim shuffle bytes by `buckets`, so `buckets` trades
    * hot-key spread against dim duplication (16-64 is typical).
    *
    * Only `inner` and `left` are exact under salting: a right/full
    * join would emit every UNMATCHED dim row once per replica
    * (×buckets) — rejected up front rather than silently wrong. The
    * salt itself is the total hash of `saltSource`, so null or
    * non-integral sources can never leak rows out of the join. */
  def saltedJoin(fact: DataFrame, dim: DataFrame, keys: Seq[String],
                 saltSource: Column, buckets: Int,
                 joinType: String = "inner"): DataFrame = {
    val jt = joinType.toLowerCase.replace("_", "")
    require(jt == "inner" || jt == "left" || jt == "leftouter",
      s"saltedJoin: joinType '$joinType' unsupported — the exploded dim " +
        "replication makes right/full joins emit unmatched dim rows " +
        s"$buckets times; use inner or left")
    val sf = fact.withColumn("__salt", saltOf(saltSource, buckets))
    val sd = dim.withColumn("__salt",
      explode(array((0 until buckets).map(i => lit(i.toLong)): _*)))
    sf.join(sd, keys :+ "__salt", joinType).drop("__salt")
  }
}
