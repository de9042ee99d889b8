package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for joins whose key distribution is pathological
  * (one hot key → one straggler task). AQE's skew-join split (on by
  * default) handles sort-merge skew at runtime; explicit salting is the
  * plan-level tool when the skewed side must hash-join or the skew is
  * known a priori (e.g. the null/default key of a fact table).
  *
  * Mechanics: the big side gets a uniform random salt in [0, factor);
  * the small side is replicated `factor`× with every salt value; the
  * join key becomes (key, salt). Row multiplicity is unchanged —
  * each big-side row matches exactly its original partner — so any
  * downstream aggregate is unaffected. Cost: small side × factor.
  */
object Salt {

  private val SALT = "__graft_salt"

  /** Equi-join `big ⋈ small` on `keys`, salted `factor` ways.
    * Inner and left-outer supported (the salt never manufactures or
    * drops matches). */
  def skewJoin(big: DataFrame, small: DataFrame, keys: Seq[String],
               factor: Int, joinType: String = "inner"): DataFrame = {
    require(factor > 0, "salt factor must be positive")
    require(Seq("inner", "left", "left_outer").contains(joinType),
      s"unsupported salted join type: $joinType")
    val salted = big.withColumn(SALT, pmod(spark_partition_id() + monotonically_increasing_id(), lit(factor)).cast("int"))
    val replicated = small.withColumn(SALT,
      explode(sequence(lit(0), lit(factor - 1))))
    salted.join(replicated, keys :+ SALT, joinType).drop(SALT)
  }

  /** Two-phase aggregation for skewed group keys: partial-aggregate on
    * (key, salt) then final-aggregate on key. Correct for decomposable
    * aggregates expressed as (partial, final) column pairs, e.g.
    * sum/sum, count/sum. (Spark's hash aggregate already does
    * partial+final on the SAME key — this variant additionally splits
    * a single hot key's partial state across `factor` reducers.) */
  def skewedSum(df: DataFrame, keys: Seq[String], valueCol: String,
                factor: Int, out: String): DataFrame = {
    val salted = df.withColumn(SALT,
      pmod(spark_partition_id() + monotonically_increasing_id(), lit(factor)).cast("int"))
    salted.groupBy((keys :+ SALT).map(col): _*)
      .agg(sum(col(valueCol)).as("__partial"))
      .groupBy(keys.map(col): _*)
      .agg(sum(col("__partial")).as(out))
  }
}
