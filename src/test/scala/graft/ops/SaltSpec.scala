package graft.ops

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Salted two-phase aggregation must be bit-identical to the plain
  * groupBy (decimal partials are associative) and actually two-phase
  * in the plan. */
class SaltSpec extends SparkSpec {

  test("salted sum/count equals the plain aggregation bit-for-bit") {
    val ev = Tables.events(spark, sfDir)
    val salted = Salt.saltedSumCount(ev, Seq(col("event_type")), col("value"),
        col("event_id"), 16, "sum_value", "n_events")
      .collect().map(r => r.getString(0) -> ((r.getDouble(1), r.getLong(2)))).toMap
    val plain = ev.groupBy(col("event_type"))
      .agg(sum(col("value").cast(DecimalType(18, 4))).cast("double").as("s"),
        count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> ((r.getDouble(1), r.getLong(2)))).toMap
    assert(salted === plain)
  }

  test("plan is two-phase: an exchange on (key, salt) precedes the final combine") {
    val ev = Tables.events(spark, sfDir)
    val df = Salt.saltedSumCount(ev, Seq(col("event_type")), col("value"),
      col("event_id"), 16, "sum_value", "n_events")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("__salt"), plan.take(2000))
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges >= 2, s"expected salted + final exchanges:\n${plan.take(2000)}")
  }

  test("bucketed range attribution equals the naive theta join") {
    import graft.queries.Registry
    val bucketed = Registry.queries("q37_range_attribution")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val W = 1800000000L
    val ev = Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_type"), expr("ts_ns div 1000").as("us"))
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("us").as("p_us"))
    val c = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("cu"), col("us").as("c_us"))
    val naive = p.join(c, col("user_id") === col("cu") &&
        col("c_us") >= col("p_us") - W && col("c_us") < col("p_us"), "left")
      .groupBy(col("user_id"), col("p_us"))
      .agg(sum(when(col("c_us").isNotNull, 1L).otherwise(0L)).as("n_clicks"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(bucketed === naive)
  }
}
