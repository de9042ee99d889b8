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

  test("salted join equals the plain join with auto-broadcast disabled") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // force the shuffle-join path — the scenario saltedJoin exists for
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val ev = Tables.events(spark, sfDir)
      val dim = ev.select(col("event_type")).distinct()
        .withColumn("w", length(col("event_type")).cast("int"))
      val salted = Salt.saltedJoin(ev, dim, Seq("event_type"), col("user_id"), 16)
        .select(col("event_id"), col("w"))
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      val plain = ev.join(dim, Seq("event_type"))
        .select(col("event_id"), col("w"))
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      assert(salted === plain)
      // exactness means no row met its dim twin twice: counts agree too
      assert(salted.size === ev.count())
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("salted join replicates the dim ×buckets and salts the fact key") {
    val ev = Tables.events(spark, sfDir)
    val dim = ev.select(col("event_type")).distinct()
    val sd = dim.withColumn("__salt",
      explode(array((0 until 16).map(lit(_)): _*)))
    assert(sd.count() === dim.count() * 16)
    // every (key, salt) pair exists exactly once on the dim side —
    // the invariant that makes the salted equi-join exact
    assert(sd.groupBy(col("event_type"), col("__salt")).count()
      .filter(col("count") =!= 1).count() === 0)
    // fact rows of ONE hot key spread across many of the 16 salt
    // buckets — sf0.001 has only a handful of distinct click users, so
    // the hash can miss buckets; the claim is "spread", not coverage
    val spread = ev.filter(col("event_type") === "click")
      .select(pmod(xxhash64(col("user_id")), lit(16L)).as("s")).distinct().count()
    assert(spread >= 8L, s"hot key concentrated in $spread/16 salt buckets")
  }

  test("salted join keeps rows whose salt source is NULL or non-integral") {
    // the salt is a TOTAL function now: a null source hashes to the
    // xxhash64 seed and a double source hashes bit-wise — neither can
    // produce a NULL/out-of-range salt that drops a matching fact row
    import spark.implicits._
    val fact = Seq(("a", Some(1.5)), ("a", None), ("b", Some(2.0)))
      .toDF("k", "src")
    val dim = Seq(("a", 10), ("b", 20)).toDF("k", "w")
    val out = Salt.saltedJoin(fact, dim, Seq("k"), col("src"), 8)
    assert(out.count() === 3)
  }

  test("salted join rejects right/full join types up front") {
    import spark.implicits._
    val df = Seq(("a", 1L)).toDF("k", "src")
    intercept[IllegalArgumentException] {
      Salt.saltedJoin(df, df.select(col("k")), Seq("k"), col("src"), 8, "full_outer")
    }
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
