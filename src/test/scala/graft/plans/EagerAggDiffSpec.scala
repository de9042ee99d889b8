package graft.plans

import graft.SparkSpec
import graft.queries.Registry
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Registry-wide plan diff for the session-wide `auto` eager-agg flag
  * ([[PushPartialAggThroughUniqueJoin]]) — the round-7 verdict's
  * graduation condition: enabling the flag in [[graft.GraftSession]]
  * must not silently rewrite plans beyond the pinned set. Every batch
  * registry query is optimized twice (flag off / flag auto, rule
  * registered both times so only the flag differs) and the set of
  * queries whose canonicalized optimized plan changes is pinned
  * EXACTLY — a new fire (or a lost one) fails here before it can
  * drift into the driver gate. Streaming queries are excluded for the
  * same reason as RegistrySpec's batch plan gate: their builders run
  * the stream to completion and return a materialized sink, so the
  * inspected plan never contains the streaming shape (the auto gate
  * itself bails on streaming threads — see the rule's scaladoc).
  */
class EagerAggDiffSpec extends SparkSpec {

  /** The fire envelope:
    *  - q84 MUST fire: its naive Aggregate-over-Join plan exists
    *    precisely to hand the rule its shape; lineitem→orders
    *    measures ~4 lines per order — safely above the 3.0 bar.
    *  - t17 MAY fire: `hit` is a per-doc count over trainShingles ⋈
    *    DISTINCT testShingles — the dim side is provably unique on
    *    h60 and within-doc shingle repetition collapses repeated
    *    (doc, h60) pairs BEFORE the join, a genuine win the gate
    *    discovered in an existing query (the driver hash gate pins
    *    values unchanged). Its measured reduction sits NEAR the 3.0
    *    bar at this spec's sf0.001 corpus, and the probe's
    *    LIMIT-sample is partition-order dependent, so the decision
    *    legitimately flaps here (at the driver's sf0.01+ it fires
    *    consistently) — the pin is the ENVELOPE, not the exact set.
    * Every other registry query either lacks the shape (hand-pushed
    * aggregates, non-unique dims, non-pushable calls) or fails the
    * measured reduction — any new fire outside the envelope fails
    * this spec before it can drift into the driver gate. */
  private val mustFire = Set("q84_eager_agg_rule")
  private val mayFire = Set("t17_decontaminate")

  test("flag=auto changes exactly the pinned set of registry plans") {
    if (!spark.experimental.extraOptimizations
        .contains(PushPartialAggThroughUniqueJoin))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+
          (PushPartialAggThroughUniqueJoin: org.apache.spark.sql.catalyst
            .rules.Rule[LogicalPlan])
    PushPartialAggThroughUniqueJoin.clearProbeCache()
    val flag = PushPartialAggThroughUniqueJoin.FLAG
    val batch = Registry.all.map(_.name).filterNot(_.startsWith("st"))
    val prev = spark.conf.getOption(flag)
    val diff = try {
      batch.flatMap { name =>
        // build ONCE (under auto, so q84's builder takes its
        // session-rule path), then optimize the SAME analyzed plan
        // under both flags: two separate builds get fresh exprIds,
        // and RewriteDistinctAggregates orders its Expand branches by
        // an exprId-keyed hash — a multi-distinct query (q03) then
        // differs between builds for reasons that have nothing to do
        // with this rule. One analyzed tree, two optimizations,
        // exprIds fixed ⇒ only flag-driven differences survive.
        spark.conf.set(flag, "auto")
        val analyzed =
          Registry.queries(name)(spark, sfDir).queryExecution.analyzed
        def optimized(mode: String): String = {
          spark.conf.set(flag, mode)
          org.apache.spark.sql.classic.GraftPlanBridge.ofRows(spark, analyzed)
            .queryExecution.optimizedPlan.canonicalized.toString
        }
        val off = optimized("false")
        val auto = optimized("auto")
        if (off != auto) Some(name) else None
      }.toSet
    } finally prev.fold(spark.conf.unset(flag))(spark.conf.set(flag, _))
    assert(mustFire.subsetOf(diff),
      s"expected fires missing: ${mustFire -- diff}")
    assert((diff -- mustFire -- mayFire).isEmpty,
      s"unexpected eager-agg plan drift: fired=${diff -- mustFire -- mayFire}")
  }
}
