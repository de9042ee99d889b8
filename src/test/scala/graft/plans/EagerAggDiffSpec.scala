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
  * EXACTLY, at BOTH sf0.001 and sf0.01 — a new fire (or a lost one)
  * fails here before it can drift into the driver gate.
  *
  * Round 9 removed the round-8 "envelope": the probe now measures
  * one full pass over the column-pruned keys (count + HLL, both
  * order-insensitive — reproducible AND layout-independent; the
  * interim `LocalLimit`-prefix design was deterministic but biased
  * low on key-unclustered layouts, the q84-at-sf0.1 catch), so
  * near-threshold decisions like t17's no longer flap and the fire
  * set is an exact per-SF pin. Streaming queries are
  * excluded for the same reason as RegistrySpec's batch plan gate:
  * their builders run the stream to completion and return a
  * materialized sink, so the inspected plan never contains the
  * streaming shape (the auto gate itself bails on streaming threads —
  * see the rule's scaladoc).
  */
class EagerAggDiffSpec extends SparkSpec {

  /** The exact per-SF fire sets:
    *  - q84 fires at both SFs: its naive Aggregate-over-Join plan
    *    exists precisely to hand the rule its shape; lineitem→orders
    *    measures ~4 lines per order — safely above the 3.0 bar.
    *  - t17 fires at both SFs under a cold cache: `hit` is a per-doc
    *    count over trainShingles ⋈ DISTINCT testShingles — the dim
    *    side is provably unique on h60 and within-doc shingle
    *    repetition collapses repeated (doc, h60) pairs before the
    *    join. Its sub-plan is WIDE (a join below the probe), so the
    *    probe takes the full-pass regime and measures the true
    *    rows/NDV — above the 3.0 bar at both corpora. (The round-8
    *    "legitimate flap" was two separate nondeterminisms, both now
    *    closed: the racy `.limit` sample, and cache-state-dependent
    *    planning — see [[fireSet]].)
    * Every other registry query either lacks the shape (hand-pushed
    * aggregates, non-unique dims, non-pushable calls) or fails the
    * measured reduction. */
  private val expectedFires = Map(
    "/root/testdata/sf0.001" ->
      Set("q84_eager_agg_rule", "t17_decontaminate"),
    "/root/testdata/sf0.01" ->
      Set("q84_eager_agg_rule", "t17_decontaminate"))

  private def fireSet(dir: String): Set[String] = {
    // defined cache state: a registry builder that persists a dataset
    // leaves an InMemoryRelation behind, and on a RE-build the
    // optimizer substitutes it into the plan — opaque to the rule's
    // uniqueness proof, so the fire decision would depend on which
    // queries ran before (cache-state-dependent planning is normal
    // Spark behavior, but the pin here must be reproducible). Cold
    // cache + cold probe cache ⇒ the diff is a pure function of the
    // data.
    spark.catalog.clearCache()
    PushPartialAggThroughUniqueJoin.clearProbeCache()
    val flag = PushPartialAggThroughUniqueJoin.FLAG
    val batch = Registry.all.map(_.name).filterNot(_.startsWith("st"))
    val prev = spark.conf.getOption(flag)
    try {
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
          Registry.queries(name)(spark, dir).queryExecution.analyzed
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
  }

  for ((dir, expected) <- expectedFires) {
    test(s"flag=auto changes EXACTLY the pinned registry plans at ${dir.split('/').last}") {
      if (!spark.experimental.extraOptimizations
          .contains(PushPartialAggThroughUniqueJoin))
        spark.experimental.extraOptimizations =
          spark.experimental.extraOptimizations :+
            (PushPartialAggThroughUniqueJoin: org.apache.spark.sql.catalyst
              .rules.Rule[LogicalPlan])
      // run the whole diff twice: the deterministic probe must yield
      // the SAME fire set on a fresh cache — the round-8 flap is gone
      val first = fireSet(dir)
      val second = fireSet(dir)
      assert(first === second,
        s"probe nondeterminism: $first vs $second on identical inputs")
      assert(first === expected,
        s"eager-agg fire-set drift at $dir: got $first, pinned $expected")
    }
  }
}
