package graft.queries

import graft.SparkSpec

/** Whole-registry smoke: every declared capability runs on sf0.001 and
  * produces rows; names unique; every oracle belongs to a query.
  * (Value-level correctness is the driver's DuckDB gate + tools/check.py.) */
class RegistrySpec extends SparkSpec {

  test("query names are unique") {
    val names = Registry.all.map(_.name)
    assert(names.distinct.size === names.size)
  }

  test("every oracle key names a registered query") {
    assert(Registry.oracles.keySet.subsetOf(Registry.queries.keySet))
  }

  test("COVERAGE.md's gate inventory matches the registry (docs can't go stale)") {
    val text = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("COVERAGE.md")))
    val m = """all (\d+) registry queries oracle-checked""".r.findFirstMatchIn(text)
    assert(m.isDefined, "COVERAGE.md must state 'all N registry queries oracle-checked'")
    assert(m.get.group(1).toInt === Registry.all.size,
      s"COVERAGE.md says ${m.get.group(1)} queries; registry has ${Registry.all.size}")
    assert(Registry.oracles.size === Registry.all.size,
      "COVERAGE claims every query is oracle-checked — a query lost its oracle")
    // the star-gate section lists every StarGate query by name
    StarGate.defs.foreach(q =>
      assert(text.contains(q.name), s"COVERAGE.md star-gate table missing ${q.name}"))
  }

  test("no registry query plans a global window or an unbounded single-partition funnel") {
    // the 100 TB gate the round-5 verdict asked for mechanically, in
    // two layers over one registry pass:
    // (1) logical: a Window with no PARTITION BY funnels every row
    //     through one reducer. q09 is the ONE allowed occurrence — it
    //     exists precisely to demonstrate reference-parity sequential
    //     ids next to the scalable Ids.dense/hashed strategies. q08's
    //     global rank is also allowed: its window input is the
    //     POST-AGGREGATE 25-row nation table — bounded by key
    //     cardinality, not by SF.
    // (2) physical: every `Exchange SinglePartition` in the executed
    //     plan must feed from an UNGROUPED aggregate (keys=[] partial/
    //     merge buffers — one row per input partition, bounded at any
    //     SF). This additionally catches repartition(1)/coalesce(1)/
    //     global-sort shapes that never surface as a logical Window.
    //     Empirical round-6 survey: all 105 batch queries satisfy this;
    //     the only keyed children are q08/q09's dim-bounded rank input.
    val allowed = Set("q09_sequential_ids", "q08_nation_rank")
    val boundedChild =
      """(HashAggregate|ObjectHashAggregate|SortAggregate)\(keys?=\[\]""".r
    // streaming queries are excluded HERE, not because they're exempt
    // but because this check is blind there: their builders run the
    // stream to completion and return a materialized-sink LogicalRDD,
    // so the inspected plan contains none of the streaming
    // aggregation. They get the same gate from the recorded
    // micro-batch plans instead — see the "streaming micro-batch
    // plans" test at the end of this suite.
    val offenders = Registry.all.filterNot(_.name.startsWith("st")).flatMap { q =>
      val qe = Registry.queries(q.name)(spark, sfDir).queryExecution
      val globalWindows = qe.optimizedPlan.collect {
        case w: org.apache.spark.sql.catalyst.plans.logical.Window
          if w.partitionSpec.isEmpty => w
      }
      val lines = qe.executedPlan.toString.linesIterator.toVector
      val unboundedSingles = lines.zipWithIndex.collect {
        case (l, i) if l.contains("Exchange SinglePartition") &&
          boundedChild.findFirstIn(lines.lift(i + 1).getOrElse("")).isEmpty =>
          lines.lift(i + 1).getOrElse("<leaf>").trim.take(80)
      }
      if (globalWindows.nonEmpty || unboundedSingles.nonEmpty)
        Some(q.name -> s"windows=${globalWindows.size} singles=$unboundedSingles")
      else None
    }
    val rogue = offenders.filterNot { case (n, _) => allowed(n) }
    assert(rogue.isEmpty, s"unbounded single-partition funnels: $rogue")
  }

  test("README.md's query count matches the registry (docs can't go stale)") {
    val text = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("README.md")))
    val m = """(\d+) named queries, ALL (\d+) DuckDB-oracle-checked""".r
      .findFirstMatchIn(text)
    assert(m.isDefined, "README.md must state 'N named queries, ALL M DuckDB-oracle-checked'")
    assert(m.get.group(1).toInt === Registry.all.size,
      s"README.md says ${m.get.group(1)} queries; registry has ${Registry.all.size}")
    assert(m.get.group(2).toInt === Registry.oracles.size,
      s"README.md says ALL ${m.get.group(2)} oracle-checked; registry has ${Registry.oracles.size}")
  }

  test("oracleOnly twins: exactly the Complete-mode replays, each with a graduated production form") {
    // the bench split contract (round-11 verdict #2): the headline
    // bench measures shipping shapes; the Complete-mode finite-replay
    // twins exist only to feed the DuckDB gate. This pins (a) the
    // twin set can't silently grow — a new Complete-only pipeline
    // must either graduate or be added here deliberately; (b) every
    // twin's graduated Append form is itself registered AND benched;
    // (c) production + twins partition the registry, so Verify (which
    // runs Registry.all) still gates everything.
    val twins = Map(
      "st01_stream_hourly" -> "st17_stream_window_close",
      "st10_stream_sketch_cardinality" -> "st21_stream_sketch_cardinality_closed",
      "st11_stream_static_join" -> "st25_stream_static_join_closed",
      "st13_stream_quantile_monitor" -> "st22_stream_quantile_monitor_closed",
      "st14_stream_trending" -> "st23_stream_trending_closed",
      "st19_stream_token_budget" -> "st20_stream_token_budget_closed")
    assert(Registry.oracleTwins.map(_.name).toSet === twins.keySet)
    val prodNames = Registry.production.map(_.name).toSet
    twins.values.foreach(p =>
      assert(prodNames.contains(p), s"graduated form $p missing from production set"))
    assert(Registry.production.size + Registry.oracleTwins.size === Registry.all.size)
  }

  test("SparkEntry.entry returns rows (driver t1 smoke)") {
    assert(graft.SparkEntry.entry(spark).count() > 0)
  }

  test("SURVEY.md's registry inventory matches Registry.all (docs can't go stale)") {
    val text = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("SURVEY.md")))
    val m = """\((\d+) registry queries, (\d+) DuckDB-oracle-checked""".r
      .findFirstMatchIn(text)
    assert(m.isDefined, "SURVEY.md must state '(N registry queries, M DuckDB-oracle-checked'")
    assert(m.get.group(1).toInt === Registry.all.size,
      s"SURVEY.md says ${m.get.group(1)} queries; registry has ${Registry.all.size}")
    assert(m.get.group(2).toInt === Registry.oracles.size,
      s"SURVEY.md says ${m.get.group(2)} oracle-checked; registry has ${Registry.oracles.size}")
  }

  for (q <- Registry.all) {
    test(s"${q.name} runs on sf0.001 and returns rows") {
      val df = q.build(spark, sfDir)
      assert(df.count() > 0, s"${q.name} returned 0 rows")
    }
  }

  test("streaming micro-batch plans: no unbounded single-partition funnel, partitioned state") {
    // closes the batch gate's streaming blind spot: every stream runner
    // records its last micro-batch's IncrementalExecution plan
    // (Streams.lastPlans) as it completes; the per-query rows tests
    // above run all st* queries first, so each real streaming
    // capability has a recording by the time this test runs
    // (registration order — run the whole suite, not a -z subset).
    val plans = graft.streaming.Streams.lastPlans
    val expected = Set("hourlyTypeCounts", "distinctKeyDays",
      "incrementalLoad", "attributionPairs", "attributionOuter", "hourlyTypeCountsClosed",
      "attributionFull", "attributionSemi", "typeCountsTws", "corpusIngest",
      "hourlyDistinctUsers", "segmentHourlyRevenue", "nearDupFilter",
      "hourlyValueQuantiles", "hourlyTrending", "tokenBudget",
      "hourlyDistinctUsersClosed", "hourlyValueQuantilesClosed",
      "hourlyTrendingClosed", "nearDupWindowed", "segmentHourlyRevenueClosed")
    assert(expected.subsetOf(plans.keySet),
      s"missing streaming plan recordings: ${expected -- plans.keySet}")
    val boundedChild =
      """(HashAggregate|ObjectHashAggregate|SortAggregate)\(keys?=\[\]""".r
    for (tag <- expected; plan = plans(tag)) {
      // same rule as the batch gate: an Exchange SinglePartition may
      // only feed from an ungrouped aggregate (bounded at any SF)
      val lines = plan.linesIterator.toVector
      val unboundedSingles = lines.zipWithIndex.collect {
        case (l, i) if l.contains("Exchange SinglePartition") &&
          boundedChild.findFirstIn(lines.lift(i + 1).getOrElse("")).isEmpty =>
          lines.lift(i + 1).getOrElse("<leaf>").trim.take(80)
      }
      assert(unboundedSingles.isEmpty,
        s"$tag: unbounded single-partition funnel above $unboundedSingles")
      // every stateful operator prints its state info; partitions > 1
      // or the state store itself is a single-reducer funnel
      val stateParts = """numPartitions\s*=\s*(\d+)""".r
        .findAllMatchIn(plan).map(_.group(1).toInt).toVector
      assert(stateParts.nonEmpty,
        s"$tag: no state-store operator found in the final micro-batch plan:\n" +
          plan.take(2000))
      assert(stateParts.forall(_ > 1),
        s"$tag: single-partition state store: $stateParts")
    }
  }
}
