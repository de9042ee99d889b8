package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Join, LogicalPlan}
import org.apache.spark.sql.functions._

/** The AUTO cost gate of [[PushPartialAggThroughUniqueJoin]] — the
  * round-8 graduation from force-flag to measured profitability. Pins:
  * (1) a high-reduction fact (many rows per join key) FIRES under
  * `auto`; (2) a reduction-1 fact (keys unique in the fact — the
  * classic eager-aggregation loss case) is SKIPPED under `auto` while
  * `true` still fires on it (the gate, not the soundness check, is
  * what skipped); (3) the threshold is live config — raising it above
  * the measured reduction turns the same plan off; (4) a TRY-mode sum
  * blocks the rewrite in every mode (merge Sum would skip NULL
  * overflow markers); (5) auto-fired results equal the naive plan's.
  */
class EagerAggAutoSpec extends SparkSpec {

  override def beforeAll(): Unit = {
    super.beforeAll()
    if (!spark.experimental.extraOptimizations
        .contains(PushPartialAggThroughUniqueJoin))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+
          (PushPartialAggThroughUniqueJoin: org.apache.spark.sql.catalyst
            .rules.Rule[LogicalPlan])
  }

  private def withConf[T](kv: (String, String)*)(body: => T): T = {
    val prev = kv.map { case (k, _) => k -> spark.conf.getOption(k) }
    kv.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally prev.foreach { case (k, vo) =>
      vo.fold(spark.conf.unset(k))(spark.conf.set(k, _)) }
  }

  private def aggBelowJoin(plan: LogicalPlan): Boolean = plan.collect {
    case j: Join if j.left.collectFirst { case a: Aggregate => a }.isDefined => j
  }.nonEmpty

  /** fact with `rep` rows per key over `nKeys` keys + a unique dim. */
  private def shaped(nKeys: Int, rep: Int): DataFrame = {
    import spark.implicits._
    val fact = (0 until nKeys * rep).map(i => (i % nKeys, i.toLong))
      .toDF("fk", "v")
    val dim = (0 until nKeys).map(k => (k, s"g${k % 7}")).toDF("dk", "grp")
      .dropDuplicates("dk")
    fact.join(dim, col("fk") === col("dk"))
      .groupBy(col("grp"))
      .agg(sum(col("v")).as("sv"), count(lit(1)).as("n"))
  }

  test("auto fires on a high-reduction fact and skips a reduction-1 fact") {
    PushPartialAggThroughUniqueJoin.clearProbeCache()
    withConf(PushPartialAggThroughUniqueJoin.FLAG -> "auto") {
      val hot = shaped(nKeys = 50, rep = 40) // reduction ≈ 40
      assert(aggBelowJoin(hot.queryExecution.optimizedPlan),
        "reduction≈40 must clear the 3.0 default bar")
      val flat = shaped(nKeys = 2000, rep = 1) // reduction ≈ 1
      assert(!aggBelowJoin(flat.queryExecution.optimizedPlan),
        "reduction≈1 is the Yan&Larson loss case — auto must skip it")
    }
    // prove the skip was the COST gate, not a soundness bail: mode
    // `true` (no gate) fires on the identical reduction-1 plan
    withConf(PushPartialAggThroughUniqueJoin.FLAG -> "true") {
      val flat = shaped(nKeys = 2000, rep = 1)
      assert(aggBelowJoin(flat.queryExecution.optimizedPlan),
        "soundness holds on the flat fact — only the gate may skip it")
    }
  }

  test("minReduction is live config: a bar above the measured factor turns auto off") {
    PushPartialAggThroughUniqueJoin.clearProbeCache()
    withConf(
        PushPartialAggThroughUniqueJoin.FLAG -> "auto",
        PushPartialAggThroughUniqueJoin.MIN_REDUCTION -> "100.0") {
      val hot = shaped(nKeys = 50, rep = 40)
      assert(!aggBelowJoin(hot.queryExecution.optimizedPlan),
        "reduction≈40 must not clear a 100.0 bar")
    }
  }

  test("try_sum blocks the rewrite in every mode (NULL-on-overflow partials don't merge)") {
    import spark.implicits._
    val fact = (0 until 1000).map(i => (i % 10, i.toLong)).toDF("fk", "v")
    val dim = (0 until 10).map(k => (k, s"g$k")).toDF("dk", "grp")
      .dropDuplicates("dk")
    val q = fact.join(dim, col("fk") === col("dk"))
      .groupBy(col("grp"))
      .agg(try_sum(col("v")).as("sv"))
    for (mode <- Seq("auto", "true")) {
      PushPartialAggThroughUniqueJoin.clearProbeCache()
      withConf(PushPartialAggThroughUniqueJoin.FLAG -> mode) {
        assert(!aggBelowJoin(q.queryExecution.optimizedPlan),
          s"try_sum must bail under mode=$mode")
      }
    }
    // ...and force (the spec surface) bails on it too
    assert(!aggBelowJoin(PushPartialAggThroughUniqueJoin.force(
      q.queryExecution.analyzed)))
  }

  test("auto-fired plan returns the naive plan's exact rows") {
    PushPartialAggThroughUniqueJoin.clearProbeCache()
    val naive = withConf(PushPartialAggThroughUniqueJoin.FLAG -> "false") {
      shaped(nKeys = 50, rep = 40).orderBy("grp").collect().toSeq
    }
    val fired = withConf(PushPartialAggThroughUniqueJoin.FLAG -> "auto") {
      val df = shaped(nKeys = 50, rep = 40)
      assert(aggBelowJoin(df.queryExecution.optimizedPlan))
      df.orderBy("grp").collect().toSeq
    }
    assert(fired === naive)
  }
}
