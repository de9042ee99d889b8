package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Join, LogicalPlan}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** [[PushPartialAggThroughUniqueJoin]] — eager aggregation through a
  * unique-keyed join, the rewrite q01 does by hand. Pins: (1) the
  * rewrite fires only under the flag, (2) the partial Aggregate lands
  * BELOW the Join, (3) results are identical for every merge shape
  * (long sum, decimal sum re-cast, count, min/max), (4) a
  * non-unique dim side blocks the rewrite.
  */
class PushPartialAggSpec extends SparkSpec {

  override def beforeAll(): Unit = {
    super.beforeAll()
    if (!spark.experimental.extraOptimizations
        .contains(PushPartialAggThroughUniqueJoin))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+
          (PushPartialAggThroughUniqueJoin: org.apache.spark.sql.catalyst
            .rules.Rule[LogicalPlan])
  }

  private def fact = graft.Tables.lineitem(spark, sfDir)
    .select(col("l_orderkey"), col("l_quantity"), col("l_extendedprice"))
  private def dim = graft.Tables.orders(spark, sfDir)
    .select(col("o_orderkey"), col("o_orderpriority"))
    .dropDuplicates("o_orderkey") // structural uniqueness proof

  private def query: DataFrame = fact
    .join(dim, col("l_orderkey") === col("o_orderkey"))
    .groupBy(col("o_orderpriority"))
    .agg(
      sum(col("l_quantity")).as("sum_qty"),
      sum(col("l_extendedprice").cast(DecimalType(18, 4))).as("sum_price"),
      count(lit(1)).as("n_rows"),
      min(col("l_quantity")).as("min_qty"),
      max(col("l_quantity")).as("max_qty"))
    .orderBy(col("o_orderpriority"))

  private def withFlag[T](on: Boolean)(body: => T): T = {
    spark.conf.set(PushPartialAggThroughUniqueJoin.FLAG, on.toString)
    try body finally spark.conf.unset(PushPartialAggThroughUniqueJoin.FLAG)
  }

  /** Does the optimized plan hold an Aggregate strictly below a Join? */
  private def aggBelowJoin(plan: LogicalPlan): Boolean = plan.collect {
    case j: Join if j.left.collectFirst { case a: Aggregate => a }.isDefined => j
  }.nonEmpty

  test("flag off: no pushdown; flag on: partial aggregate lands below the join") {
    withFlag(on = false) {
      assert(!aggBelowJoin(query.queryExecution.optimizedPlan))
    }
    withFlag(on = true) {
      assert(aggBelowJoin(query.queryExecution.optimizedPlan),
        "expected the partial Aggregate below the Join")
    }
  }

  test("rewritten plan returns identical results (all four merge shapes)") {
    val base = withFlag(on = false)(query.collect()).toSeq
    val pushed = withFlag(on = true)(query.collect()).toSeq
    assert(pushed === base)
    assert(base.nonEmpty)
  }

  test("non-unique dim side blocks the rewrite") {
    // dim with duplicate keys (no dedup): a key matching d rows
    // multiplies fact rows d times, which partials can't reproduce
    val dup = graft.Tables.orders(spark, sfDir)
      .select(col("o_orderkey"), col("o_orderpriority"))
    val q = fact.join(dup, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(sum(col("l_quantity")).as("sum_qty"))
    withFlag(on = true) {
      assert(!aggBelowJoin(q.queryExecution.optimizedPlan),
        "raw scan is not structurally unique; rewrite must bail")
    }
  }

  test("distinct and right-side aggregates block the rewrite") {
    withFlag(on = true) {
      val qDistinct = fact.join(dim, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(countDistinct(col("l_quantity")).as("d"))
      assert(!aggBelowJoin(qDistinct.queryExecution.optimizedPlan))
      val qRight = fact.join(dim, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_orderkey"))
        .agg(max(col("o_orderpriority")).as("p"))
      assert(!aggBelowJoin(qRight.queryExecution.optimizedPlan))
    }
  }
}
