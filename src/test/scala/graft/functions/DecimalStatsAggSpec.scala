package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

class DecimalStatsAggSpec extends SparkSpec {
  import spark.implicits._

  private def typedStats(partitions: Int) = {
    val ds = graft.Tables.events(spark, sfDir)
      .repartition(partitions)
      .select(col("event_type").as("key"),
        col("value").cast(DecimalType(18, 6)).as("value"))
      .as[DecValue]
    ds.groupByKey(_.key).agg(DecimalStatsAgg.toColumn.name("stats"))
      .collect().toMap
  }

  test("partition-count invariance: exact decimal buffers merge order-independently") {
    val a = typedStats(1)
    val b = typedStats(7)
    assert(a.keySet == b.keySet && a.keySet.nonEmpty)
    a.foreach { case (k, s) =>
      assert(s == b(k), s"stats for $k differ between partitionings")
    }
  }

  test("null values are skipped, not counted") {
    val ds = Seq(
      DecValue("a", Some(BigDecimal("1.5"))),
      DecValue("a", None),
      DecValue("a", Some(BigDecimal("2.5")))).toDS()
    val out = ds.groupByKey(_.key).agg(DecimalStatsAgg.toColumn.name("s"))
      .collect().head._2
    assert(out.n_vals == 2L)
    assert(out.mean.contains(2.0))
    assert(out.var_samp.contains(0.5))
  }

  test("singleton group yields var_samp None (SQL NULL), not NaN/inf") {
    val ds = Seq(DecValue("a", Some(BigDecimal("7.25")))).toDS()
    val out = ds.groupByKey(_.key).agg(DecimalStatsAgg.toColumn.name("s"))
      .collect().head._2
    assert(out.n_vals == 1L && out.mean.contains(7.25) && out.var_samp.isEmpty)
  }

  test("empty group (all nulls) yields mean None (SQL NULL), not NaN") {
    val ds = Seq(DecValue("a", None), DecValue("a", None)).toDS()
    val out = ds.groupByKey(_.key).agg(DecimalStatsAgg.toColumn.name("s"))
      .collect().head._2
    assert(out.n_vals == 0L && out.mean.isEmpty && out.var_samp.isEmpty)
  }

  test("typed aggregation plans map-side partial buffers (ObjectHashAggregate)") {
    val ds = graft.Tables.events(spark, sfDir)
      .select(col("event_type").as("key"),
        col("value").cast(DecimalType(18, 6)).as("value"))
      .as[DecValue]
    val plan = ds.groupByKey(_.key).agg(DecimalStatsAgg.toColumn.name("stats"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"), plan.take(600))
    assert("ObjectHashAggregate".r.findAllIn(plan).size >= 2,
      "expected partial + final typed aggregation:\n" + plan.take(600))
  }
}
