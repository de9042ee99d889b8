package graft.ops

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Byte-level regression gates: plan-shape pins (PlanQualitySpec)
  * can't see a projection regression that keeps the shape but
  * multiplies the bytes shuffled — these specs pin measured volume,
  * always as RELATIVE comparisons (never absolute bytes, which drift
  * with codecs/versions). */
class ShuffleAuditSpec extends SparkSpec {

  private def withConf[T](k: String, v: String)(body: => T): T = {
    val saved = spark.conf.get(k)
    try { spark.conf.set(k, v); body }
    finally spark.conf.set(k, saved)
  }

  test("q01's aggregate-below-join shuffles fewer bytes than join-then-aggregate") {
    // broadcast off so both formulations shuffle their join inputs —
    // the optimized form shuffles per-order partial sums, the naive
    // form full lineitem rows
    withConf("spark.sql.autoBroadcastJoinThreshold", "-1") {
      val opt = ShuffleAudit.measure(
        graft.queries.Registry.queries("q01_topk_revenue")(spark, sfDir))
      val li = Tables.lineitem(spark, sfDir)
      val o = Tables.orders(spark, sfDir)
      val c = Tables.customer(spark, sfDir)
      val naive = ShuffleAudit.measure(
        li.join(o, li("l_orderkey") === o("o_orderkey"))
          .join(c, o("o_custkey") === c("c_custkey"))
          .groupBy(c("c_custkey"), c("c_name"))
          .agg(sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
            .cast(DecimalType(18, 4))).cast("double").as("revenue"))
          .filter(col("revenue") > 0)
          .orderBy(col("revenue").desc, col("c_custkey"))
          .limit(10))
      assert(opt.shuffleWrite > 0)
      assert(opt.shuffleWrite < naive.shuffleWrite,
        s"opt=${opt.shuffleWrite}B naive=${naive.shuffleWrite}B")
    }
  }

  test("q18's dim broadcasts cut shuffle volume vs all-shuffle joins") {
    def q18() = graft.queries.Registry.queries("q18_region_dashboard")(spark, sfDir)
    val broadcast = ShuffleAudit.measure(q18())
    val shuffled = withConf("spark.sql.autoBroadcastJoinThreshold", "-1") {
      ShuffleAudit.measure(q18())
    }
    assert(broadcast.shuffleWrite * 2 < shuffled.shuffleWrite,
      s"broadcast=${broadcast.shuffleWrite}B shuffled=${shuffled.shuffleWrite}B")
  }
}
