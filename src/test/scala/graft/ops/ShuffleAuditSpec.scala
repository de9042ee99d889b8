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

  test("q43's bloom prefilter cuts semi-join shuffle bytes vs the plain semi join") {
    // broadcast threshold off so the exact semi join is a shuffle join
    // in both plans (at real scale the build side outgrows broadcast —
    // that regime is exactly when the bloom matters); the 4%-selective
    // build means the composite shuffles ~the matching fraction of the
    // probe plus the constant bitset buffers, vs the full probe table.
    withConf("spark.sql.autoBroadcastJoinThreshold", "-1") {
      val sf01 = "/root/testdata/sf0.01"
      val probe = Tables.orders(spark, sf01)
      val build = Tables.customer(spark, sf01)
        .filter(col("c_nationkey") === 3).select(col("c_custkey"))
      val composite = ShuffleAudit.measure(
        BloomSemi.semiJoin(probe, col("o_custkey"), build, col("c_custkey")))
      val plain = ShuffleAudit.measure(
        probe.join(build, col("o_custkey") === col("c_custkey"), "left_semi"))
      assert(composite.shuffleWrite > 0)
      assert(composite.shuffleWrite * 2 < plain.shuffleWrite,
        s"composite=${composite.shuffleWrite}B plain=${plain.shuffleWrite}B")
    }
  }
}
