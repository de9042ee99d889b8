package graft.ops

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class BloomSemiSpec extends SparkSpec {
  import spark.implicits._

  private def probe = Tables.customer(spark, sfDir)
  private def build = Tables.orders(spark, sfDir)
    .filter(col("o_totalprice") > 250000).select(col("o_custkey"))

  test("composite equals the plain left_semi join exactly") {
    val composite = BloomSemi.semiJoin(probe, col("c_custkey"), build,
        col("o_custkey"), numBits = 1 << 12, k = 3)
      .select("c_custkey").as[Long].collect().sorted
    val plain = probe.join(build, col("c_custkey") === col("o_custkey"), "left_semi")
      .select("c_custkey").as[Long].collect().sorted
    assert(composite.sameElements(plain))
    assert(plain.nonEmpty)
  }

  test("prefilter passes every true match (no false negatives) and prunes") {
    val bloom = BloomSemi.buildBits(build, col("o_custkey"), 1 << 12, 3)
    val pre = BloomSemi.prefilter(probe, col("c_custkey"), bloom, 1 << 12, 3)
      .select("c_custkey").as[Long].collect().toSet
    val truth = probe.join(build, col("c_custkey") === col("o_custkey"), "left_semi")
      .select("c_custkey").as[Long].collect().toSet
    assert(truth.subsetOf(pre), "bloom prefilter lost a true match")
    val total = probe.count()
    assert(pre.size < total,
      s"prefilter pruned nothing (${pre.size} of $total survived)")
  }

  test("tiny filter saturates gracefully: all rows pass, result still exact") {
    // 64 bits with hundreds of keys -> bitset ~all ones; the composite
    // must degrade to the plain semi join, never drop rows.
    val composite = BloomSemi.semiJoin(probe, col("c_custkey"), build,
        col("o_custkey"), numBits = 64, k = 2)
      .select("c_custkey").as[Long].collect().sorted
    val plain = probe.join(build, col("c_custkey") === col("o_custkey"), "left_semi")
      .select("c_custkey").as[Long].collect().sorted
    assert(composite.sameElements(plain))
  }

  test("bloom_bits works from SQL text via the registered function") {
    graft.functions.GraftFunctions.register(spark)
    build.select(BloomSemi.bitPositions(col("o_custkey"), 1 << 12, 3)
      .as("pos")).createOrReplaceTempView("bloom_pos_v")
    val words = spark.sql(
      "SELECT graft_bloom_bits(pos, 4096) AS bits FROM bloom_pos_v")
      .select(size(col("bits"))).as[Int].head()
    assert(words == 4096 / 64)
  }
}
