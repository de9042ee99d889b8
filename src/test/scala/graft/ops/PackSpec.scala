package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The two-phase scan must equal the single-partition window cumsum
  * on data that actually spans multiple partitions. */
class PackSpec extends SparkSpec {

  test("exclusive prefix sum equals the window formulation across partitions") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val df = (1 to 5000).map(i => (i.toLong, rnd.nextInt(100).toLong))
      .toDF("k", "v").repartition(13) // deliberately scrambled input
    val scanned = Pack.exclusivePrefixSum(df, Seq(col("k")), "v", "ps")
      .select("k", "ps").as[(Long, Long)].collect().toMap
    val windowed = df.withColumn("ps",
        coalesce(sum(col("v")).over(
          Window.orderBy(col("k")).rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .select("k", "ps").as[(Long, Long)].collect().toMap
    assert(scanned.size === 5000)
    assert(scanned === windowed)
  }

  test("prefix sum output actually spans multiple partitions") {
    import spark.implicits._
    // AQE coalesces small shuffles to one partition, which would make
    // the multi-partition seam claim vacuous at test scale — pin it off
    val coalesce = spark.conf.get("spark.sql.adaptive.coalescePartitions.enabled")
    try {
      spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      val df = (1 to 1000).map(i => (i.toLong, 1L)).toDF("k", "v")
      val out = Pack.exclusivePrefixSum(df, Seq(col("k")), "v", "ps")
      assert(out.rdd.getNumPartitions > 1)
      // contiguous 0..N-1 for unit weights ⇒ offsets seam-correct
      val ps = out.select("ps").as[Long].collect().sorted
      assert(ps === (0L until 1000L).toArray)
    } finally spark.conf.set(
      "spark.sql.adaptive.coalescePartitions.enabled", coalesce)
  }
}
