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

  test("keyed prefix sum equals the partitioned window formulation") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val df = (1 to 5000).map { i =>
      (s"k${rnd.nextInt(4)}", i.toLong, rnd.nextInt(100).toLong)
    }.toDF("g", "k", "v").repartition(13)
    val scanned = Pack.keyedExclusivePrefixSum(
        df, Seq("g"), Seq(col("k")), "v", "ps")
      .select("g", "k", "ps").as[(String, Long, Long)].collect()
      .map(t => (t._1, t._2) -> t._3).toMap
    val windowed = df.withColumn("ps",
        coalesce(sum(col("v")).over(
          Window.partitionBy(col("g")).orderBy(col("k"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("g", "k", "ps").as[(String, Long, Long)].collect()
      .map(t => (t._1, t._2) -> t._3).toMap
    assert(scanned.size === 5000)
    assert(scanned === windowed)
  }

  test("densePerKey ranks 1..N_k inside each group, seam-correct across partitions") {
    import spark.implicits._
    val coalesce = spark.conf.get("spark.sql.adaptive.coalescePartitions.enabled")
    try {
      spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      val df = (1 to 3000).map(i => (s"g${i % 3}", i.toLong)).toDF("g", "k")
      val out = Ids.densePerKey(df, Seq("g"), Seq(col("k")), "rk")
      assert(out.rdd.getNumPartitions > 1)
      val perKey = out.select("g", "rk").as[(String, Long)].collect()
        .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
      for ((g, ranks) <- perKey)
        assert(ranks === (1L to 1000L).toArray, s"group $g ranks broken")
      // rank order agrees with the sort key order inside each group
      val rows = out.select("g", "k", "rk").as[(String, Long, Long)].collect()
      for ((_, grp) <- rows.groupBy(_._1))
        assert(grp.sortBy(_._2).map(_._3).toSeq === grp.sortBy(_._2).indices.map(_ + 1L))
    } finally spark.conf.set(
      "spark.sql.adaptive.coalescePartitions.enabled", coalesce)
  }

  test("non-Long value column is rejected with a clear error, not a ClassCastException") {
    import spark.implicits._
    val df = Seq(("a", 1L, 1), ("a", 2L, 2)).toDF("g", "k", "v") // v: Int
    val e1 = intercept[IllegalArgumentException] {
      Pack.exclusivePrefixSum(df, Seq(col("k")), "v", "ps")
    }
    assert(e1.getMessage.contains("must be LongType"))
    val e2 = intercept[IllegalArgumentException] {
      Pack.keyedExclusivePrefixSum(df, Seq("g"), Seq(col("k")), "v", "ps")
    }
    assert(e2.getMessage.contains("must be LongType"))
  }

  test("binary key column is rejected up front (reference-equality hazard)") {
    import spark.implicits._
    val df = Seq((Array[Byte](1, 2), 1L, 1L), (Array[Byte](1, 2), 2L, 2L))
      .toDF("g", "k", "v")
    val e = intercept[IllegalArgumentException] {
      Pack.keyedExclusivePrefixSum(df, Seq("g"), Seq(col("k")), "v", "ps")
    }
    assert(e.getMessage.contains("binary key column"))
  }

  test("keyed prefix sum rejects null values fast") {
    import spark.implicits._
    val df = Seq(("a", 1L, java.lang.Long.valueOf(1L)),
      ("a", 2L, null.asInstanceOf[java.lang.Long]))
      .toDF("g", "k", "v")
    val ex = intercept[org.apache.spark.SparkException] {
      Pack.keyedExclusivePrefixSum(df, Seq("g"), Seq(col("k")), "v", "ps")
        .collect()
    }
    assert(ex.getMessage.contains("null") ||
      Option(ex.getCause).exists(_.getMessage.contains("null")))
  }
}
