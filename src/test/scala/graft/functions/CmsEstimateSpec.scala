package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** CmsEstimate (the count-min sketch probe) against the sketch the
  * built-in `count_min_sketch` aggregate produces: estimates must obey
  * the CMS contract (never below the true count, within ε·N above it)
  * and absent keys must stay small (≤ ε·N). */
class CmsEstimateSpec extends SparkSpec {
  import spark.implicits._

  private def probe(skDf: org.apache.spark.sql.DataFrame, keys: Seq[Long]) = {
    GraftFunctions.register(spark)
    keys.toDF("k").crossJoin(broadcast(skDf))
      .select(col("k"),
        call_function("graft_cms_estimate", col("sk"), col("k")).as("est"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("estimates never underestimate and stay within eps*N of exact counts") {
    // skewed frequencies: key k appears k times, N = 1+2+...+40
    val rows = (1L to 40L).flatMap(k => Seq.fill(k.toInt)(k))
    val df = rows.toDF("v").repartition(7) // exercise partial-agg merge
    val sk = df.agg(expr("count_min_sketch(v, 0.001d, 0.99d, 42)").as("sk"))
    val n = rows.size
    val est = probe(sk, (1L to 40L))
    (1L to 40L).foreach { k =>
      assert(est(k) >= k, s"CMS underestimated key $k: ${est(k)}")
      assert(est(k) <= k + math.ceil(0.001 * n).toLong,
        s"CMS overestimate for key $k past eps*N: ${est(k)}")
    }
  }

  test("absent keys estimate at most eps*N (here: 0 collisions expected)") {
    val df = (1L to 1000L).toDF("v")
    val sk = df.agg(expr("count_min_sketch(v, 0.001d, 0.99d, 42)").as("sk"))
    val est = probe(sk, Seq(5000L, 999999L))
    est.values.foreach(e => assert(e <= 1L, s"absent-key estimate too high: $e"))
  }

  test("works from SQL text via the registered function") {
    GraftFunctions.register(spark)
    (1L to 100L).toDF("v").createOrReplaceTempView("cms_in")
    val r = spark.sql("""
      WITH s AS (SELECT count_min_sketch(v, 0.01d, 0.99d, 7) AS sk FROM cms_in)
      SELECT graft_cms_estimate(sk, 42L) AS est FROM s""").collect()
    assert(r.head.getLong(0) >= 1L)
  }

  test("non-matching input types are an analysis error") {
    GraftFunctions.register(spark)
    (1 to 3).toDF("v").createOrReplaceTempView("cms_bad")
    val e = intercept[Exception] {
      spark.sql("SELECT graft_cms_estimate(CAST('x' AS STRING), 1L)").collect()
    }
    assert(e.getMessage.toLowerCase.contains("graft_cms_estimate") ||
      e.getMessage.toLowerCase.contains("binary"))
  }
}
