package graft.plans

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The row_number→TopKPerKey rewrite must fire on the canonical
  * dropped-rank idiom, stay away when the rank survives, and return
  * the identical row set (orders here use a total tiebreak). */
class RewriteRowNumberTopKSpec extends SparkSpec {

  private lazy val s2 = {
    val s = spark.newSession()
    s.experimental.extraOptimizations = Seq(RewriteRowNumberTopK)
    s.experimental.extraStrategies = Seq(TopKStrategy)
    s
  }

  private def topkPipeline(ss: org.apache.spark.sql.SparkSession) = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables.orders(ss, sfDir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select("o_custkey", "o_orderkey", "o_totalprice")
  }

  test("rewrite fires: heap operator, no per-partition sort, no window") {
    val df = topkPipeline(s2)
    // physical nodes print without the Exec suffix
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKey "), plan.take(2000))
    assert(!plan.contains("Window") && !plan.contains("Sort "), plan.take(2000))
  }

  test("rewritten result row set equals the window formulation") {
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(rows(topkPipeline(s2)) === rows(topkPipeline(spark)))
  }

  test("rewrite does NOT fire when the rank column survives") {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    val df = Tables.orders(s2, sfDir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select("o_custkey", "rn") // rank used downstream → window must stay
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("TopKPerKeyExec"), plan.take(2000))
  }

  test("rewrite does NOT fire on an empty PARTITION BY (global top-k) — and the query still runs") {
    // row_number() OVER (ORDER BY …) with the rank dropped used to match
    // the rewrite and then die at planning time on
    // ClusteredDistribution(Nil); it must be left to Spark's own path.
    val w = Window.orderBy(col("o_totalprice").desc, col("o_orderkey"))
    def global(ss: org.apache.spark.sql.SparkSession) =
      Tables.orders(ss, sfDir)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 5)
        .select("o_orderkey", "o_totalprice")
    val df = global(s2)
    assert(!df.queryExecution.executedPlan.toString.contains("TopKPerKey "))
    def rows(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
    assert(rows(df) === rows(global(spark)))
  }

  test("direct TopK.perKey with no keys plans AllTuples and returns the global top-k") {
    val got = TopK.perKey(Tables.orders(s2, sfDir), Seq.empty,
        Seq(col("o_totalprice").desc, col("o_orderkey")), 5)
      .select("o_orderkey", "o_totalprice")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
    val want = Tables.orders(spark, sfDir)
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(5)
      .select("o_orderkey", "o_totalprice")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
    assert(got === want)
  }

  test("rewrite does NOT fire for other window functions") {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    val df = Tables.orders(s2, sfDir)
      .withColumn("rk", rank().over(w))
      .filter(col("rk") <= 3)
      .select("o_custkey", "o_orderkey")
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("TopKPerKeyExec"), plan.take(2000))
  }
}
