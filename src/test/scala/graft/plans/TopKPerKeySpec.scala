package graft.plans

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The custom physical operator must agree with the window
  * formulation and must NOT sort partitions. */
class TopKPerKeySpec extends SparkSpec {
  import spark.implicits._

  test("matches row_number window results on testdata orders") {
    val o = Tables.orders(spark, sfDir)
    val viaOp = TopK.perKey(o,
        Seq(col("o_custkey")), Seq(col("o_totalprice").desc, col("o_orderkey")), 3)
      .select("o_custkey", "o_orderkey")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    val viaWindow = o.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3).select("o_custkey", "o_orderkey")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(viaOp === viaWindow)
    assert(viaOp.nonEmpty)
  }

  test("plans TopKPerKeyExec with a shuffle but WITHOUT a Sort") {
    val o = Tables.orders(spark, sfDir)
    val df = TopK.perKey(o, Seq(col("o_custkey")), Seq(col("o_totalprice").desc), 3)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKey"), plan.take(1500)) // exec nodes print without "Exec"
    assert(plan.contains("Exchange"), plan.take(1500))      // clustered dist enforced
    assert(!plan.contains("Sort "), plan.take(1500))        // no per-partition sort
  }

  test("ties and k larger than group size behave like the window form") {
    val df = Seq(("a", 1), ("a", 1), ("a", 2), ("b", 5)).toDF("k", "v")
    val out = TopK.perKey(df, Seq(col("k")), Seq(col("v")), 10)
      .collect().map(r => (r.getString(0), r.getInt(1))).toSeq.sorted
    assert(out === Seq(("a", 1), ("a", 1), ("a", 2), ("b", 5)))
  }
}
