package graft.queries

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** q29's HLL estimates are approximate by design — the contract is
  * bounded error against exact COUNT DISTINCT at the declared rsd. */
class SketchSpec extends SparkSpec {

  test("approx_count_distinct within 3x rsd of exact per group") {
    val approx = Registry.queries("q29_approx_distinct")(spark, sfDir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = Tables.lineitem(spark, sfDir)
      .groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_orderkey")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(approx.keySet === exact.keySet)
    exact.foreach { case (k, n) =>
      val err = math.abs(approx(k) - n).toDouble / n
      assert(err <= 0.15, f"group $k: approx=${approx(k)} exact=$n err=$err%.3f")
    }
  }

  test("approx_percentile within 5% relative error of exact per group") {
    def byGroup(name: String): Map[String, Seq[Double]] =
      Registry.queries(name)(spark, sfDir).collect()
        .map(r => r.getString(0) -> Seq(r.getDouble(1), r.getDouble(2), r.getDouble(3)))
        .toMap
    val approx = byGroup("q35_approx_percentiles")
    val exact = byGroup("q32_percentiles")
    assert(approx.keySet === exact.keySet)
    for (k <- exact.keySet; (a, e) <- approx(k).zip(exact(k))) {
      val err = math.abs(a - e) / e
      assert(err <= 0.05, f"group $k: approx=$a exact=$e err=$err%.3f")
    }
  }
}
