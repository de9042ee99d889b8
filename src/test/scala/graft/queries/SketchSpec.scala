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
}
