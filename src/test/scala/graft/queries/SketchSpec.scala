package graft.queries

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** The sketch queries are approximate by design — the contract is
  * bounded error, enforced twice: raw sketch-vs-exact bounds here, and
  * the `within_bound` flag both q29/q35 emit for the driver's hash
  * gate (the oracle asserts the literal 1 the bound guarantees, so a
  * sketch regression fails the external compare too). */
class SketchSpec extends SparkSpec {

  test("q29/q35/q55/st10 within_bound flags are 1 for every group (the hash-gated form)") {
    for (name <- Seq("q29_approx_distinct", "q35_approx_percentiles",
        "q55_sketch_rollup", "st10_stream_sketch_cardinality")) {
      val rows = Registry.queries(name)(spark, sfDir).collect()
      assert(rows.nonEmpty, s"$name returned no rows")
      rows.foreach { r =>
        assert(r.getInt(r.fieldIndex("within_bound")) === 1,
          s"$name group ${r.get(0)}: sketch outside its declared bound")
      }
    }
  }

  test("approx_count_distinct within 3x rsd of exact per group") {
    val li = Tables.lineitem(spark, sfDir)
    val both = li.groupBy(col("l_returnflag"))
      .agg(approx_count_distinct(col("l_orderkey"), 0.05).as("a"),
        countDistinct(col("l_orderkey")).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(both.nonEmpty)
    both.foreach { case (k, a, n) =>
      val err = math.abs(a - n).toDouble / n
      assert(err <= 0.15, f"group $k: approx=$a exact=$n err=$err%.3f")
    }
  }

  test("approx_percentile within 5% relative error of exact per group") {
    val o = Tables.orders(spark, sfDir)
    val approx = o.groupBy(col("o_orderstatus"))
      .agg(
        round(expr("approx_percentile(o_totalprice, 0.5, 100)"), 2).as("p50"),
        round(expr("approx_percentile(o_totalprice, 0.9, 100)"), 2).as("p90"),
        round(expr("approx_percentile(o_totalprice, 0.99, 100)"), 2).as("p99"))
      .collect()
      .map(r => r.getString(0) -> Seq(r.getDouble(1), r.getDouble(2), r.getDouble(3)))
      .toMap
    val exact = Registry.queries("q32_percentiles")(spark, sfDir).collect()
      .map(r => r.getString(0) -> Seq(r.getDouble(1), r.getDouble(2), r.getDouble(3)))
      .toMap
    assert(approx.keySet === exact.keySet)
    for (k <- exact.keySet; (a, e) <- approx(k).zip(exact(k))) {
      val err = math.abs(a - e) / e
      assert(err <= 0.05, f"group $k: approx=$a exact=$e err=$err%.3f")
    }
  }
}
