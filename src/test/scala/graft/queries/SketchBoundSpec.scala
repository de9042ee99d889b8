package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** SF-determinism procedure for the probabilistic-bound family — the
  * round-7 verdict's item 6. Every sketch query ships a `within_bound`
  * column whose oracle twin is the literal 1, so the driver's sf0.01
  * gate pins the flag at sf0.01 ONLY; a bound that flakes at another
  * scale (q60's scaladoc documents the exact failure math) would pass
  * every round until the data grew. This spec re-evaluates the flag at
  * BOTH sf0.01 and sf0.1 each `sbt test` run: for each family member,
  * every row's within_bound must be 1 at both scales. (sf0.001 is
  * skipped deliberately — several sketches degenerate to exact at
  * 6k rows and prove nothing.)
  */
class SketchBoundSpec extends SparkSpec {

  /** every registry query carrying a within_bound flag: the batch
    * sketch warehouse (q29 approx-distinct, q35 GK quantiles, q55
    * theta rollup, q60 CMS heavy hitters, q61 overlap, q63 trailing
    * distinct, q64 churn, q65 KLL rollup, q68 Misra-Gries, q69
    * profile) and the streaming sketch members (st10 HLL cardinality,
    * st13 KLL monitor, st14 trending). */
  private val family = Seq(
    "q29_approx_distinct", "q35_approx_percentiles", "q55_sketch_rollup",
    "q60_heavy_hitters", "q61_sketch_overlap", "q63_trailing_distinct",
    "q64_sketch_churn", "q65_kll_quantile_rollup", "q68_frequent_items",
    "q69_table_profile",
    "st10_stream_sketch_cardinality", "st13_stream_quantile_monitor",
    "st14_stream_trending")

  for (sf <- Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1");
       name <- family) {
    test(s"$name stays within its probabilistic bound at ${sf.split('/').last}") {
      val df = Registry.queries(name)(spark, sf)
      assert(df.columns.contains("within_bound"),
        s"$name lost its within_bound column")
      val bad = df.filter(col("within_bound") =!= 1).count()
      assert(bad == 0, s"$name: $bad rows out of bound at $sf")
    }
  }
}
