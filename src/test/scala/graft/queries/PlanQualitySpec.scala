package graft.queries

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Physical-plan quality gates — the 100 TB properties the brief grades:
  * dims broadcast, predicates reach the parquet scan, projection prunes
  * the read schema, top-k plans as TakeOrderedAndProject, partitioned
  * layouts prune partitions. A plan regression fails CI even while
  * results stay correct. */
class PlanQualitySpec extends SparkSpec {

  private def plan(name: String): String =
    Registry.queries(name)(spark, sfDir).queryExecution.executedPlan.toString

  test("q01 joins dims via BroadcastHashJoin (no fact-side shuffle join)") {
    val p = plan("q01_topk_revenue")
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
    assert(!p.contains("SortMergeJoin"), p.take(2000))
  }

  test("q18 4-way dashboard join broadcasts every dim") {
    val p = plan("q18_region_dashboard")
    assert(p.sliding("BroadcastHashJoin".length).count(_ == "BroadcastHashJoin") >= 3, p.take(3000))
    assert(!p.contains("SortMergeJoin"), p.take(3000))
  }

  test("q01 top-k plans as TakeOrderedAndProject (no global sort)") {
    val p = plan("q01_topk_revenue")
    assert(p.contains("TakeOrderedAndProject"), p.take(2000))
  }

  test("filter on orders reaches the parquet scan as a pushed filter") {
    val df = Tables.orders(spark, sfDir).filter(col("o_orderstatus") === "F")
      .select("o_orderkey")
    val scan = df.queryExecution.executedPlan.toString
    assert(scan.contains("PushedFilters: [IsNotNull(o_orderstatus), EqualTo(o_orderstatus,F)]"), scan)
  }

  test("projection prunes the parquet read schema to selected columns") {
    val df = Tables.lineitem(spark, sfDir).select("l_orderkey", "l_quantity")
    val scan = df.queryExecution.executedPlan.toString
    assert(scan.contains("ReadSchema: struct<l_orderkey:bigint,l_quantity:"), scan)
  }

  test("season-partitioned layout prunes partitions on a season filter") {
    val dir = java.nio.file.Files.createTempDirectory("graft-part").toString
    import spark.implicits._
    val facts = Seq((2425, 1, 10.0), (2425, 2, 20.0), (2526, 3, 30.0))
      .toDF("season", "game_id", "xg")
    facts.write.partitionBy("season").mode("overwrite").parquet(s"$dir/facts")
    val read = spark.read.parquet(s"$dir/facts").filter(col("season") === 2526)
    val p = read.queryExecution.executedPlan.toString
    assert(p.contains("PartitionFilters: [isnotnull(season"), p)
    assert(read.count() === 1)
    // the pruned scan reads exactly one of the two season directories
    val scanned = read.queryExecution.executedPlan.collectLeaves().head
      .metrics("numFiles").value
    assert(read.count() === 1 && scanned <= 1)
  }
}
