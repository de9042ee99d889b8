package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** TopKMinAgg must be value-identical to the unbounded expression form
  * it replaces (slice(array_sort(collect_set(h)), 1, k)) — including
  * duplicate collapse, short groups, and partial-agg merge paths. */
class TopKMinAggSpec extends SparkSpec {
  import spark.implicits._

  private val k = 4

  test("equals slice(array_sort(collect_set)) on pseudo-random data, any partitioning") {
    val rows = (1 to 500).map(i => ((i * 7919) % 23, ((i * 104729) % 997).toLong))
    for (parts <- Seq(1, 7)) {
      val df = spark.createDataset(rows).repartition(parts).toDF("g", "h")
      val ours = df.groupBy("g").agg(TopKMinAgg.topKMin(col("h"), k).as("mins"))
      val ref = df.groupBy("g").agg(slice(array_sort(collect_set(col("h"))), 1, k).as("mins"))
      val o = ours.collect().map(r => r.getInt(0) -> r.getSeq[Long](1)).toMap
      val e = ref.collect().map(r => r.getInt(0) -> r.getSeq[Long](1)).toMap
      assert(o === e)
    }
  }

  test("large k (d03's bottom-k Jaccard sets) equals the expression form") {
    // k larger than some groups (short arrays) and smaller than others
    // (real truncation), across the merge path
    val big = 512
    val rows = (1 to 3000).map(i => ((i * 31) % 5, ((i * 2654435761L) % 100003)))
    val df = spark.createDataset(rows).repartition(11).toDF("g", "h")
    val ours = df.groupBy("g").agg(TopKMinAgg.topKMin(col("h"), big).as("mins"))
    val ref = df.groupBy("g").agg(slice(array_sort(collect_set(col("h"))), 1, big).as("mins"))
    val o = ours.collect().map(r => r.getInt(0) -> r.getSeq[Long](1)).toMap
    val e = ref.collect().map(r => r.getInt(0) -> r.getSeq[Long](1)).toMap
    assert(o === e)
  }

  test("non-bigint input is an analysis error, not a runtime ClassCastException") {
    val df = spark.createDataset(Seq((1, 2), (1, 3))).toDF("g", "h") // h: int
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      df.groupBy("g").agg(TopKMinAgg.topKMin(col("h"), k)).collect()
    }
    assert(e.getMessage.contains("graft_topk_min"))
  }

  test("duplicates collapse; fewer than k distinct yields a short array") {
    val df = Seq((1, 5L), (1, 5L), (1, 3L), (1, 3L), (2, 9L))
      .toDF("g", "h")
    val m = df.groupBy("g").agg(TopKMinAgg.topKMin(col("h"), k).as("mins"))
      .collect().map(r => r.getInt(0) -> r.getSeq[Long](1)).toMap
    assert(m(1) === Seq(3L, 5L))
    assert(m(2) === Seq(9L))
  }

  test("nulls are skipped") {
    val df = Seq((1, Some(2L)), (1, None), (1, Some(1L)))
      .toDF("g", "h")
    val m = df.groupBy("g").agg(TopKMinAgg.topKMin(col("h"), k).as("mins"))
      .collect().map(r => r.getInt(0) -> r.getSeq[Long](1)).toMap
    assert(m(1) === Seq(1L, 2L))
  }
}
