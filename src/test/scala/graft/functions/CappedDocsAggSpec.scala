package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** CappedDocsAgg: exact counts always; complete posting lists while
  * the group is within the cap; truncation (not failure) beyond it. */
class CappedDocsAggSpec extends SparkSpec {
  import spark.implicits._

  test("count exact and docs complete for groups within the cap, any partitioning") {
    val rows = (1 to 300).map(i => ((i % 37).toLong, i.toLong))
    for (parts <- Seq(1, 8)) {
      val df = spark.createDataset(rows).repartition(parts).toDF("g", "doc")
      val got = df.groupBy("g")
        .agg(CappedDocsAgg.cappedDocs(col("doc"), 20).as("pd"))
        .select(col("g"), col("pd.n"), col("pd.docs"))
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getSeq[Long](2).sorted))).toMap
      val exact = rows.groupBy(_._1).map { case (g, xs) =>
        g -> ((xs.size.toLong, xs.map(_._2).sorted)) }
      // every group here has ≤ ceil(300/37)=9 ≤ 20 members: lists complete
      assert(got === exact)
    }
  }

  test("non-bigint input is an analysis error, not a runtime ClassCastException") {
    val df = spark.createDataset(Seq((1, 2), (1, 3))).toDF("g", "doc") // doc: int
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      df.groupBy("g").agg(CappedDocsAgg.cappedDocs(col("doc"), 4)).collect()
    }
    assert(e.getMessage.contains("graft_capped_docs"))
  }

  test("groups beyond the cap keep the exact count and a truncated list") {
    val df = (1L to 100L).toDF("doc").withColumn("g", lit(0))
      .repartition(4)
    val r = df.groupBy("g").agg(CappedDocsAgg.cappedDocs(col("doc"), 20).as("pd"))
      .select(col("pd.n"), col("pd.docs")).collect()(0)
    assert(r.getLong(0) === 100L)        // count stays exact
    assert(r.getSeq[Long](1).size === 21) // cap+1 proves overflow, no more
  }

  test("nulls skipped") {
    val df = Seq(Some(1L), None, Some(2L)).toDF("doc").withColumn("g", lit(0))
    val r = df.groupBy("g").agg(CappedDocsAgg.cappedDocs(col("doc"), 5).as("pd"))
      .select(col("pd.n"), col("pd.docs")).collect()(0)
    assert(r.getLong(0) === 2L)
    assert(r.getSeq[Long](1).sorted === Seq(1L, 2L))
  }
}
