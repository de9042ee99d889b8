package graft.ops

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class LayoutSpec extends SparkSpec {

  test("compact merges a fragmented table to measured-size file count, content intact") {
    val base = java.nio.file.Files.createTempDirectory("graft_layout").toString
    val fragDir = s"$base/frag"; val outDir = s"$base/compact"
    // fragment: 32 files for a tiny table
    val src = Tables.events(spark, sfDir).drop("ts") // nanos col irrelevant here
    src.repartition(32).write.parquet(fragDir)
    val fragFiles = new java.io.File(fragDir).listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(fragFiles == 32)

    val total = Layout.dirBytes(spark, fragDir)
    assert(total > 0)
    // target = half the table -> expect exactly 2 files
    val written = Layout.compact(spark, fragDir, outDir, (total + 1) / 2)
    assert(written == 2, s"expected 2 compacted files, wrote $written")

    val before = src.orderBy("event_id").collect()
    val after = spark.read.parquet(outDir).orderBy("event_id").collect()
    assert(before.sameElements(after), "compaction changed table content")
  }

  test("compact refuses in-place overwrite (reads would race deletes)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_layout3").toString
    intercept[IllegalArgumentException] {
      Layout.compact(spark, s"$dir/t", s"$dir/t", 1024L)
    }
    // different spellings of the same directory must not slip past
    intercept[IllegalArgumentException] {
      Layout.compact(spark, s"file:$dir/t", s"$dir/t", 1024L)
    }
  }

  test("targetFiles sizing arithmetic") {
    assert(Layout.targetFiles(0L, 128L) == 1)
    assert(Layout.targetFiles(129L, 128L) == 2)
    assert(Layout.targetFiles(128L, 128L) == 1)
  }

  test("clusterBy sorts within partitions without an extra shuffle") {
    val base = java.nio.file.Files.createTempDirectory("graft_layout2").toString
    val fragDir = s"$base/frag"; val outDir = s"$base/clustered"
    Tables.customer(spark, sfDir).write.parquet(fragDir)
    Layout.compact(spark, fragDir, outDir, Long.MaxValue,
      clusterBy = Seq("c_nationkey"))
    // single output file, sorted by nation key -> values are non-decreasing
    val vals = spark.read.parquet(outDir).select("c_nationkey")
      .collect().map(_.getInt(0))
    assert(vals.nonEmpty && vals.sameElements(vals.sorted),
      "clusterBy did not produce partition-local sorted output")
  }
}
