package graft.ops

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** File-layout maintenance for parquet table directories — the
  * small-file compactor every streaming/incremental writer needs:
  * micro-batch loads ([[graft.streaming.Streams]] foreachBatch) and
  * per-trigger appends accrete hundreds of KB-sized files, and at
  * 100 TB an over-fragmented table turns every downstream scan into
  * a listing + task-scheduling storm (one task per tiny file).
  *
  * Sizing is measured, not guessed: the current on-disk byte count
  * (which already reflects parquet encoding + compression) divided by
  * the target file size gives the output file count; round-robin
  * `repartition(n)` balances rows so every output file lands near the
  * target regardless of input skew. An optional cluster-by sorts
  * within partitions (NO extra shuffle — sort is partition-local) so
  * min/max row-group stats stay selective for data-skipping readers.
  */
object Layout {

  /** Total bytes under `dir` (recursive, data files only). */
  def dirBytes(spark: SparkSession, dir: String): Long = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) 0L
    else fs.getContentSummary(p).getLength
  }

  /** Output file count that lands files near `targetFileBytes`. */
  def targetFiles(totalBytes: Long, targetFileBytes: Long): Int =
    math.max(1, math.ceil(totalBytes.toDouble / targetFileBytes).toInt)

  /** Compact the parquet table at `inDir` into `outDir` with files of
    * ~`targetFileBytes`, optionally sorted within partitions by
    * `clusterBy` for row-group stat locality. Returns the file count
    * written. Content is preserved row-for-row. */
  def compact(spark: SparkSession, inDir: String, outDir: String,
      targetFileBytes: Long,
      clusterBy: Seq[String] = Nil): Int = {
    // lazy scans read source files as tasks run — an in-place overwrite
    // would delete them mid-read; compact to a sibling dir and swap
    // (Pipeline.mergeSwap is the swapping pattern). Compare QUALIFIED
    // paths: raw Path equality is literal URI equality, and spellings
    // like "file:/t" vs "/t" or relative-vs-absolute would slip past
    // the guard into the very data loss it exists to prevent.
    val conf = spark.sparkContext.hadoopConfiguration
    def qualified(dir: String) = {
      val p = new Path(dir)
      p.getFileSystem(conf).makeQualified(p)
    }
    require(qualified(inDir) != qualified(outDir),
      s"compact: outDir must differ from inDir ($inDir); write aside and swap")
    val n = targetFiles(dirBytes(spark, inDir), targetFileBytes)
    val df = spark.read.parquet(inDir)
    val repart = df.repartition(n)
    val clustered =
      if (clusterBy.isEmpty) repart
      else repart.sortWithinPartitions(clusterBy.map(df(_)): _*)
    clustered.write.mode("overwrite").parquet(outDir)
    countParquet(spark, outDir)
  }

  /** Z-ORDER compaction — [[compact]]'s multi-dimensional sibling and
    * the WRITE path of the q62 layout math (the Delta
    * `OPTIMIZE ZORDER BY` operation): rewrite the table so that BOTH
    * `dimX` and `dimY` have tight per-file min/max ranges, instead of
    * only the single `clusterBy` dimension a linear sort can serve.
    *
    * Mechanics: one bounds pass scales each dimension to a 16-bit
    * cell, [[graft.functions.ZOrderKey]] interleaves the cells into a
    * Morton key, and the rows are range-partitioned + locally sorted
    * on that key — so every output file covers a contiguous z-range,
    * which is a bounded rectangle in (dimX, dimY) space. Readers that
    * prune on row-group/file statistics then skip most files for 2-d
    * predicates (LayoutSpec measures the contrast vs a linear
    * layout, which prunes nothing on the secondary dimension).
    *
    * Cost at 100 TB: bounds aggregate (one scan, one row) + ONE range
    * exchange over the Morton key + partition-local sort — identical
    * shuffle shape to a plain global sort, no extra passes. NULL
    * dims land in cell 0 (lowest), keeping them clustered, not
    * scattered. */
  def zorder(spark: SparkSession, inDir: String, outDir: String,
      targetFileBytes: Long, dimX: String, dimY: String): Int = {
    import org.apache.spark.sql.functions.{col, expr, max, min}
    val conf = spark.sparkContext.hadoopConfiguration
    def qualified(dir: String) = {
      val p = new Path(dir)
      p.getFileSystem(conf).makeQualified(p)
    }
    require(qualified(inDir) != qualified(outDir),
      s"zorder: outDir must differ from inDir ($inDir); write aside and swap")
    val n = targetFiles(dirBytes(spark, inDir), targetFileBytes)
    val df = spark.read.parquet(inDir)
    val b = df.agg(
      min(col(dimX).cast("long")).as("minx"), max(col(dimX).cast("long")).as("maxx"),
      min(col(dimY).cast("long")).as("miny"), max(col(dimY).cast("long")).as("maxy"))
      .head()
    def cell(c: String, lo: Long, hi: Long) = {
      val span = math.max(hi - lo, 1L)
      expr(s"((coalesce(CAST($c AS BIGINT), ${lo}L) - ${lo}L) * 65535) DIV ${span}L")
    }
    val keyed = df.withColumn("__z", graft.functions.ZOrderKey.zorder(
      cell(dimX, b.getLong(0), b.getLong(1)),
      cell(dimY, b.getLong(2), b.getLong(3))))
    keyed.repartitionByRange(n, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("overwrite").parquet(outDir)
    countParquet(spark, outDir)
  }

  /** BLOOM-FILTER indexed rewrite — the third data-skipping primitive
    * next to [[compact]]'s clustered min/max stats and [[zorder]]'s
    * 2-d rectangles: per-row-group parquet bloom filters on
    * `bloomCols`, serving POINT LOOKUPS (`key = x` / `key IN (...)`)
    * on columns the file order does NOT cluster. Min/max stats prune
    * nothing for an in-range key on an unsorted column; the bloom
    * answers "definitely not in this row group" from a few KB read
    * out of the footer region — at 100 TB this is how a needle query
    * on a secondary key touches a handful of row groups instead of
    * every one (the same design as Delta/Iceberg bloom columns; the
    * read side is stock parquet-mr row-group filtering, which Spark's
    * scan applies to pushed EqualTo/In predicates automatically).
    *
    * Dictionary encoding is DISABLED on the bloom columns: a
    * dict-encoded column already gives exact row-group membership
    * (the dictionary page lists every distinct value), so parquet-mr
    * suppresses blooms for fully-dict pages and production bloom
    * columns are exactly those with too many distinct values for the
    * dictionary — this forces the layout into that regime so the
    * bloom path (not the dict path) is what LayoutSpec proves.
    *
    * `expectedNdv` sizes the filter (~1.1 bytes/value at the default
    * 1% fpp) — size it per ROW GROUP, not per table. Content is
    * preserved row-for-row; one round-robin exchange, no sort. */
  def bloomIndex(spark: SparkSession, inDir: String, outDir: String,
      targetFileBytes: Long, bloomCols: Seq[String],
      expectedNdv: Long): Int = {
    val conf = spark.sparkContext.hadoopConfiguration
    def qualified(dir: String) = {
      val p = new Path(dir)
      p.getFileSystem(conf).makeQualified(p)
    }
    require(qualified(inDir) != qualified(outDir),
      s"bloomIndex: outDir must differ from inDir ($inDir); write aside and swap")
    require(bloomCols.nonEmpty, "bloomIndex: no bloom columns given")
    val n = targetFiles(dirBytes(spark, inDir), targetFileBytes)
    val w = spark.read.parquet(inDir).repartition(n).write.mode("overwrite")
    bloomCols.foldLeft(w) { (wr, c) =>
      wr.option(s"parquet.bloom.filter.enabled#$c", "true")
        .option(s"parquet.bloom.filter.expected.ndv#$c", expectedNdv.toString)
        .option(s"parquet.enable.dictionary#$c", "false")
    }.parquet(outDir)
    countParquet(spark, outDir)
  }

  private def countParquet(spark: SparkSession, dir: String): Int = {
    val out = new Path(dir)
    val fs = out.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(out).count(s => s.getPath.getName.endsWith(".parquet"))
  }
}
