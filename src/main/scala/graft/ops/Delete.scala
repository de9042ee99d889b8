package graft.ops

import org.apache.hadoop.fs.{FileUtil, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, input_file_name}

/** Targeted row deletion with FILE-LEVEL SKIPPING — the
  * right-to-be-forgotten / retention-expiry primitive (Delta/Iceberg
  * `DELETE FROM t WHERE key IN (...)`): rewrite ONLY the data files
  * that actually contain a doomed key and carry every other file
  * forward untouched. A naive delete is a full-table rewrite; at
  * 100 TB with a bounded key list the touched set is a handful of
  * files when the table is clustered (or bloom-indexed) on the key,
  * and O(touched) is the whole cost.
  *
  * Mechanics:
  *  1. Touched-file discovery: one key-column scan of the table
  *     tagged with `input_file_name()`, LEFT SEMI joined to the key
  *     set — exact (not "maybe"), and the scan itself prunes to the
  *     key column plus whatever data-skipping the layout offers
  *     (min/max row-group stats under [[Layout.compact]] clustering,
  *     parquet blooms under [[Layout.bloomIndex]], both applied by
  *     the stock scan to the pushed join filter). The driver sees
  *     one file NAME per touched file — O(files), the same metadata
  *     scale every table format's planner holds.
  *  2. Untouched files are carried forward byte-identical. Here that
  *     is an FS copy because a bare directory stands in for the
  *     table; a real table format re-points its manifest at the same
  *     files — zero data movement. Either way, NOT a rewrite.
  *  3. Touched files alone are re-read, LEFT ANTI joined against the
  *     keys, and appended to the output (fresh part-file names never
  *     collide with the carried files).
  *
  * The key set is a DataFrame, not a driver-side list: a large
  * deletion manifest (a GDPR batch, an expired-cohort scan) stays
  * distributed end-to-end; Spark picks broadcast vs shuffle for both
  * joins from its size.
  */
object Delete {

  /** What a delete touched: `filesRewritten`/`filesTotal` is the
    * skipping ratio; the row counts are the audit line. */
  final case class DeleteStats(filesTotal: Int, filesRewritten: Int,
      rowsBefore: Long, rowsAfter: Long) {
    def rowsDeleted: Long = rowsBefore - rowsAfter
    def filesSkipped: Int = filesTotal - filesRewritten
  }

  /** Delete all rows of the parquet table at `inDir` whose `keyCol`
    * appears in `keys`, writing the surviving table to `outDir`
    * (write-aside-and-swap, the [[Layout]] discipline). `keys` must
    * expose a column named `keyCol`; extra columns are dropped,
    * duplicates are fine. Returns the file/row accounting. */
  def targetedDelete(spark: SparkSession, inDir: String, outDir: String,
      keyCol: String, keys: DataFrame): DeleteStats = {
    val conf = spark.sparkContext.hadoopConfiguration
    def qualified(dir: String) = {
      val p = new Path(dir)
      p.getFileSystem(conf).makeQualified(p)
    }
    require(qualified(inDir) != qualified(outDir),
      s"targetedDelete: outDir must differ from inDir ($inDir); write aside and swap")
    val k = keys.select(col(keyCol)).distinct()
    val table = spark.read.parquet(inDir)

    // 1. exact touched-file set from a pruned key-column scan. File
    // NAMES are the identity: the table is one flat directory, and
    // input_file_name()'s URI spelling (file:///…) need not match
    // Hadoop's qualified form (file:/…).
    val touchedNames = table
      .select(col(keyCol), input_file_name().as("__file"))
      .join(k, Seq(keyCol), "left_semi")
      .select(col("__file")).distinct()
      .collect()
      .map(r => { val u = r.getString(0); u.substring(u.lastIndexOf('/') + 1) })
      .toSet

    val inPath = new Path(inDir)
    val fs = inPath.getFileSystem(conf)
    val all = fs.listStatus(inPath)
      .filter(_.getPath.getName.endsWith(".parquet"))
    val (hit, miss) = all.partition(s => touchedNames.contains(s.getPath.getName))
    val outPath = new Path(outDir)
    fs.mkdirs(outPath)

    // 2. carry untouched files forward byte-identical
    miss.foreach { s =>
      FileUtil.copy(fs, s.getPath, fs,
        new Path(outPath, s.getPath.getName), false, conf)
    }

    // 3. rewrite only the touched files
    val rowsBefore = table.count()
    if (hit.nonEmpty) {
      spark.read.parquet(hit.map(_.getPath.toString).toIndexedSeq: _*)
        .join(k, Seq(keyCol), "left_anti")
        .write.mode("append").parquet(outDir)
    }
    val rowsAfter = spark.read.parquet(outDir).count()
    DeleteStats(all.length, hit.length, rowsBefore, rowsAfter)
  }
}
