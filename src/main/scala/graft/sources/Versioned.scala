package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Versioned parquet tables with TIME TRAVEL — the lakehouse snapshot
  * primitive (Delta/Iceberg's core read contract) on plain parquet +
  * rename atomicity, complementing [[graft.model.Pipeline.mergeSwap]]
  * (which keeps only the live table) and
  * [[graft.ops.SnapshotDiff]] (which diffs two frames it is given).
  *
  * Layout: `tableDir/v{N}/` per committed version. The COMMIT POINT is
  * a single directory rename `_tmp_v{N}` → `v{N}`: readers resolve
  * versions by listing `v\d+` directories, so a half-written staging
  * dir is never visible and a crashed writer leaves only junk that the
  * next commit's staging sweep clears. Old versions stay readable
  * until [[vacuum]] — writers never mutate a committed dir, which is
  * what gives readers snapshot isolation without any lock.
  *
  * At 100 TB this is the same cost model as any overwrite-style load:
  * one data write + one metadata rename per commit; version resolution
  * is one directory listing (object stores: one LIST call — the same
  * contract Delta's `_delta_log` listing rides). Partition columns
  * pass through to the writer, so partition pruning works inside every
  * version. */
object Versioned {

  private val V = """v(\d+)""".r

  private def fs(spark: SparkSession, dir: String) =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Committed version numbers, ascending (empty for a fresh dir). */
  def versions(spark: SparkSession, tableDir: String): Seq[Long] = {
    val f = fs(spark, tableDir)
    val p = new Path(tableDir)
    if (!f.exists(p)) Seq.empty
    else f.listStatus(p).toSeq.collect {
      case s if s.isDirectory =>
        s.getPath.getName match {
          case V(n) => Some(n.toLong)
          case _ => None
        }
    }.flatten.sorted
  }

  /** Commit `df` as the next version; returns the new version number.
    * Crash-safe: data lands in a staging dir first, the rename IS the
    * commit. Stale staging dirs from crashed writers are swept. */
  def commit(spark: SparkSession, tableDir: String, df: DataFrame,
             partitionCols: Seq[String] = Nil): Long = {
    val f = fs(spark, tableDir)
    // sweep stale staging dirs (a crashed writer's leftovers)
    val root = new Path(tableDir)
    if (f.exists(root)) f.listStatus(root).foreach { s =>
      if (s.isDirectory && s.getPath.getName.startsWith("_tmp_v"))
        f.delete(s.getPath, true)
    }
    val next = versions(spark, tableDir).lastOption.getOrElse(0L) + 1
    val tmp = new Path(s"$tableDir/_tmp_v$next")
    val dst = new Path(s"$tableDir/v$next")
    val w = df.write.mode("overwrite")
    (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w)
      .parquet(tmp.toString)
    if (!f.rename(tmp, dst))
      sys.error(s"versioned commit: rename $tmp -> $dst failed " +
        "(concurrent writer won the version?)")
    next
  }

  /** Read the table as of `asOf` (defaults to the latest version). */
  def read(spark: SparkSession, tableDir: String,
           asOf: Option[Long] = None): DataFrame = {
    val vs = versions(spark, tableDir)
    require(vs.nonEmpty, s"versioned read: no committed versions in $tableDir")
    val v = asOf.getOrElse(vs.last)
    require(vs.contains(v),
      s"versioned read: version $v not in committed set ${vs.mkString(",")}")
    spark.read.parquet(s"$tableDir/v$v")
  }

  /** CHANGE DATA FEED between two committed versions — Delta's
    * `table_changes` contract from plain snapshots: keyed I/U/D ops
    * via [[graft.ops.SnapshotDiff.diff]] (one full-outer key join of
    * the two version reads, q38's oracle-proven diff core). At 100 TB
    * the cost model is q38's: both sides prune to key+compared
    * columns, one shuffle each on the key. */
  def changes(spark: SparkSession, tableDir: String,
              fromV: Long, toV: Long, keys: Seq[String]): DataFrame = {
    require(fromV < toV, s"versioned changes: fromV $fromV must precede toV $toV")
    graft.ops.SnapshotDiff.diff(
      read(spark, tableDir, Some(fromV)),
      read(spark, tableDir, Some(toV)), keys)
  }

  /** Drop all but the newest `keep` versions (time-travel horizon). */
  def vacuum(spark: SparkSession, tableDir: String, keep: Int): Seq[Long] = {
    require(keep >= 1, "vacuum: must keep at least the live version")
    val f = fs(spark, tableDir)
    val drop = versions(spark, tableDir).dropRight(keep)
    drop.foreach(v => f.delete(new Path(s"$tableDir/v$v"), true))
    drop
  }
}
