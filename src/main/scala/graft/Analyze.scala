package graft

import org.apache.spark.sql.types.{ArrayType, BinaryType, MapType, StructType}

import graft.plans.StatsStore

/** ANALYZE-TABLE CLI — computes and persists per-column (rows, NDV)
  * statistics for every table of a testdata-shaped directory into the
  * [[graft.plans.StatsStore]] sidecar (`graft-stats/` by default, one
  * file per table data version). The optimizer's cost-gated rules
  * (eager aggregation's `auto` mode) read these instead of running
  * measurement jobs inside logical optimization — the same contract as
  * `ANALYZE TABLE … COMPUTE STATISTICS FOR COLUMNS` feeding Spark's
  * own CBO, here keyed by input-file fingerprint so an overwritten
  * table can never serve stale numbers.
  *
  * One pass per table: a single map-only aggregate carrying the exact
  * row count plus one HLL per column (the q69 table-profile shape,
  * minus the oracle's exact-NDV twin). Composite key sets the registry
  * later probes are added by the probe's own write-through; this CLI
  * seeds the per-column singles that cover every base-table join key.
  *
  * Usage: `sbt "runMain graft.Analyze <dir> [<dir> ...]"`.
  */
object Analyze {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq else Seq("/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt
    val spark = GraftSession.local(cpus)
    val tables = Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events", "documents", "embeddings")
    for (d <- dirs; t <- tables) {
      val path = s"$d/$t.parquet"
      if (new java.io.File(path).exists()) {
        val df = spark.read.parquet(path)
        // HLL needs a hashable scalar input: skip nested/binary columns
        // (the embeddings vector and events props map have no join-key
        // use)
        val cols = df.schema.fields.filter(_.dataType match {
          case _: ArrayType | _: MapType | _: StructType | BinaryType => false
          case _ => true
        }).map(f => Seq(f.name)).toSeq
        StatsStore.analyze(df, cols, note = s"graft.Analyze $path")
        println(s"analyzed $path: ${cols.size} columns")
      }
    }
    spark.stop()
  }
}
