package graft.tools

/** Dev tool: dump a registry query's executed plan + quick shape
  * counters. Usage:
  *   sbt 'runMain graft.tools.Explain <queryName> [sfDir] [formatted]'
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val spark = graft.GraftSession.local(8)
    val df = graft.queries.Registry.queries(name)(spark, sfDir)
    if (args.contains("formatted")) df.explain("formatted")
    val p = df.queryExecution.executedPlan.toString
    def n(pat: String) = pat.r.findAllIn(p).size
    println(s"== plan shape for $name ==")
    println(s"Exchange=${n("Exchange")} SMJ=${n("SortMergeJoin")} " +
      s"BHJ=${n("BroadcastHashJoin")} BNLJ=${n("BroadcastNestedLoopJoin")} " +
      s"Cartesian=${n("CartesianProduct")} Window=${n("Window")} " +
      s"scans=${n("Scan parquet")} WSCG=${n("WholeStageCodegen")}")
    spark.stop()
  }
}
