package graft.tools

/** Dev tool: steady-state time one registry query (Bench methodology —
  * warmup pass, then N cold-cache timed passes, report min). Usage:
  *   sbt 'runMain graft.tools.Time <queryName> [sfDir] [passes]'
  */
object Time {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val passes = if (args.length > 2) args(2).toInt else 2
    val spark = graft.GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt)
    val fn = graft.queries.Registry.queries(name)
    fn(spark, sfDir).count() // warmup
    val times = (1 to passes).map { _ =>
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      fn(spark, sfDir).count()
      (System.nanoTime() - t0) / 1e9
    }
    println(f"== $name: min ${times.min}%.3f s over $passes passes ${times.map(t => f"$t%.2f").mkString("[", ", ", "]")}")
    spark.stop()
  }
}
