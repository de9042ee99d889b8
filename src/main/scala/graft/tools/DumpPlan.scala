package graft.tools
object DumpPlan {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local(8)
    val df = graft.queries.Registry.queries(args(0))(spark, args(1))
    println("=== OPTIMIZED ===")
    println(df.queryExecution.optimizedPlan.treeString.take(12000))
    spark.stop()
  }
}
