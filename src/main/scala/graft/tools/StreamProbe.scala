package graft.tools

/** Dev tool: run one streaming registry query end-to-end (warm + timed
  * pass, Bench methodology) and attribute its wall time to micro-batch
  * phases from StreamingQueryProgress — the streaming analog of
  * DumpPlan's shape counters. Usage:
  *   sbt 'runMain graft.tools.StreamProbe <queryName> [sfDir]'
  */
object StreamProbe {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = graft.GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    val fn = graft.queries.Registry.queries(name)
    fn(spark, sfDir).count() // warmup
    spark.catalog.clearCache()
    val t0 = System.nanoTime()
    fn(spark, sfDir).count()
    val wall = (System.nanoTime() - t0) / 1e9
    println(f"== $name: timed pass $wall%.3f s ==")
    graft.streaming.Streams.lastProgress.foreach { case (tag, batches) =>
      println(s"-- $tag: ${batches.size} progress events --")
      batches.foreach { j =>
        // keep only the fields that matter for attribution
        val keep = Seq("batchId", "numInputRows", "durationMs")
        val parsed = ujsonLite(j, keep)
        println(s"   $parsed")
      }
    }
    spark.stop()
  }

  /** Tiny field extractor (no JSON dep): prints `"k":<raw>` slices for
    * the requested top-level keys, including nested objects. */
  private def ujsonLite(j: String, keys: Seq[String]): String =
    keys.flatMap { k =>
      val i = j.indexOf("\"" + k + "\"")
      if (i < 0) None
      else {
        val colon = j.indexOf(':', i)
        var d = 0; var e = colon + 1; var done = false
        while (!done && e < j.length) {
          j(e) match {
            case '{' | '[' => d += 1
            case '}' | ']' => if (d == 0) done = true else d -= 1
            case ',' => if (d == 0) done = true
            case _ =>
          }
          if (!done) e += 1
        }
        Some(j.substring(i, e))
      }
    }.mkString(", ")
}
