package graft.tools

/** Dev tool: run one streaming registry query end-to-end (warm + timed
  * pass, Bench methodology) and attribute its wall time to micro-batch
  * phases from StreamingQueryProgress — the streaming analog of
  * DumpPlan's shape counters. Usage:
  *   sbt 'runMain graft.tools.StreamProbe <queryName> [sfDir]'
  */
object StreamProbe {
  def main(args: Array[String]): Unit = {
    // comma-separated names + optional rep count keep an A/B in ONE
    // JVM (40 s of sbt+session startup per invocation otherwise)
    val names = args(0).split(',').toSeq
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = sys.env.getOrElse("SPARK_GRAFT_PROBE_REPS", "1").toInt
    val spark = graft.GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    // Same-JVM interleaved A/B (host speed here drifts ±40% across
    // minutes, making cross-JVM comparison unreadable):
    // SPARK_GRAFT_PROBE_AB="prop=valA|valB" alternates the system
    // property between reps and reports each arm's min separately.
    val ab = sys.env.get("SPARK_GRAFT_PROBE_AB").map { s =>
      val Array(prop, vals) = s.split("=", 2)
      val Array(a, b) = vals.split("\\|", -1)
      (prop, a, b)
    }
    names.foreach { name =>
      val fn = graft.queries.Registry.queries(name)
      fn(spark, sfDir).count() // warmup
      val walls = (1 to (reps * (if (ab.isDefined) 2 else 1))).map { i =>
        ab.foreach { case (prop, a, b) =>
          val v = if (i % 2 == 1) a else b
          if (v.isEmpty) sys.props.remove(prop) else sys.props(prop) = v
        }
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }
      ab match {
        case Some((prop, a, b)) =>
          val (armA, armB) = walls.zipWithIndex.partition(_._2 % 2 == 0)
          def fmt(xs: Seq[(Double, Int)]) =
            f"min ${xs.map(_._1).min}%.3f of [" +
              xs.map(x => f"${x._1}%.3f").mkString(" ") + "]"
          println(s"== $name A/B $prop: '$a' ${fmt(armA)} | '$b' ${fmt(armB)} ==")
        case None =>
          val detail = walls.map(w => f"$w%.3f").mkString(" ")
          println(f"== $name: timed min ${walls.min}%.3f s of [$detail] ==")
      }
      graft.streaming.Streams.lastProgress.foreach { case (tag, batches) =>
        println(s"-- $tag: ${batches.size} progress events --")
        batches.foreach { j =>
          // keep only the fields that matter for attribution
          val keep = Seq("batchId", "numInputRows", "durationMs")
          val parsed = ujsonLite(j, keep)
          println(s"   $parsed")
        }
      }
    }
    // SPARK_GRAFT_PROBE_PLAN=1: dump the recorded last-micro-batch
    // executed plans (the streaming analog of DumpPlan — where the
    // in-stream expression shapes are visible)
    if (sys.env.contains("SPARK_GRAFT_PROBE_PLAN"))
      graft.streaming.Streams.lastPlans.foreach { case (tag, plan) =>
        println(s"=== EXECUTED (last micro-batch) $tag ===")
        println(plan.take(60000))
      }
    // SPARK_GRAFT_PROBE_RULES=1: dump Catalyst rule-executor timings
    // accumulated over the probe (attributes per-batch queryPlanning
    // to individual analyzer/optimizer rules)
    if (sys.env.contains("SPARK_GRAFT_PROBE_RULES"))
      println(org.apache.spark.sql.catalyst.rules.RuleExecutor.dumpTimeSpent())
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
