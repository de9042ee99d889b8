package graft.tools

/** Round-15 gate (r14 verdict #4): execute [[graft.queries.TextOps]]
  * d12's duplicated-gram semi join on its NON-broadcast path.
  *
  * At sf1 the duplicated-gram set is ~32k keys, so AQE always
  * broadcasts it and the whole point of the r14 BloomSemi change —
  * the wide shuffle carrying ~duplicated mass instead of every gram
  * position once the dup set outgrows a broadcast hash table (the
  * 100 TB regime) — had no gate proving it executes. This main
  * disables broadcast joins entirely (both the static and the AQE
  * threshold), runs d12 to completion, writes the result parquet
  * (so tools/check_json.py can hash it against the unchanged DuckDB
  * oracle), and FAILS unless the executed plan shows
  *
  *  - a shuffle-based LeftSemi (SortMergeJoin or ShuffledHashJoin)
  *    — the exact false-positive-removing join — and
  *  - zero BroadcastHashJoin LeftSemi, and
  *  - the bloom bit-test still pushed below it (the prefilter is
  *    what keeps the shuffle ~duplicated-sized).
  *
  * Usage: runMain graft.tools.D12NoBroadcast <sfDir> <outDir>
  * The committed artifacts are CORRECTNESS_d12_nobc_sf1_r15.json +
  * the plan dump this prints (PLANS_HISTORY excerpt). */
object D12NoBroadcast {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    val spark = graft.GraftSession.builder(28, "local[28]")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = graft.queries.Registry.queries("d12_substring_dedup")(spark, sfDir)
    df.write.mode("overwrite")
      .parquet(s"$outDir/d12_substring_dedup")
    // oracle_sql.json beside it, so check_json runs the standard
    // compare (same escape discipline as Verify: ALL control chars)
    def q(str: String): String = "\"" + str.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$outDir/oracle_sql.json"),
      s"""{"d12_substring_dedup": ${q(
        graft.SparkEntry.oracleSql("d12_substring_dedup"))}}""".getBytes("UTF-8"))
    // post-execution adaptive plan: broadcast-vs-shuffle is decided at
    // runtime under AQE, so only the FINAL plan adjudicates
    val t = df.queryExecution.executedPlan.treeString
    val cut = t.indexOf("== Initial Plan ==")
    val finalPlan = if (cut >= 0) t.substring(0, cut) else t
    println("=== FINAL (post-execution, broadcast disabled) ===")
    println(finalPlan.take(60000))
    val semiShuffle = finalPlan.linesIterator.exists(l =>
      (l.contains("SortMergeJoin") || l.contains("ShuffledHashJoin")) &&
        l.contains("LeftSemi"))
    val semiBroadcast = finalPlan.linesIterator.exists(l =>
      l.contains("BroadcastHashJoin") && l.contains("LeftSemi"))
    val bloomPushed = finalPlan.contains("graft_bloom_bits") ||
      finalPlan.contains("BloomTest") || finalPlan.contains("bloom")
    require(semiShuffle,
      "d12 non-broadcast gate: no shuffle-based LeftSemi in the final plan")
    require(!semiBroadcast,
      "d12 non-broadcast gate: a BroadcastHashJoin LeftSemi survived " +
        "with broadcast disabled - the conf did not reach the join")
    require(bloomPushed,
      "d12 non-broadcast gate: bloom prefilter not visible in the plan")
    println(s"[d12-nobc] PASS: shuffle LeftSemi executed, bloom prefilter " +
      s"present, no broadcast semi; rows=${spark.read.parquet(
        s"$outDir/d12_substring_dedup").count()}")
    spark.stop()
  }
}
