package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** RollingMinHash must be value-identical to the expression pipeline
  * it collapses: explode windows → md5 → first-15-hex long → k-min
  * distinct. Including multi-byte code points (Spark substring counts
  * code points; the expression walks UTF-8 lead bytes). */
class RollingMinHashSpec extends SparkSpec {
  import spark.implicits._

  private def refForm(dfc: org.apache.spark.sql.DataFrame) = dfc
    .filter(length(col("t")) >= 8)
    .select(col("id"),
      explode(expr("transform(sequence(1, length(t) - 7), i -> substring(t, i, 8))")).as("w"))
    .select(col("id"), conv(substring(md5(col("w")), 1, 15), 16, 10).cast("long").as("h"))
    .groupBy("id")
    .agg(slice(array_sort(collect_set(col("h"))), 1, 4).as("mins"))

  test("matches the explode+md5+k-min pipeline, ASCII and multi-byte") {
    val rows = Seq(
      1L -> "the quick brown fox jumps over the lazy dog",
      2L -> "aaaaaaaaaaaaaaaa", // heavy window dedup
      3L -> "exactly8",          // single window
      4L -> "short",             // below width → filtered upstream
      5L -> "víðförull ætti að hafa farið «heim» á ís 北京欢迎你 🙂🙂 end",
      6L -> "ascii then ünïcode mixes byte widths ok")
    val df = rows.toDF("id", "t")
    val ours = df.filter(length(col("t")) >= 8)
      .select(col("id"), RollingMinHash.rollingMinHash(col("t"), 8, 4).as("mins"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val ref = refForm(df)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(ours === ref)
    assert(!ours.contains(4L))
    assert(ours(3L).size === 1)
  }

  test("fuzz: 300 random unicode strings match the reference pipeline") {
    val rnd = new scala.util.Random(1234)
    val alphabets = Array(
      ('a' to 'z') ++ (' ' to ' '),                    // ascii + space
      ('a' to 'z') ++ ('à' to 'ÿ') ++ Seq(' '),        // latin-1 2-byte
      ('a' to 'z') ++ ('一' to '十') ++ Seq(' ')) // 3-byte CJK
    def randStr(): String = {
      val ab = alphabets(rnd.nextInt(alphabets.length))
      val n = rnd.nextInt(60)
      (0 until n).map(_ => ab(rnd.nextInt(ab.length))).mkString
    }
    val rows = (1L to 300L).map(i => i -> randStr())
    val df = rows.toDF("id", "t")
    val ours = df.filter(length(col("t")) >= 8)
      .select(col("id"), RollingMinHash.rollingMinHash(col("t"), 8, 4).as("mins"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val ref = refForm(df)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(ours === ref)
  }

  test("stays inside whole-stage codegen") {
    // a local Seq folds to LocalTableScan; range keeps the projection
    // in the executed plan so codegen compatibility is actually tested
    val df = spark.range(8).select(RollingMinHash.rollingMinHash(
      concat(lit("the quick brown fox "), col("id").cast("string")), 8, 4).as("m"))
    // the '*(n)' prefix is plan-toString's WholeStageCodegen marker
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project"), plan)
    assert(df.collect().length === 8) // and the generated code compiles/runs
  }
}
