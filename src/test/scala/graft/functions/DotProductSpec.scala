package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Native DotProduct vs the interpreted higher-order formulation:
  * bit-identical values (same summation order), null semantics, and
  * SQL-name registration via both paths. */
class DotProductSpec extends SparkSpec {
  import spark.implicits._

  private def hof(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  test("matches aggregate(zip_with) bit-for-bit on random vectors") {
    GraftFunctions.register(spark)
    val rnd = new scala.util.Random(5)
    val rows = Seq.fill(200)((
      Seq.fill(64)(rnd.nextDouble() * 2 - 1),
      Seq.fill(64)(rnd.nextDouble() * 2 - 1)))
    val df = rows.toDF("a", "b")
      .select(GraftFunctions.dot(col("a"), col("b")).as("native"),
        hof(col("a"), col("b")).as("interp"))
    assert(df.filter(col("native") =!= col("interp")).count() === 0)
  }

  test("null array yields null; empty arrays yield 0.0") {
    GraftFunctions.register(spark)
    val df = Seq(
      (Some(Seq(1.0, 2.0)), None: Option[Seq[Double]]),
      (Some(Seq.empty[Double]), Some(Seq.empty[Double]))
    ).toDF("a", "b").select(GraftFunctions.dot(col("a"), col("b")).as("d"))
    val out = df.collect()
    assert(out(0).isNullAt(0))
    assert(out(1).getDouble(0) === 0.0)
  }

  test("float arrays are implicitly cast (embedding column works raw)") {
    GraftFunctions.register(spark)
    val df = Seq((Seq(1.0f, 2.0f), Seq(3.0, 4.0))).toDF("a", "b")
    assert(df.select(GraftFunctions.dot(col("a"), col("b"))).collect()(0).getDouble(0) === 11.0)
  }

  test("usable from SQL text after extensions injection") {
    GraftFunctions.register(spark)
    Seq((Seq(1.0, 2.0), Seq(3.0, 4.0))).toDF("a", "b").createOrReplaceTempView("vecs")
    assert(spark.sql("SELECT graft_dot(a, b) AS d FROM vecs").collect()(0).getDouble(0) === 11.0)
  }

  test("whole graft function family is callable from SQL text (incl. aggregates)") {
    GraftFunctions.register(spark)
    spark.createDataset(Seq((1L, 10L), (1L, 3L), (1L, 10L), (2L, 7L)))
      .toDF("g", "h").createOrReplaceTempView("fx")
    // aggregate builders: the analyzer wraps the raw AggregateFunction
    val mins = spark.sql("SELECT g, graft_topk_min(h, 2) AS m FROM fx GROUP BY g ORDER BY g")
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(mins === Map(1L -> Seq(3L, 10L), 2L -> Seq(7L)))
    val capped = spark.sql("SELECT g, graft_capped_docs(h, 1) AS c FROM fx GROUP BY g ORDER BY g")
      .collect().map(r => r.getLong(0) -> r.getStruct(1).getLong(0)).toMap
    assert(capped === Map(1L -> 3L, 2L -> 1L)) // exact counts survive the cap
    val sig = spark.sql("SELECT graft_minhash_sig(array(h, h + 1), 2) AS s FROM fx")
      .collect()(0).getSeq[Long](0)
    assert(sig === Seq(3L, 4L)) // lane-wise min over the array rows
    // scalar with literal args
    val rmh = spark.sql("SELECT size(graft_rolling_minhash('abcdefgh', 4, 2)) AS n")
      .collect()(0).getInt(0)
    assert(rmh === 2)
    // a non-literal k must be a clear error, not a buffer of garbage
    val e = intercept[Exception] {
      spark.sql("SELECT g, graft_topk_min(h, CAST(h AS INT)) FROM fx GROUP BY g").collect()
    }
    assert(e.getMessage.contains("integer literal"))
  }

  test("expression participates in codegen (no fallback in plan)") {
    GraftFunctions.register(spark)
    // local Seqs constant-fold to LocalTableScan; range() forces a real
    // codegen stage around the expression
    val df = spark.range(100)
      .select(array(col("id").cast("double"), lit(2.0)).as("a"),
        array(lit(3.0), col("id").cast("double")).as("b"))
      .select(GraftFunctions.dot(col("a"), col("b")).as("d"))
    // "*(n)" prefixes = operators inside a WholeStageCodegen stage
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project [graft_dot"), plan)
    assert(df.agg(sum("d")).collect()(0).getDouble(0) === (0 until 100).map(i => 3.0 * i + 2.0 * i).sum)
  }
}
