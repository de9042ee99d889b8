package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** KLL quantile-sketch family: exact below compaction, partial-agg
  * invariant, merge of stored sketches honors the rank guarantee, and
  * the SQL-text registration path works. */
class KllSketchSpec extends SparkSpec {
  import spark.implicits._

  test("small input (n <= k) is EXACT and partial-agg invariant") {
    // 100 values < k=200 ⇒ the sketch retains every value
    val df = (1 to 100).map(_.toDouble).toDF("v")
    for (parts <- Seq(1, 7)) {
      val qs = df.repartition(parts)
        .agg(KllSketchAgg.kllSketch(col("v"), 200).as("sk"))
        .select(
          KllSketchAgg.kllQuantile(col("sk"), lit(0.5)).as("q50"),
          KllSketchAgg.kllQuantile(col("sk"), lit(1.0)).as("q100"))
        .as[(Double, Double)].head()
      assert(qs._1 === 50.0, s"parts=$parts")
      assert(qs._2 === 100.0, s"parts=$parts")
    }
  }

  test("nulls are skipped; empty sketch probes to NULL") {
    val someVals = Seq[Option[Double]](Some(1.0), None, Some(3.0)).toDF("v")
    val q = someVals.agg(KllSketchAgg.kllSketch(col("v"), 200).as("sk"))
      .select(KllSketchAgg.kllQuantile(col("sk"), lit(1.0)).as("q"))
      .as[Double].head()
    assert(q === 3.0)
    val empty = Seq[Option[Double]](None, None).toDF("v")
      .agg(KllSketchAgg.kllSketch(col("v"), 200).as("sk"))
      .select(KllSketchAgg.kllQuantile(col("sk"), lit(0.5)).as("q"))
      .collect()
    assert(empty.head.isNullAt(0))
  }

  test("merged STORED sketches honor the rank guarantee on 50k values") {
    // 10 stored sketches of 5k uniform values each; merged p50/p90
    // must land within 2*eps of the true rank (eps ~ 1.65% at k=200)
    val df = (0 until 50000).map(i => (i % 10, i.toDouble)).toDF("g", "v")
    val parts = df.groupBy("g").agg(KllSketchAgg.kllSketch(col("v"), 200).as("sk"))
    val qs = parts.agg(KllSketchAgg.kllMerge(col("sk"), 200).as("m"))
      .select(
        KllSketchAgg.kllQuantile(col("m"), lit(0.5)).as("q50"),
        KllSketchAgg.kllQuantile(col("m"), lit(0.9)).as("q90"))
      .as[(Double, Double)].head()
    assert(math.abs(qs._1 / 50000.0 - 0.5) <= 0.033, s"p50=${qs._1}")
    assert(math.abs(qs._2 / 50000.0 - 0.9) <= 0.033, s"p90=${qs._2}")
  }

  test("SQL-text registration: graft_kll_sketch/merge/quantile") {
    GraftFunctions.register(spark)
    (1 to 100).map(i => (i % 5, i.toDouble)).toDF("g", "v")
      .createOrReplaceTempView("kll_in")
    val out = spark.sql("""
      WITH parts AS (
        SELECT g, graft_kll_sketch(v, 200) AS sk FROM kll_in GROUP BY g)
      SELECT graft_kll_quantile(graft_kll_merge(sk, 200), 1.0d) AS mx
      FROM parts""").as[Double].head()
    assert(out === 100.0)
  }

  test("rank argument outside [0,1] fails loudly") {
    val df = (1 to 10).map(_.toDouble).toDF("v")
      .agg(KllSketchAgg.kllSketch(col("v"), 200).as("sk"))
    val e = intercept[Exception] {
      df.select(KllSketchAgg.kllQuantile(col("sk"), lit(1.5))).collect()
    }
    assert(e.getMessage != null)
  }
}
