package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** VecSumAgg is a DeclarativeAggregate: init/update/merge are catalyst
  * expression trees, so the properties that matter are the algebraic
  * ones — partial-aggregation invariance (map-side combine must not
  * change the value) and null behavior (null rows skipped, null
  * elements add zero). */
class VecSumAggSpec extends SparkSpec {

  private val dim = 3
  private def dec(s: String) = new java.math.BigDecimal(s)

  private def df(parts: Int) = {
    val rows = Seq(
      Row(1, Seq(dec("1.5"), dec("2.25"), dec("-0.75"))),
      Row(1, Seq(dec("0.5"), null, dec("10.0"))),
      Row(2, Seq(dec("100.000001"), dec("0"), dec("0"))),
      Row(1, null),
      Row(2, Seq(dec("-100.000001"), dec("7"), dec("0.1"))))
    val schema = StructType(Seq(
      StructField("g", IntegerType),
      StructField("v", ArrayType(DecimalType(28, 6)))))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, parts), schema)
  }

  private def sums(parts: Int): Map[Int, Seq[java.math.BigDecimal]] =
    df(parts).groupBy("g").agg(VecSumAgg.vecSum(col("v"), dim).as("s"))
      .collect()
      .map(r => r.getInt(0) -> r.getSeq[java.math.BigDecimal](1)).toMap

  test("element-wise decimal sum with null rows skipped, null lanes zeroed") {
    val m = sums(2)
    assert(m(1).map(_.stripTrailingZeros) ===
      Seq(dec("2.0"), dec("2.25"), dec("9.25")).map(_.stripTrailingZeros))
    assert(m(2).map(_.stripTrailingZeros) ===
      Seq(dec("0"), dec("7"), dec("0.1")).map(_.stripTrailingZeros))
  }

  test("partial-aggregation invariance: 1 vs 5 partitions identical") {
    assert(sums(1) === sums(5))
  }
}
