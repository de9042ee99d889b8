package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Frequent-items sketch: exact below saturation, the Misra-Gries
  * bound invariant under compression and merge, partial-agg
  * invariance, SQL-text registration. */
class FreqSketchSpec extends SparkSpec {
  import spark.implicits._

  test("below map saturation counts are EXACT and partial-agg invariant") {
    // 50 distinct items < maxMapSize 128 => no purge, exact counts
    val df = (1 to 1000).map(i => (i % 50).toLong).toDF("v")
    for (parts <- Seq(1, 7)) {
      val b = df.repartition(parts)
        .agg(FreqSketchAgg.freqSketch(col("v"), 128).as("sk"))
        .select(FreqSketchAgg.freqBounds(col("sk"), lit(7L)).as("b"))
        .select("b.est", "b.lb", "b.ub")
        .as[(Long, Long, Long)].head()
      assert(b === ((20L, 20L, 20L)), s"parts=$parts")
    }
  }

  test("under compression every true count stays within [lb, ub]") {
    // 2000 distinct uniform + 5 planted heavy hitters, map of 64
    val heavy = Seq.fill(500)(999999L)
    val df = ((1 to 10000).map(i => (i % 2000).toLong) ++ heavy ++
      Seq.fill(300)(888888L) ++ Seq.fill(200)(777777L)).toDF("v")
    val skBytes = df.agg(FreqSketchAgg.freqSketch(col("v"), 64).as("sk"))
      .collect().head.getAs[Array[Byte]](0)
    val sk = org.apache.datasketches.frequencies.LongsSketch.getInstance(
      org.apache.datasketches.memory.Memory.wrap(skBytes))
    val n = df.count()
    assert(sk.getMaximumError <= 4 * n / 64, "purge error above a-priori bound")
    for ((item, true_) <- Seq(999999L -> 500L, 888888L -> 300L, 777777L -> 200L)) {
      assert(sk.getLowerBound(item) <= true_ && true_ <= sk.getUpperBound(item),
        s"item $item true=$true_ outside [${sk.getLowerBound(item)}, ${sk.getUpperBound(item)}]")
    }
    // NO_FALSE_NEGATIVES: the planted heavies are all reported
    val reported = sk.getFrequentItems(
      org.apache.datasketches.frequencies.ErrorType.NO_FALSE_NEGATIVES)
      .map(_.getItem).toSet
    assert(Set(999999L, 888888L, 777777L).subsetOf(reported))
  }

  test("merge of STORED sketches preserves the bound invariant") {
    val df = (0 until 20000).map(i => ((i % 10), (i % 97).toLong)).toDF("g", "v")
    val parts = df.groupBy("g").agg(FreqSketchAgg.freqSketch(col("v"), 64).as("sk"))
    val b = parts.agg(FreqSketchAgg.freqMerge(col("sk"), 64).as("m"))
      .select(FreqSketchAgg.freqBounds(col("m"), lit(5L)).as("b"))
      .select("b.lb", "b.ub").as[(Long, Long)].head()
    val exact = 20000L / 97 + (if (5 < 20000 % 97) 1 else 0)
    assert(b._1 <= exact && exact <= b._2,
      s"merged bounds [${b._1}, ${b._2}] exclude exact $exact")
  }

  test("SQL-text registration: graft_freq_sketch/merge/bounds") {
    GraftFunctions.register(spark)
    (1 to 300).map(i => (i % 3, (i % 7).toLong)).toDF("g", "v")
      .createOrReplaceTempView("freq_in")
    val out = spark.sql("""
      WITH parts AS (
        SELECT g, graft_freq_sketch(v, 32) AS sk FROM freq_in GROUP BY g)
      SELECT graft_freq_bounds(graft_freq_merge(sk, 32), 2L).est AS est
      FROM parts""").as[Long].head()
    assert(out === (1 to 300).count(_ % 7 == 2))
  }
}
