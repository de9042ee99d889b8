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
    val n = df.count()
    assert(FreqOps.maxError(skBytes) <= 4 * n / 64, "purge error above a-priori bound")
    for ((item, true_) <- Seq(999999L -> 500L, 888888L -> 300L, 777777L -> 200L)) {
      val b = FreqOps.bounds(skBytes, item)
      assert(b.getLong(1) <= true_ && true_ <= b.getLong(2),
        s"item $item true=$true_ outside [${b.getLong(1)}, ${b.getLong(2)}]")
    }
    // NO_FALSE_NEGATIVES: the planted heavies are all reported
    val reported = FreqOps.frequentItems(skBytes).toSet
    assert(Set(999999L, 888888L, 777777L).subsetOf(reported))
  }

  test("empty-purged map keeps its error offset across serialization (st14 regression)") {
    // 147 events over 140 distinct keys in a 64-slot map: purges can
    // empty the map entirely, and LongsSketch.toByteArray writes the
    // short "empty" form that DROPS the accumulated offset — a
    // round-tripped sketch then claims ub=0 for keys it absorbed.
    // The graft 8-byte header must preserve it: ub >= true for every
    // key, even through repartitioned partial-agg round trips.
    val df = (0 until 147).map(i => (i % 140).toLong).toDF("v")
    for (parts <- Seq(1, 7)) {
      val skBytes = df.repartition(parts)
        .agg(FreqSketchAgg.freqSketch(col("v"), 64).as("sk"))
        .collect().head.getAs[Array[Byte]](0)
      for (item <- Seq(0L, 7L, 139L)) {
        val true_ = if (item < 7) 2L else 1L
        val b = FreqOps.bounds(skBytes, item)
        assert(b.getLong(1) <= true_ && true_ <= b.getLong(2),
          s"parts=$parts item $item true=$true_ outside [${b.getLong(1)}, ${b.getLong(2)}]")
      }
      // and the offset survives a further stored-sketch merge
      val merged = df.repartition(parts)
        .agg(FreqSketchAgg.freqSketch(col("v"), 64).as("sk"))
        .agg(FreqSketchAgg.freqMerge(col("sk"), 64).as("m"))
        .collect().head.getAs[Array[Byte]](0)
      assert(FreqOps.maxError(merged) > 0,
        s"parts=$parts merged sketch lost its purge offset")
    }
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
