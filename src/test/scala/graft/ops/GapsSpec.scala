package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** [[Gaps]] — the two-phase islands-and-gaps must equal the naive
  * global-lag formulation, including gaps that cross range-partition
  * boundaries (the stitch path) and datasets small enough to leave
  * range partitions empty. */
class GapsSpec extends SparkSpec {
  import spark.implicits._

  private def naive(keys: Seq[Long]): Seq[(Long, Long)] = {
    val w = Window.orderBy(col("k"))
    keys.toDF("k").distinct()
      .withColumn("prev", lag(col("k"), 1).over(w))
      .filter(col("prev").isNotNull && col("k") - col("prev") > 1)
      .select((col("prev") + 1).as("s"), (col("k") - 1).as("e"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
  }

  private def twoPhase(keys: Seq[Long]): Seq[(Long, Long)] =
    Gaps.gaps(keys.toDF("k"), "k")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq

  test("gaps equal the global-lag formulation on a crafted sequence") {
    val keys = Seq(1L, 2L, 3L, 7L, 8L, 20L, 21L, 22L, 23L, 40L, 100L)
    assert(twoPhase(keys) === naive(keys))
    assert(twoPhase(keys) === Seq((4L, 6L), (9L, 19L), (24L, 39L), (41L, 99L)))
  }

  test("a giant gap spanning multiple range partitions stitches once") {
    // 4 shuffle partitions (SparkSpec); keys cluster at the two ends so
    // the middle partitions are empty and the gap crosses them
    val keys = (1L to 50L) ++ (1000000L to 1000050L)
    assert(twoPhase(keys) === Seq((51L, 999999L)))
  }

  test("duplicates and unordered input don't change the result") {
    val keys = Seq(5L, 3L, 9L, 3L, 5L, 9L, 1L)
    assert(twoPhase(keys) === naive(keys.distinct))
  }

  test("a dense sequence has no gaps") {
    assert(twoPhase((10L to 200L)) === Seq.empty)
  }
}
