package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Morton interleave: bit-exact against a slow per-bit reference,
  * locality property, codegen + SQL registration paths. */
class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  /** Per-bit reference implementation (the definition, not the
    * parallel-prefix trick). */
  private def slowInterleave(x: Long, y: Long): Long = {
    var z = 0L
    var i = 0
    while (i < 16) {
      z |= ((x >> i) & 1L) << (2 * i)
      z |= ((y >> i) & 1L) << (2 * i + 1)
      i += 1
    }
    z
  }

  test("known corner values") {
    assert(ZOrderKey.interleave16(0xFFFFL, 0L) === 0x55555555L)
    assert(ZOrderKey.interleave16(0L, 0xFFFFL) === 0xAAAAAAAAL)
    assert(ZOrderKey.interleave16(0xFFFFL, 0xFFFFL) === 0xFFFFFFFFL)
    assert(ZOrderKey.interleave16(0L, 0L) === 0L)
    // inputs masked to 16 bits
    assert(ZOrderKey.interleave16(0x1FFFFL, 0L) === 0x55555555L)
  }

  test("matches the per-bit definition on a deterministic sweep") {
    var s = 12345L
    (1 to 2000).foreach { _ =>
      s = s * 6364136223846793005L + 1442695040888963407L // LCG
      val x = (s >>> 16) & 0xFFFFL
      val y = (s >>> 32) & 0xFFFFL
      assert(ZOrderKey.interleave16(x, y) === slowInterleave(x, y), s"x=$x y=$y")
    }
  }

  test("locality: every coarse z-cell is a bounded rectangle") {
    // 64×64 grid → 12-bit keys; z >> 8 keeps the top 4 bits = 16
    // cells. Assert each cell's bounding-rectangle AREA equals its
    // population — cells are dense rectangles with no leakage, the
    // property min/max file statistics rely on.
    val pts = for (x <- 0L until 64L; y <- 0L until 64L) yield (x, y)
    val cells = pts.groupBy { case (x, y) => ZOrderKey.interleave16(x, y) >> 8 }
    assert(cells.size === 16)
    cells.foreach { case (c, ps) =>
      val (xs, ys) = (ps.map(_._1), ps.map(_._2))
      val area = (xs.max - xs.min + 1) * (ys.max - ys.min + 1)
      assert(area === ps.size, s"cell $c leaks: span area $area != ${ps.size} points")
    }
  }

  test("Column API runs inside codegen and matches eval") {
    val df = (0L until 1000L).map(i => (i % 97, i % 89)).toDF("x", "y")
    val got = df.select(ZOrderKey.zorder(col("x"), col("y")).as("z"))
      .as[Long].collect()
    val want = (0L until 1000L).map(i => slowInterleave(i % 97, i % 89))
    assert(got.toSeq === want)
  }

  test("SQL registration: graft_zorder callable from SQL text") {
    GraftFunctions.register(spark)
    val z = spark.sql("SELECT graft_zorder(3L, 5L) AS z").as[Long].head()
    assert(z === slowInterleave(3, 5))
  }

  test("non-bigint input is rejected with a clear type error") {
    val e = intercept[Exception] {
      Seq((1, 2)).toDF("a", "b")
        .select(ZOrderKey.zorder(col("a"), col("b"))).collect()
    }
    assert(e.getMessage.toLowerCase.contains("graft_zorder") ||
      e.getMessage.toLowerCase.contains("bigint"))
  }
}
