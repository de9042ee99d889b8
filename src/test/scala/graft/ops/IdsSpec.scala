package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** W2 surrogate-id strategies: parity, contiguity, stability. */
class IdsSpec extends SparkSpec {
  import spark.implicits._

  private val df = Seq("cherry", "apple", "banana", "date").toDF("name")

  test("sequential assigns 1..N in sort order (reference parity)") {
    val out = Ids.sequential(df, Seq(col("name")), "id")
      .orderBy("id").as[(String, Int)].collect()
    assert(out.toSeq === Seq(("apple", 1), ("banana", 2), ("cherry", 3), ("date", 4)))
  }

  test("dense assigns contiguous 1..N in sort order without a global window") {
    val big = (1 to 1000).map(i => f"k$i%04d").toDF("name").repartition(8)
    val out = Ids.dense(big, Seq(col("name")), "id")
    val rows = out.orderBy("id").as[(String, Long)].collect()
    assert(rows.map(_._2).toSeq === (1L to 1000L))
    assert(rows.map(_._1).toSeq === rows.map(_._1).sorted.toSeq) // id order == sort order
  }

  test("property: dense == sequential on random unique keys, any input partitioning") {
    // the substitution the star-gate builders rely on: Ids.dense must
    // be OUTPUT-IDENTICAL to the reference-parity global window for
    // any unique key set, regardless of how the input arrives
    for (seed <- Seq(1, 42, 99)) {
      val rnd = new scala.util.Random(seed)
      val n = 500 + rnd.nextInt(1500)
      val keys = rnd.shuffle((1 to n).map(i => f"k${rnd.nextInt(1 << 30)}%010d-$i").toList)
      val df = keys.toDF("name").repartition(1 + rnd.nextInt(16))
      val dense = Ids.dense(df, Seq(col("name")), "id")
        .select(col("name"), col("id").cast("int").as("id"))
        .as[(String, Int)].collect().toMap
      val seq = Ids.sequential(df, Seq(col("name")), "id")
        .as[(String, Int)].collect().toMap
      assert(dense === seq, s"seed=$seed n=$n")
    }
  }

  test("hashed ids are stable across runs and unique for unique keys") {
    val a = Ids.hashed(df, Seq("name"), "id").as[(String, Long)].collect().toMap
    val b = Ids.hashed(df, Seq("name"), "id").as[(String, Long)].collect().toMap
    assert(a === b)
    assert(a.values.toSet.size === 4)
  }
}
