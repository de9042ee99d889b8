package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Salting must never change results — only distribution. */
class SaltSpec extends SparkSpec {
  import spark.implicits._

  private val big = (1 to 2000).map(i =>
    (if (i % 10 == 0) "rare" + i else "HOT", i.toDouble)) // 90% one key
    .toDF("k", "v")
  private val small = Seq(("HOT", 1), ("rare10", 2), ("rare20", 3)).toDF("k", "m")

  test("salted inner join equals plain inner join") {
    val plain = big.join(small, Seq("k"), "inner")
      .select("k", "v", "m").collect().toSet
    val salted = Salt.skewJoin(big, small, Seq("k"), factor = 8)
      .select("k", "v", "m").collect().toSet
    assert(salted === plain)
  }

  test("salted left join preserves unmatched rows exactly once") {
    val plain = big.join(small, Seq("k"), "left")
      .select("k", "v", "m").collect()
    val salted = Salt.skewJoin(big, small, Seq("k"), factor = 8, "left")
      .select("k", "v", "m").collect()
    assert(salted.length === plain.length)
    assert(salted.toSet === plain.toSet)
  }

  test("skewedSum equals plain grouped sum") {
    val plain = big.groupBy("k").agg(sum("v").as("total"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val salted = Salt.skewedSum(big, Seq("k"), "v", factor = 8, out = "total")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(salted.keySet === plain.keySet)
    plain.foreach { case (k, v) =>
      assert(math.abs(salted(k) - v) < 1e-9, s"key $k") }
  }

  test("replication factor bounds the small-side blowup") {
    val replicatedRows = Salt.skewJoin(big.limit(0), small, Seq("k"), factor = 8)
    assert(replicatedRows.count() === 0) // empty big side → no output
  }
}
