package graft.ops

import graft.SparkSpec
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** S9/S10/U7/U8: the two merge modes and their algebraic laws
  * (SURVEY.md §7.4 (5): both modes must be idempotent). */
class UpsertSpec extends SparkSpec {
  import spark.implicits._

  private def table(rows: Seq[(Int, String)]) = rows.toDF("id", "v")

  private def holds(p: Prop, n: Int = 15): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(n), p)
    assert(res.passed, res.status.toString)
  }

  test("updateWins: incoming replaces existing on key match") {
    val out = Upsert.updateWins(
      table(Seq(1 -> "old1", 2 -> "old2")),
      table(Seq(2 -> "new2", 3 -> "new3")), Seq("id"))
      .orderBy("id").as[(Int, String)].collect()
    assert(out.toSeq === Seq(1 -> "old1", 2 -> "new2", 3 -> "new3"))
  }

  test("ignoreNew: existing survives, only absent keys inserted") {
    val out = Upsert.ignoreNew(
      table(Seq(1 -> "old1", 2 -> "old2")),
      table(Seq(2 -> "new2", 3 -> "new3")), Seq("id"))
      .orderBy("id").as[(Int, String)].collect()
    assert(out.toSeq === Seq(1 -> "old1", 2 -> "old2", 3 -> "new3"))
  }

  test("insertStats counts inserted/skipped/total like scr/Load.py:291-302") {
    val (ins, skip, total) = Upsert.insertStats(
      table(Seq(1 -> "a", 2 -> "b")), table(Seq(2 -> "x", 3 -> "y", 4 -> "z")), Seq("id"))
    assert((ins, skip, total) === (2L, 1L, 4L))
  }

  private val rowsGen: Gen[List[(Int, String)]] = for {
    n    <- Gen.choose(0, 12)
    rows <- Gen.listOfN(n, Gen.zip(Gen.choose(0, 6), Gen.oneOf("a", "b", "c")))
  } yield rows.groupBy(_._1).map(_._2.head).toList // unique keys per table

  test("property: upsert(upsert(t,x),x) == upsert(t,x) for both modes") {
    holds(Prop.forAll(rowsGen, rowsGen) { (oldRows, newRows) =>
      val t = table(oldRows); val x = table(newRows)
      val uw1 = Upsert.updateWins(t, x, Seq("id"))
      val uw2 = Upsert.updateWins(uw1, x, Seq("id"))
      val in1 = Upsert.ignoreNew(t, x, Seq("id"))
      val in2 = Upsert.ignoreNew(in1, x, Seq("id"))
      uw1.collect().toSet == uw2.collect().toSet &&
        in1.collect().toSet == in2.collect().toSet
    })
  }

  test("property: merge result is invariant under input partitioning") {
    holds(Prop.forAll(rowsGen, rowsGen) { (oldRows, newRows) =>
      val t = table(oldRows); val x = table(newRows)
      Upsert.updateWins(t.repartition(7), x.repartition(3), Seq("id")).collect().toSet ==
        Upsert.updateWins(t, x, Seq("id")).collect().toSet &&
      Upsert.ignoreNew(t.repartition(5), x.repartition(2), Seq("id")).collect().toSet ==
        Upsert.ignoreNew(t, x, Seq("id")).collect().toSet
    })
  }

  test("property: both modes emit exactly one row per key in old ∪ new") {
    holds(Prop.forAll(rowsGen, rowsGen) { (oldRows, newRows) =>
      val keys = (oldRows.map(_._1) ++ newRows.map(_._1)).toSet
      val t = table(oldRows); val x = table(newRows)
      Upsert.updateWins(t, x, Seq("id")).count() == keys.size &&
        Upsert.ignoreNew(t, x, Seq("id")).count() == keys.size
    })
  }

  test("merge applies I/U/D: update payload lands, delete key vanishes, insert appears") {
    import org.apache.spark.sql.functions.lit
    val t = table(Seq(1 -> "a", 2 -> "b", 3 -> "c"))
    val changes = Seq((2, "U", "B"), (3, "D", null), (4, "I", "d"))
      .toDF("id", "op", "v")
    val out = Upsert.merge(t, changes, Seq("id"))
      .orderBy("id").as[(Int, String)].collect()
    assert(out.toSeq === Seq(1 -> "a", 2 -> "B", 4 -> "d"))
    intercept[IllegalArgumentException] {
      Upsert.merge(t, t.withColumn("x", lit(1)), Seq("id"))
    }
  }

  test("property: CDF round-trip — merge(v1, diffRows(v1, v2)) == v2") {
    holds(Prop.forAll(rowsGen, rowsGen) { (v1Rows, v2Rows) =>
      val v1 = table(v1Rows); val v2 = table(v2Rows)
      val cdc = SnapshotDiff.diffRows(v1, v2, Seq("id"))
      Upsert.merge(v1, cdc, Seq("id")).collect().toSet ==
        v2.collect().toSet
    })
  }

  test("diffRows carries the new payload and classifies like diff") {
    val v1 = table(Seq(1 -> "a", 2 -> "b", 3 -> "c"))
    val v2 = table(Seq(2 -> "B", 3 -> "c", 4 -> "d"))
    val got = SnapshotDiff.diffRows(v1, v2, Seq("id"))
      .orderBy("id").as[(Int, String, String)].collect()
    assert(got.toSeq === Seq((1, "D", null), (2, "U", "B"), (4, "I", "d")))
  }
}
