package graft.ops

import graft.SparkSpec

/** SCD2 semantics the q40 oracle data can't exercise: NULL attribute
  * values must version like any other value (null-safe compare), and
  * interval chains must partition time per key. */
class Scd2Spec extends SparkSpec {

  private def hist(rows: Seq[(Int, Int, Int, String)]) = {
    import spark.implicits._
    Scd2.history(rows.toDF("k", "ts", "id", "attr"),
        Seq("k"), ts = "ts", tie = "id", attrs = Seq("attr"))
      .select("k", "id", "attr", "eff_from", "eff_to", "is_current")
      .collect()
      .map(r => (r.getInt(0), r.getInt(1), Option(r.getString(2)),
        r.getInt(3), if (r.isNullAt(4)) None else Some(r.getInt(4)),
        r.getBoolean(5)))
      .sortBy(t => (t._1, t._4, t._2))
  }

  test("consecutive duplicates suppressed; intervals chain; last is current") {
    val h = hist(Seq((1, 10, 1, "a"), (1, 20, 2, "a"), (1, 30, 3, "b"),
      (1, 40, 4, "a"), (2, 5, 5, "x")))
    assert(h === Seq(
      (1, 1, Some("a"), 10, Some(30), false),
      (1, 3, Some("b"), 30, Some(40), false),
      (1, 4, Some("a"), 40, None, true),
      (2, 5, Some("x"), 5, None, true)))
  }

  test("NULL attribute values open and close versions (null-safe compare)") {
    val h = hist(Seq((1, 10, 1, null), (1, 20, 2, null), (1, 30, 3, "a"),
      (1, 40, 4, null)))
    assert(h === Seq(
      (1, 1, None, 10, Some(30), false),
      (1, 3, Some("a"), 30, Some(40), false),
      (1, 4, None, 40, None, true)))
  }

  test("same-ts changes order by the tiebreak") {
    val h = hist(Seq((1, 10, 2, "b"), (1, 10, 1, "a"), (1, 10, 3, "a")))
    // id order: a(1), b(2), a(3) — all three survive (alternating)
    assert(h.map(_._3) === Seq(Some("a"), Some("b"), Some("a")))
    assert(h.count(_._6) === 1)
  }

  test("historyStitched equals history across seam-engineered data") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // 3 keys × 4000 ts, width-64 segments ⇒ ~63 seams per key, with:
    //  - long suppressed runs spanning many seams (key A repeats its
    //    status for 300-ts stretches ⇒ whole segments produce no
    //    version and the lead carry must hop them),
    //  - equal-ts groups straddling a seam boundary value (ts=64k),
    //  - a key whose attr is constant (ONE version total),
    //  - NULL attribute stretches (null-safe compare across seams).
    val rows = (0 until 4000).flatMap { t =>
      val a = ("A", t, t * 10 + 1,
        if ((t / 300) % 2 == 0) "s0" else s"s${t / 700}")
      val b = ("B", t, t * 10 + 2,
        if (t % 5 == 0) null else s"v${(t / 64) % 3}")
      val c = ("C", t, t * 10 + 3, "const")
      // a NULL key: the naive window partitions NULLs like any value,
      // so the stitched carry joins must be null-safe or these rows
      // silently vanish (round-12 review catch)
      val n = (null.asInstanceOf[String], t, t * 10 + 6,
        s"n${(t / 100) % 2}")
      // equal-ts pile-up exactly at segment boundaries
      val extra = if (t % 64 == 0)
        Seq(("A", t, t * 10 + 4, "tiebreak"), ("A", t, t * 10 + 5, "s0"))
      else Seq.empty
      Seq(a, b, c, n) ++ extra
    }
    val df = rows.toDF("k", "ts", "id", "attr").repartition(8)
    def canon(h: org.apache.spark.sql.DataFrame) = h
      .select("k", "id", "attr", "eff_from", "eff_to", "is_current")
      .collect().map(_.toString).sorted.toSeq
    val naive = canon(Scd2.history(
      df, Seq("k"), ts = "ts", tie = "id", attrs = Seq("attr")))
    val stitched = canon(Scd2.historyStitched(
      df, Seq("k"), ts = "ts", tie = "id", attrs = Seq("attr"),
      segOrd = col("ts"), bucketWidth = 64))
    assert(stitched.size === naive.size,
      s"version counts differ: ${stitched.size} vs ${naive.size}")
    assert(stitched === naive)
    // NULL-keyed versions actually present in both outputs (the
    // equivalence assert would also pass if BOTH forms dropped them)
    assert(naive.exists(_.startsWith("[null,")),
      "corpus must produce NULL-keyed versions")
    // contract guards
    val e = intercept[IllegalArgumentException] {
      Scd2.historyStitched(df, Seq("k"), "ts", "id", Seq("attr"),
        col("ts"), bucketWidth = 0)
    }
    assert(e.getMessage.contains("bucketWidth"))
    val e2 = intercept[IllegalArgumentException] {
      Scd2.historyStitched(df, Seq("k"), "ts", "id", Seq("attr"),
        segOrd = col("ts").cast("string"), bucketWidth = 64)
    }
    assert(e2.getMessage.contains("integral"))
  }
}
