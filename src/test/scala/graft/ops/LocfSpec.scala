package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** [[Locf.fill]]'s contract: row-identical to the naive global
  * per-key ignoreNulls running window, on data engineered to cross
  * partition seams — keys spanning many range partitions, leading
  * all-null runs (no carry available), null runs longer than a
  * partition slice (carry must hop over an all-null boundary group),
  * and a key whose every value is null. */
class LocfSpec extends SparkSpec {

  private def naive(df: org.apache.spark.sql.DataFrame) = {
    val w = Window.partitionBy(col("k")).orderBy(col("ord"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("expect", last(col("v"), ignoreNulls = true).over(w))
  }

  test("fill equals the naive global window across partition seams") {
    import spark.implicits._
    // 2 keys × 5000 ordinals, 8-way range partitioning ⇒ each key
    // spans ~4 partitions; nulls: every 3rd masked, plus a long
    // leading null run on key B (ords 0–1499 all null: longer than a
    // partition slice, so the within-fill is null for entire tasks
    // and the carry must deliver... nothing — heads stay null), plus
    // key C entirely null.
    val rows = (0 until 5000).flatMap { i =>
      Seq(
        ("A", i.toLong, if (i % 3 == 0) None else Some(i.toDouble)),
        ("B", i.toLong, if (i < 1500 || i % 3 == 1) None else Some(i * 2.0)),
        ("C", i.toLong, None: Option[Double]))
    }
    // bucketWidth 256 ⇒ ~20 segments per key: seams, all-null
    // segments and carry hops are all genuinely exercised (the
    // default 2^14 would swallow this corpus into one segment and
    // prove nothing)
    val df = rows.toDF("k", "ord", "v").repartition(8)
    val got = Locf.fill(df, Seq("k"), "ord", "v", "got", bucketWidth = 256)
    val joined = naive(df).join(got, Seq("k", "ord"))
    assert(joined.count() === 15000)
    val diff = joined.filter(
      !(col("expect") <=> col("got"))).count()
    assert(diff === 0, s"$diff rows differ from the naive LOCF")
    // the leading-null head really stayed null (no phantom carry)
    assert(got.filter(col("k") === "B" && col("ord") < 1500 &&
      col("got").isNotNull).count() === 0)
    assert(got.filter(col("k") === "C" && col("got").isNotNull).count() === 0)
  }

  test("neighbors equals the naive bidirectional windows across seams") {
    import spark.implicits._
    val rows = (0 until 4000).flatMap { i =>
      Seq(
        ("A", i.toLong, if (i % 3 == 0) None else Some(i.toDouble)),
        // leading + trailing all-null runs longer than a slice, so
        // both carry directions must hop over empty boundary groups
        ("B", i.toLong,
          if (i < 1200 || i >= 2800 || i % 2 == 0) None else Some(i * 2.0)))
    }
    val df = rows.toDF("k", "ord", "v").repartition(8)
    val before = Window.partitionBy(col("k")).orderBy(col("ord"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val after = Window.partitionBy(col("k")).orderBy(col("ord").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val expect = df
      .withColumn("e_pv", last(col("v"), ignoreNulls = true).over(before))
      .withColumn("e_pt", last(when(col("v").isNotNull, col("ord")),
        ignoreNulls = true).over(before))
      .withColumn("e_nv", last(col("v"), ignoreNulls = true).over(after))
      .withColumn("e_nt", last(when(col("v").isNotNull, col("ord")),
        ignoreNulls = true).over(after))
    val got = Locf.neighbors(df, Seq("k"), "ord", "v", bucketWidth = 256)
    val joined = expect.join(got, Seq("k", "ord"))
    assert(joined.count() === 8000)
    val diff = joined.filter(
      !(col("e_pv") <=> col("pv")) || !(col("e_pt") <=> col("pt")) ||
        !(col("e_nv") <=> col("nv")) || !(col("e_nt") <=> col("nt"))).count()
    assert(diff === 0, s"$diff rows differ from the naive neighbor windows")
  }

  test("fill preserves row count and schema additions only") {
    import spark.implicits._
    val df = Seq(("x", 1L, Some(1.0)), ("x", 2L, None), ("y", 1L, None))
      .toDF("k", "ord", "v")
    val got = Locf.fill(df, Seq("k"), "ord", "v", "f")
    assert(got.count() === 3)
    assert(got.columns.toSet === Set("k", "ord", "v", "f"))
    val m = got.collect().map(r =>
      (r.getString(0), r.getLong(1)) -> Option(r.get(3))).toMap
    assert(m(("x", 2L)) === Some(1.0))
    assert(m(("y", 1L)) === None)
  }

  test("contract guards fail fast: bucketWidth > 0, integral ord") {
    import spark.implicits._
    val ok = Seq(("a", 1L, Some(1.0))).toDF("k", "ord", "v")
    val e1 = intercept[IllegalArgumentException] {
      Locf.fill(ok, Seq("k"), "ord", "v", "got", bucketWidth = 0)
    }
    assert(e1.getMessage.contains("bucketWidth"))
    val e2 = intercept[IllegalArgumentException] {
      Locf.neighbors(ok, Seq("k"), "ord", "v", bucketWidth = -16)
    }
    assert(e2.getMessage.contains("bucketWidth"))
    // a double ord would CAST-truncate inside gidCol, silently merging
    // distinct ordinals — must be rejected up front, both entry points
    val badOrd = Seq(("a", 1.5, Some(1.0))).toDF("k", "ord", "v")
    val e3 = intercept[IllegalArgumentException] {
      Locf.fill(badOrd, Seq("k"), "ord", "v", "got")
    }
    assert(e3.getMessage.contains("integral"))
    val e4 = intercept[IllegalArgumentException] {
      Locf.neighbors(badOrd, Seq("k"), "ord", "v")
    }
    assert(e4.getMessage.contains("integral"))
    // int ord stays accepted (the guard allows all integral widths)
    val intOrd = Seq(("a", 1, Some(1.0)), ("a", 2, None: Option[Double]))
      .toDF("k", "ord", "v")
    val filled = Locf.fill(intOrd, Seq("k"), "ord", "v", "got")
    assert(filled.filter(col("ord") === 2 && col("got") === 1.0).count() === 1)
  }
}
