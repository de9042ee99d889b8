package graft.tools

import org.apache.spark.sql.functions._

/** Measures the [[graft.ops.Scd2]] naive-vs-stitched regime split on
  * TWO synthetic corpora so the scaladoc's "when to use" guidance is a
  * measurement, not an assertion:
  *
  *  - `shallow`: many keys, few changes each (the q40/testdata shape —
  *    the regime where the naive per-key window wins because the
  *    stitch's boundary tables are fact-sized);
  *  - `hub`: a handful of keys each carrying a DEEP change log (the
  *    telemetry-grade SCD shape — the regime the stitched form exists
  *    for, where the naive form funnels each key's entire history
  *    through one reducer sort).
  *
  * Both forms run on both corpora (warm-up pass, then min of two timed
  * passes, the Bench discipline) and the row counts are cross-checked
  * equal — the equivalence gate riding along with the measurement.
  * Output: one JSON line.
  *
  * Usage: `sbt "runMain graft.tools.Scd2Probe"` (SPARK_GRAFT_CPUS to
  * size the session; corpus sizes are fixed so artifacts compare
  * across runs).
  */
object Scd2Probe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16").toInt
    val spark = graft.GraftSession.local(cpus)
    import spark.implicits._

    // attr = murmur3(k, ts) mod 3: any LINEAR derivation has a fixed
    // per-step stride mod 3 (0 → attr frozen per key, suppression
    // trivially total; non-0 → never equal, suppression trivially
    // zero — the first two probe drafts hit both). The hash gives a
    // genuine ~1/3 consecutive-equal rate, so the suppression filter
    // and the versions-pass seams both do real work in both corpora.
    def attr = pmod(hash(col("k"), col("ts")), lit(3))
      .cast("string").as("attr")
    // shallow: 150k keys x 10 changes (the sf1 orders shape)
    val shallow = spark.range(1500000L).select(
      (col("id") % 150000L).as("k"),
      (col("id") / 150000L).as("ts"),
      col("id").as("tie"))
      .select(col("k"), col("ts"), col("tie"), attr)
      .repartition(cpus).persist()
    // hub: 4 keys x 2M changes (deep per-entity history)
    val hub = spark.range(8000000L).select(
      (col("id") % 4L).as("k"),
      (col("id") / 4L).as("ts"),
      col("id").as("tie"))
      .select(col("k"), col("ts"), col("tie"), attr)
      .repartition(cpus).persist()
    shallow.count(); hub.count()

    def naive(df: org.apache.spark.sql.DataFrame) =
      graft.ops.Scd2.history(df, Seq("k"), "ts", "tie", Seq("attr"))
    def stitched(df: org.apache.spark.sql.DataFrame) =
      graft.ops.Scd2.historyStitched(df, Seq("k"), "ts", "tie", Seq("attr"),
        segOrd = col("ts"), bucketWidth = 1L << 14)

    def time(mk: => org.apache.spark.sql.DataFrame): (Double, Long) = {
      var rows = 0L
      def pass(): Double = {
        val t0 = System.nanoTime(); rows = mk.count()
        (System.nanoTime() - t0) / 1e9
      }
      pass() // warm-up
      (math.min(pass(), pass()), rows)
    }

    val results = for {
      (cName, corpus) <- Seq("shallow" -> shallow, "hub" -> hub)
      (fName, form) <- Seq("naive" -> naive _, "stitched" -> stitched _)
    } yield {
      val (sec, rows) = time(form(corpus))
      (cName, fName, sec, rows)
    }
    // equivalence gate: same version count per corpus
    Seq("shallow", "hub").foreach { c =>
      val counts = results.filter(_._1 == c).map(_._4).distinct
      require(counts.size == 1, s"$c: version counts differ: $counts")
    }
    val qs = results.map { case (c, f, sec, rows) =>
      s""""${c}_$f":{"sec":${math.round(sec * 1000) / 1000.0},"rows":$rows}"""
    }.mkString(",")
    spark.stop()
    println(s"""{"metric":"scd2_regime_probe","unit":"sec","cpus":$cpus,$qs}""")
  }
}
