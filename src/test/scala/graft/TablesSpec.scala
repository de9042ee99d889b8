package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType}

/** The events loader's normalization contract: whatever physical
  * timestamp layout the testdata generation ships (TIMESTAMP(NANOS)
  * read as ns-longs in earlier rounds, native TIMESTAMP(MICROS)
  * now), every downstream query sees the same two columns:
  * `ts_ns` epoch-nanos long + `ts` µs TIMESTAMP_NTZ, mutually
  * consistent. A driver-side testdata regeneration must never again
  * take out the whole events family (round-7 incident: ts switched
  * ns→µs and 41 specs went red at once). */
class TablesSpec extends SparkSpec {

  test("events normalizes to the (ts_ns long, ts ntz) contract") {
    val e = Tables.events(spark, sfDir)
    assert(e.schema("ts_ns").dataType === LongType)
    assert(e.schema("ts").dataType === TimestampNTZType)
    // the two representations agree: ts is exactly the µs floor of ts_ns
    val off = e.filter(
      expr("unix_micros(cast(ts as timestamp)) != ts_ns div 1000")).count()
    assert(off === 0, s"$off rows where ts != floor_us(ts_ns)")
    // plausible epoch range (year 2000..2100), not garbage from a
    // wrong unit interpretation (ns-as-µs would land in year ~1970)
    val row = e.agg(min(col("ts_ns")).as("lo"), max(col("ts_ns")).as("hi")).head()
    val (lo, hi) = (row.getLong(0), row.getLong(1))
    assert(lo > 946684800L * 1000000000L, s"ts_ns lo=$lo before year 2000 — unit bug")
    assert(hi < 4102444800L * 1000000000L, s"ts_ns hi=$hi after year 2100 — unit bug")
  }

  test("parquet footer metadata equals the scan: row count and max(ts)") {
    import org.apache.spark.sql.functions._
    for (name <- Seq("events", "embeddings")) {
      val scanned = Tables.load(spark, sfDir, name).count()
      assert(Tables.parquetRowCount(spark, sfDir, name) === Some(scanned),
        s"$name footer row count must equal the scan count")
    }
    val footerMax = Tables.parquetColumnMaxLong(spark, sfDir, "events", "ts")
    assert(footerMax.isDefined, "events.ts chunks must carry statistics")
    val scanMaxNs = Tables.events(spark, sfDir)
      .agg(max(col("ts_ns"))).head().getLong(0)
    // the footer max is in the PHYSICAL unit (ns for TIMESTAMP(NANOS)
    // under nanosAsLong, µs for native micros); normalize via schema
    val physIsNanos = spark.read.parquet(s"$sfDir/events.parquet")
      .schema("ts").dataType == org.apache.spark.sql.types.LongType
    val footerNs = if (physIsNanos) footerMax.get else footerMax.get * 1000L
    assert(footerNs === scanMaxNs,
      "footer max(ts) must equal the scanned max exactly")
  }
}
