package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table loaders for the driver-generated testdata star schema
  * (TESTDATA.md). One logical table per parquet file; explicit helper per
  * table keeps call sites typo-proof.
  *
  * At 100 TB these reads stay identical — parquet scans with Catalyst
  * column pruning + predicate pushdown; only the directory changes.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = load(s, d, "lineitem")
  /** events.ts is parquet TIMESTAMP(NANOS), which Spark has no native
    * type for. We read it as a raw nano-precision long
    * (`spark.sql.legacy.parquet.nanosAsLong`) kept as `ts_ns` for exact
    * ordering, plus a truncated-to-micros TIMESTAMP_NTZ `ts` for
    * calendar functions (matches DuckDB's CAST(ns AS TIMESTAMP) floor).
    * Integer `div` is essential: epoch-nanos exceed double's 53-bit
    * mantissa. */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    load(s, d, "events")
      .withColumn("ts_ns", org.apache.spark.sql.functions.col("ts").cast("long"))
      .withColumn("ts", org.apache.spark.sql.functions
        .timestamp_micros(org.apache.spark.sql.functions.expr("ts_ns div 1000"))
        .cast("timestamp_ntz"))
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
