package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Parquet table loaders for the driver-generated testdata star schema
  * (TESTDATA.md). In production these would be `spark.read.jdbc` /
  * Delta-table reads; the load path is isolated here so sources can be
  * swapped without touching operators.
  *
  * Scale note: parquet scans here are plain `spark.read.parquet` so
  * Catalyst's `ColumnPruning` + `PushDownPredicates` reach the scan
  * (verify with `.explain`: `PushedFilters`, `ReadSchema`).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    // events needs its nanos-timestamp workaround on EVERY path,
    // including generic by-name loads (e.g. the Bench warmup scan).
    if (name == "events") events(spark, dir)
    else spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = apply(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = apply(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = apply(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = apply(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = apply(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = apply(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = apply(s, d, "lineitem")
  /** events.ts is parquet TIMESTAMP(NANOS), which Spark's vectorized
    * reader rejects ([PARQUET_TYPE_ILLEGAL]). Read nanos as long
    * (legacy conf) and convert with integer division — `div`, not `/`,
    * because 1.7e18 ns exceeds double's 2^53 exact-integer range.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    nanosTsToMicros(s.read.parquet(s"$d/events.parquet"))
  }

  /** Shared nanos-long → microsecond-timestamp conversion (integer
    * `div`, not `/`: 1.7e18 ns exceeds double's exact-integer range).
    * Used by the batch loader above and the streaming reader.
    */
  def nanosTsToMicros(df: DataFrame, tsCol: String = "ts"): DataFrame =
    df.withColumn(tsCol, timestamp_micros(expr(s"$tsCol div 1000")))
  def documents(s: SparkSession, d: String): DataFrame = apply(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = apply(s, d, "embeddings")
}
