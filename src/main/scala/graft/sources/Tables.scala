package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Readers for the driver-provided parquet tables (TESTDATA.md).
  *
  * Kept as plain declarative `spark.read.parquet` scans so Catalyst pushes
  * filters and column projections into the parquet reader (visible as
  * `PushedFilters` / `ReadSchema` in `.explain("formatted")`). At 100 TB the
  * difference between a pruned scan and a full-column scan dominates query
  * time, so nothing here materializes, caches, or collects.
  *
  * Reference data contract: /root/reference/processor/streaming_processor.py:53-64
  * (explicit event schema); here the schema comes from parquet footers, which
  * are equally explicit (no inference pass over data).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** The events table carries a nanosecond-precision timestamp, which Spark's
    * TimestampType (µs) cannot represent — we read it as a raw nanos long
    * (`nanosAsLong`, set defensively here in case the caller's session didn't)
    * and derive `ts_sec` once with exact integral division (`div`). Doing the
    * second-truncation in integer space avoids the double-precision hazard:
    * epoch-nanos ≈ 1.7e18 exceeds 2^53, so a float division could be off by a
    * second at the boundary. All downstream time logic uses `ts_sec`. */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    table(s, d, "events")
      .withColumn("ts_sec", org.apache.spark.sql.functions.expr("ts div 1000000000"))
  }
  def lineitem(s: SparkSession, d: String): DataFrame   = table(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame     = table(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame   = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = table(s, d, "supplier")
  def nation(s: SparkSession, d: String): DataFrame     = table(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame     = table(s, d, "region")
  def part(s: SparkSession, d: String): DataFrame       = table(s, d, "part")
  def documents(s: SparkSession, d: String): DataFrame  = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
