package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr, unix_timestamp}
import org.apache.spark.sql.types.{LongType, StructType, TimestampNTZType, TimestampType}

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

  /** Epoch-second expression for whatever physical type the driver's parquet
    * stores `ts` as — the generator has shipped both int64 epoch-nanos and
    * timestamp[us] over time, so the reader adapts to the footer schema
    * instead of assuming one. All downstream time logic uses the derived
    * `ts_sec` long; both engines floor to the second (`div` / `unix_timestamp`
    * here, `epoch(date_trunc('second', ts))` in the DuckDB oracle), so the
    * grain is identical regardless of source precision.
    *
    *  - int64 nanos: exact integral division (`div`) — epoch-nanos ≈ 1.7e18
    *    exceeds 2^53, so a float division could be off by a second.
    *  - timestamp[us] (µs, UTC-adjusted): `unix_timestamp` floors to seconds.
    *  - timestamp_ntz[us]: cast to TimestampType first; the session time zone
    *    is pinned to UTC (GraftSession), which matches DuckDB's treatment of
    *    naive parquet timestamps as UTC wall-clock.
    */
  def tsSec(schema: StructType): Column = schema("ts").dataType match {
    case LongType         => expr("ts div 1000000000")
    case TimestampType    => unix_timestamp(col("ts"))
    case TimestampNTZType => unix_timestamp(col("ts").cast(TimestampType))
    case dt => throw new IllegalArgumentException(
      s"events.ts has unsupported type $dt (expected int64 nanos or a timestamp)")
  }
  def tsSec(df: DataFrame): Column = tsSec(df.schema)

  /** Events with a derived epoch-second `ts_sec` column (see [[tsSec]]).
    * `nanosAsLong` is set defensively in case the caller's session didn't:
    * it only affects TIMESTAMP(NANOS) parquet columns (read as raw longs —
    * Spark's µs TimestampType cannot represent them) and is a no-op for the
    * µs-precision data the generator currently ships. */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = table(s, d, "events")
    raw.withColumn("ts_sec", tsSec(raw))
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
