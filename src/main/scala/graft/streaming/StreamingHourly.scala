package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Cols

/** The reference's watermarked hourly aggregation (T1/T2) executed as a REAL
  * Structured Streaming query over the driver's events table, with the
  * memory sink capturing append-mode output.
  *
  * This is the oracle-checkable face of the streaming engine: in append
  * mode only windows *closed by the watermark* are ever emitted, so the
  * result equals the batch hourly aggregation restricted to windows whose
  * end ≤ final watermark (max event time − 10 min) — a condition a SQL
  * oracle can state exactly. The file source delivers the data, the no-data
  * micro-batch after it advances the watermark and flushes closed windows.
  * (Semantics per "Structured Streaming: A Declarative API for Real-Time
  * Applications in Apache Spark", SIGMOD 2018.)
  */
object StreamingHourly {
  val WatermarkSeconds = 600L

  /** The file streaming source requires a directory; the testdata is a bare
    * (read-only) parquet file, so stage it under the JVM tmpdir — SPLIT
    * into [[StagedSlices]] parquet files. A single small file is one input
    * split, so every micro-batch decoded the whole table on ONE task while
    * the other executor threads idled; slicing parallelizes batch-0
    * scan+parse for every file-source streaming query over the events
    * table (all of which are proven slicing-independent by StreamingSpec).
    * The staged copy is invalidated when the source file's (size, mtime)
    * changes. The staged rewrite stores `ts` with the source's physical
    * type unchanged (int64 nanos or timestamp[us] depending on generator
    * vintage); readers derive `ts_sec` adaptively via `Tables.tsSec`. */
  private[streaming] val StagedSlices = 8
  private[streaming] def stagedEventsDir(spark: SparkSession, dir: String): String =
    synchronized {
      import java.nio.file.{Files, Paths}
      val src = Paths.get(s"$dir/events.parquet")
      val d   = Paths.get(System.getProperty("java.io.tmpdir"),
        s"graft_stream_${Integer.toHexString(dir.hashCode)}")
      val marker = d.resolve("_staged")
      val stamp = s"${Files.size(src)}:${Files.getLastModifiedTime(src).toMillis}:$StagedSlices"
      val valid = Files.exists(marker) &&
        new String(Files.readAllBytes(marker), "UTF-8") == stamp
      if (!valid) {
        spark.read.parquet(src.toString).repartition(StagedSlices)
          .write.mode("overwrite").parquet(d.toString)
        Files.write(marker, stamp.getBytes("UTF-8"))
      }
      d.toString
    }

  /** Side-specific staged slice: events of ONE type, for queries that only
    * consume that side (the stream-stream interval joins read purchases and
    * views — 40% of the corpus; scanning the full staged table on BOTH
    * sides of a self-join decodes 200%). This is materialized predicate
    * pushdown at staging time: the filter commutes with everything
    * downstream (each side filtered before its watermark either way), so
    * results are bit-identical — only the per-micro-batch scan shrinks.
    * Fewer slices than the full table: each side is ~1/5 the rows. */
  private[streaming] def stagedTypeDir(spark: SparkSession, dir: String, eventType: String): String =
    synchronized {
      import java.nio.file.{Files, Paths}
      val src = Paths.get(s"$dir/events.parquet")
      val d   = Paths.get(System.getProperty("java.io.tmpdir"),
        s"graft_stream_${Integer.toHexString(dir.hashCode)}_$eventType")
      val marker = d.resolve("_staged")
      val stamp = s"${Files.size(src)}:${Files.getLastModifiedTime(src).toMillis}:4"
      val valid = Files.exists(marker) &&
        new String(Files.readAllBytes(marker), "UTF-8") == stamp
      if (!valid) {
        spark.read.parquet(src.toString)
          .where(org.apache.spark.sql.functions.col("event_type") === eventType)
          .repartition(4).write.mode("overwrite").parquet(d.toString)
        Files.write(marker, stamp.getBytes("UTF-8"))
      }
      d.toString
    }

  /** Staged-source schema, cached per path: every oracle streaming query
    * pays a batch footer-read just to declare the file-stream schema, and
    * the staged testdata is immutable — one read per path per JVM serves
    * all of them (the interval joins would otherwise pay it twice in one
    * query). */
  private val schemaCache =
    new java.util.concurrent.ConcurrentHashMap[String, org.apache.spark.sql.types.StructType]()
  private[streaming] def stagedSchema(spark: SparkSession, path: String) =
    schemaCache.computeIfAbsent(path, p => spark.read.parquet(p).schema)

  def closedHourlyMetrics(spark: SparkSession, dir: String): DataFrame =
    closedHourlyMetricsFrom(spark, stagedEventsDir(spark, dir), Map.empty)

  /** [[closedHourlyMetrics]] over an explicit staged source directory with
    * extra file-source options — the hook StreamingSpec uses to prove the
    * result is INDEPENDENT of micro-batch slicing (`maxFilesPerTrigger=1`
    * over time-ordered file slices must equal the one-batch run: append
    * mode emits exactly the watermark-closed windows either way). */
  private[graft] def closedHourlyMetricsFrom(spark: SparkSession, path: String,
                                             options: Map[String, String]): DataFrame = {
    val schema = stagedSchema(spark, path)
    val stream = spark.readStream.options(options).schema(schema).parquet(path)
      .withColumn("ts_sec", graft.sources.Tables.tsSec(schema))
      .withColumn("event_time", timestamp_seconds(col("ts_sec")))

    val agg = stream
      .withWatermark("event_time", s"$WatermarkSeconds seconds")
      .groupBy(window(col("event_time"), "1 hour").as("w"))
      .agg(
        count(lit(1)).as("total_events"),
        Cols.countWhen(col("event_type") === "view").as("page_views"),
        Cols.countWhen(col("event_type") === "click").as("clicks"),
        Cols.countWhen(col("event_type") === "purchase").as("purchases"),
        Cols.countWhen(col("event_type") === "signup").as("signups"),
        Cols.countWhen(col("event_type") === "error").as("errors"),
        Cols.sumDec2When(col("event_type") === "purchase", col("value")).as("revenue"),
        Cols.pct4(
          Cols.countWhen(col("event_type") === "purchase"),
          Cols.countWhen(col("event_type") === "view")).as("conversion_rate"))
      .select(unix_timestamp(col("w.start")).as("hour_sec"),
        col("total_events"), col("page_views"), col("clicks"), col("purchases"),
        col("signups"), col("errors"), col("revenue"), col("conversion_rate"))

    // ~720 hour groups: a small partition count avoids per-micro-batch
    // state-store overhead (see MemorySinkRunner)
    MemorySinkRunner.run(spark, agg, "graft_stream_hourly", shufflePartitions = 8)
      .orderBy(col("hour_sec"))
  }

  /** Sliding windows (T2 extended beyond the reference's tumbling grid):
    * 1-hour windows every 30 minutes, so each event lands in exactly TWO
    * overlapping windows. Spark aligns slide starts to the epoch origin,
    * so an event at second t belongs to the windows starting at
    * ⌊t/1800⌋·1800 and ⌊t/1800⌋·1800 − 1800 — a condition the SQL oracle
    * states as a two-branch UNION ALL over the same grid arithmetic.
    * Append-mode closure is the tumbling rule unchanged: a window emits
    * iff its END ≤ final watermark (max event second − 600).
    *
    * Scale shape: state is one row per open window — |slides| within the
    * watermark horizon, independent of event volume; the aggregation is
    * map-side combinable and the window assignment is a projection (Spark
    * expands each row to its window memberships before the hash agg, no
    * self-join). Same exact-cents revenue doctrine as the hourly query. */
  def slidingHourCounts(spark: SparkSession, dir: String): DataFrame =
    slidingHourCountsFrom(spark, stagedEventsDir(spark, dir), Map.empty)

  /** [[slidingHourCounts]] over an explicit staged directory + file-source
    * options — the StreamingSpec hook proving slicing-independence, same as
    * [[closedHourlyMetricsFrom]]. */
  private[graft] def slidingHourCountsFrom(spark: SparkSession, path: String,
                                           options: Map[String, String]): DataFrame = {
    val schema = stagedSchema(spark, path)
    val stream = spark.readStream.options(options).schema(schema).parquet(path)
      .withColumn("ts_sec", graft.sources.Tables.tsSec(schema))
      .withColumn("event_time", timestamp_seconds(col("ts_sec")))

    val agg = stream
      .withWatermark("event_time", s"$WatermarkSeconds seconds")
      .groupBy(window(col("event_time"), "1 hour", "30 minutes").as("w"))
      .agg(count(lit(1)).as("events"),
        Cols.countWhen(col("event_type") === "purchase").as("purchases"),
        Cols.sumDec2When(col("event_type") === "purchase", col("value")).as("revenue"))
      .select(unix_timestamp(col("w.start")).as("win_start_sec"),
        col("events"), col("purchases"), col("revenue"))

    MemorySinkRunner.run(spark, agg, "graft_stream_sliding", shufflePartitions = 8)
      .orderBy(col("win_start_sec"))
  }

  /** T8 complete mode — the third output mode: every micro-batch REPLACES
    * the sink with the full aggregate-so-far (the memory sink truncates per
    * batch), so after the last batch the table IS the total aggregation —
    * no closure rule, no latest-per-key reduction. Legal without a
    * watermark because complete mode never evicts state; bounded here by
    * the key domain (|event types|), which is the only regime where
    * complete mode is 100 TB-sane. */
  def completeTypeTotals(spark: SparkSession, dir: String): DataFrame = {
    val path   = stagedEventsDir(spark, dir)
    val schema = stagedSchema(spark, path)
    val stream = spark.readStream.schema(schema).parquet(path)

    // null-category doctrine (r14): the per-type census keeps known types
    val agg = stream.where(col("event_type").isNotNull).groupBy(col("event_type"))
      .agg(count(lit(1)).as("events"),
        Cols.sumDec2When(col("event_type") === "purchase", col("value")).as("revenue"))

    MemorySinkRunner.run(spark, agg, "graft_stream_complete",
        shufflePartitions = 4, outputMode = "complete", needNoDataBatch = false)
      .orderBy(col("event_type"))
  }
}
