package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Cols

/** Watermarked `session_window` aggregation (T9 scale mode) as a REAL
  * streaming query: per-user sessions with a 1-hour inactivity gap, emitted
  * in append mode once the watermark closes them.
  *
  * Session semantics: each event spans [ts, ts+gap); overlapping spans per
  * user merge, so two events split sessions iff they are ≥ gap apart —
  * identical to the batch gap rule with a ≥ test on time-ordered events
  * (ties in the same second share a session either way, so membership is
  * deterministic). The emitted session end is last-event + gap. Append mode
  * emits a session iff its end ≤ final watermark (max event time − 10 min)
  * — same closure rule as tumbling windows, verified empirically at every
  * scale factor — which is exactly the condition the SQL oracle states.
  */
object StreamingSessions {
  val GapSeconds = 3600L
  val WatermarkSeconds = 600L

  private def sessionAgg(spark: SparkSession, dir: String): DataFrame =
    sessionAggFrom(spark, StreamingHourly.stagedEventsDir(spark, dir), Map.empty)

  /** Session aggregation over an explicit staged source directory with
    * extra file-source options — the StreamingSpec hook that proves
    * session MERGING is independent of micro-batch slicing: a session
    * spanning two time-ordered slices must be stitched across batches by
    * the state store into exactly the single-batch result. */
  private[graft] def sessionAggFrom(spark: SparkSession, path: String,
                                    options: Map[String, String]): DataFrame = {
    val schema = StreamingHourly.stagedSchema(spark, path)
    val stream = spark.readStream.options(options).schema(schema).parquet(path)
      // sessionization is user-keyed: null users excluded, oracle mirrored
      .where(col("user_id").isNotNull)
      .withColumn("ts_sec", graft.sources.Tables.tsSec(schema))
      .withColumn("event_time", timestamp_seconds(col("ts_sec")))

    stream
      .withWatermark("event_time", s"$WatermarkSeconds seconds")
      .groupBy(col("user_id"),
        session_window(col("event_time"), s"$GapSeconds seconds").as("w"))
      .agg(
        count(lit(1)).as("events"),
        Cols.countWhen(col("event_type") === "purchase").as("purchases"),
        Cols.sumDec2When(col("event_type") === "purchase", col("value")).as("revenue"))
      .select(col("user_id"),
        unix_timestamp(col("w.start")).as("start_sec"),
        unix_timestamp(col("w.end")).as("end_sec"),
        col("events"), col("purchases"), col("revenue"))
  }

  def closedSessions(spark: SparkSession, dir: String): DataFrame =
    MemorySinkRunner.run(spark, sessionAgg(spark, dir), "graft_stream_sessions",
        shufflePartitions = 8)
      .orderBy(col("user_id"), col("start_sec"))

  /** [[closedSessions]] over an explicit staged source + options, run to
    * completion — see [[sessionAggFrom]]. */
  private[graft] def closedSessionsFrom(spark: SparkSession, path: String,
                                        options: Map[String, String]): DataFrame =
    MemorySinkRunner.run(spark, sessionAggFrom(spark, path, options),
        "graft_stream_sessions_from", shufflePartitions = 8)
      .orderBy(col("user_id"), col("start_sec"))

  /** T8 update mode — the reference's live-dashboard flow
    * (streaming_processor.py runs its session/dashboard queries in update
    * mode and upserts each batch by key, :268,:388): every micro-batch
    * emits the CURRENT value of each updated group and the consumer keeps
    * the latest row per key. Spark rejects update mode for `session_window`
    * aggregations (merging windows have no stable key — SQLSTATE 42KDE), so
    * the update-mode surface is a STABLE-key aggregation: per-user hourly
    * activity, exactly the reference's upsert-target shape.
    *
    * The "upsert" here is a deterministic latest-per-key reduction: per
    * (user_id, hour) the event count grows monotonically across emissions,
    * so max over the (events, …) struct IS the newest state — no
    * arrival-order dependence. Unlike append mode (q_streaming_hourly),
    * windows still open at the final watermark are included — that is the
    * append/update semantic difference, and the oracle states it by having
    * NO closure filter. */
  def updatedUserHourly(spark: SparkSession, dir: String): DataFrame =
    updatedUserHourlyFrom(spark, StreamingHourly.stagedEventsDir(spark, dir), Map.empty)

  /** [[updatedUserHourly]] over an explicit staged source + options (the
    * ScaleProbe / slicing-test hook, same pattern as [[sessionAggFrom]]). */
  private[graft] def updatedUserHourlyFrom(spark: SparkSession, path: String,
                                           options: Map[String, String]): DataFrame = {
    val schema = StreamingHourly.stagedSchema(spark, path)
    val stream = spark.readStream.options(options).schema(schema).parquet(path)
      // per-user upsert target: null users excluded, oracle mirrored
      .where(col("user_id").isNotNull)
      .withColumn("ts_sec", graft.sources.Tables.tsSec(schema))
      .withColumn("event_time", timestamp_seconds(col("ts_sec")))

    val agg = stream
      .withWatermark("event_time", s"$WatermarkSeconds seconds")
      .groupBy(col("user_id"), window(col("event_time"), "1 hour").as("w"))
      .agg(
        count(lit(1)).as("events"),
        Cols.countWhen(col("event_type") === "purchase").as("purchases"),
        Cols.sumDec2When(col("event_type") === "purchase", col("value")).as("revenue"))
      .select(col("user_id"), unix_timestamp(col("w.start")).as("hour_sec"),
        col("events"), col("purchases"), col("revenue"))

    MemorySinkRunner.run(spark, agg, "graft_stream_user_hourly",
        shufflePartitions = 8, outputMode = "update", needNoDataBatch = false)
      .groupBy(col("user_id"), col("hour_sec"))
      .agg(max(struct(col("events"), col("purchases"), col("revenue"))).as("s"))
      .select(col("user_id"), col("hour_sec"), col("s.events").as("events"),
        col("s.purchases").as("purchases"), col("s.revenue").as("revenue"))
      .orderBy(col("user_id"), col("hour_sec"))
  }
}
