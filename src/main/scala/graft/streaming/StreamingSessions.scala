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

  def closedSessions(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val path   = StreamingHourly.stagedEventsDir(dir)
    val schema = spark.read.parquet(path).schema
    val stream = spark.readStream.schema(schema).parquet(path)
      .withColumn("ts_sec", expr("ts div 1000000000"))
      .withColumn("event_time", timestamp_seconds(col("ts_sec")))

    val agg = stream
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

    MemorySinkRunner.run(spark, agg, "graft_stream_sessions", shufflePartitions = 8)
      .orderBy(col("user_id"), col("start_sec"))
  }
}
