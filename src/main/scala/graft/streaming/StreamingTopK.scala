package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Streaming per-window top-k leaderboard (top users by event count per
  * tumbling hour) — the "trending now" shape of a live dashboard.
  *
  * Spark cannot rank inside a streaming aggregation (no window functions on
  * streaming frames), so the operator is split along the exactly-once
  * boundary Structured Streaming already provides:
  *  1. a watermarked streaming `groupBy(window, user)` count — state is one
  *     row per (open window, user), hash-partitioned (NO per-window hot
  *     key: the skew-prone "gather a whole window under one state key"
  *     design is exactly what this avoids), emitted exactly once per
  *     (window, user) when the watermark closes the window;
  *  2. a per-closed-window dense rank over the emitted counts — in
  *     production the cheap per-window downstream job over rows already
  *     reduced from event volume to |active users per window| (here: the
  *     batch post-processing of the capture, the StreamingDedup
  *     precedent).
  * Ties are deterministic: events DESC, then user_id ASC.
  *
  * Append-mode closure is the family contract: a window participates iff
  * its end ≤ final watermark (max event second − 600), the condition the
  * SQL oracle states. */
object StreamingTopK {
  val K = 5

  def hourlyTopUsers(spark: SparkSession, dir: String): DataFrame =
    hourlyTopUsersFrom(spark, StreamingHourly.stagedEventsDir(spark, dir), Map.empty)

  /** [[hourlyTopUsers]] over an explicit staged source + options — the
    * slicing-independence hook. */
  private[graft] def hourlyTopUsersFrom(spark: SparkSession, path: String,
                                        options: Map[String, String]): DataFrame = {
    val schema = StreamingHourly.stagedSchema(spark, path)
    val stream = spark.readStream.options(options).schema(schema).parquet(path)
      .where(col("user_id").isNotNull)
      .withColumn("ts_sec", graft.sources.Tables.tsSec(schema))
      .withColumn("event_time", timestamp_seconds(col("ts_sec")))

    val agg = stream
      .withWatermark("event_time", s"${StreamingHourly.WatermarkSeconds} seconds")
      .groupBy(window(col("event_time"), "1 hour").as("w"), col("user_id"))
      .agg(count(lit(1)).as("events"))
      .select(unix_timestamp(col("w.start")).as("hour_sec"),
        col("user_id"), col("events"))

    val closed = MemorySinkRunner.run(spark, agg, "graft_stream_topk",
      shufflePartitions = 8)
    val rw = Window.partitionBy(col("hour_sec"))
      .orderBy(col("events").desc, col("user_id").asc)
    closed.withColumn("rank", row_number().over(rw).cast("long"))
      .where(col("rank") <= K)
      .select(col("hour_sec"), col("rank"), col("user_id"), col("events"))
      .orderBy(col("hour_sec"), col("rank"))
  }
}
