package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Streaming exact deduplication (north-star extension, SURVEY.md §7 step 8).
  *
  * Two modes over a parsed event stream:
  *  - [[byKeyUnbounded]]: `dropDuplicates(event_id)` — exact streaming dedup
  *    with state that grows with the key cardinality (reference-style
  *    unbounded state; fine for bounded replay windows).
  *  - [[byKeyWithinWatermark]]: `dropDuplicatesWithinWatermark` — state is
  *    evicted once the watermark passes an id's event time, which is the
  *    only mode that survives 100 TB/day: duplicates in real pipelines are
  *    retry/redelivery artifacts that arrive within minutes, not days.
  *
  * Batch callers get identical semantics from Dedup.exactDeduped /
  * dropDuplicates — same Catalyst operators, bounded input.
  */
object StreamingDedup {
  def byKeyUnbounded(stream: DataFrame, keys: Seq[String] = Seq("event_id")): DataFrame =
    stream.dropDuplicates(keys)

  def byKeyWithinWatermark(stream: DataFrame, eventTimeCol: String = "event_time",
                           delay: String = "10 minutes",
                           keys: Seq[String] = Seq("event_id")): DataFrame =
    stream.withWatermark(eventTimeCol, delay)
      .dropDuplicatesWithinWatermark(keys)

  /** Oracle-facing run: the events stream delivered TWICE (the same file
    * source consumed by two union branches — simulated at-least-once
    * redelivery), deduplicated by event_id within the watermark, then
    * profiled per event type on the captured output. Every duplicate is
    * suppressed by the watermark-bounded state, so the result equals the
    * plain batch census of the source — which is the SQL oracle. */
  def dedupedTypeCounts(spark: SparkSession, dir: String): DataFrame =
    dedupedTypeCountsFrom(spark, StreamingHourly.stagedEventsDir(spark, dir), Map.empty)

  /** [[dedupedTypeCounts]] over an explicit staged source + options (the
    * ScaleProbe / slicing-test hook, same pattern as the other families). */
  private[graft] def dedupedTypeCountsFrom(spark: SparkSession, path: String,
                                           options: Map[String, String]): DataFrame = {
    val schema = StreamingHourly.stagedSchema(spark, path)
    def src(): DataFrame = spark.readStream.options(options).schema(schema).parquet(path)
      .withColumn("event_time", timestamp_seconds(graft.sources.Tables.tsSec(schema)))
    val doubled = src().unionByName(src())
    val deduped = byKeyWithinWatermark(doubled, "event_time", "10 minutes")
      .select(col("event_id"), col("event_type"))
    // dedup passes first occurrences through in the data batch itself; the
    // no-data batch would only evict state we are about to discard
    MemorySinkRunner.run(spark, deduped, "graft_stream_dedup", shufflePartitions = 8,
        needNoDataBatch = false)
      // dedup state processes every row; only the census drops the null
      // type group (null-category doctrine, r14)
      .where(col("event_type").isNotNull)
      .groupBy(col("event_type")).agg(count(lit(1)).as("n_events"))
      .orderBy(col("event_type"))
  }
}
