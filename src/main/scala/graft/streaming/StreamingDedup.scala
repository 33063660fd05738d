package graft.streaming

import org.apache.spark.sql.DataFrame

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
}
