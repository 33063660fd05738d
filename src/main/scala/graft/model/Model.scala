package graft.model

import org.apache.spark.sql.types._

/** Typed data contracts for the clickstream pipeline.
  *
  * Wire schema parity: /root/reference/processor/streaming_processor.py:53-64
  * declares the explicit 10-field event schema (event_id/user_id/event_type
  * non-null, rest nullable); /root/reference/producer/models.py:11-65 defines
  * the producer-side dataclass and its ISO-8601 JSON serialization. The
  * timestamp crosses the wire as a string and is repaired/coerced at parse
  * time (streaming_processor.py:118-127), so the case class keeps it as
  * String pre-parse and the parsed Dataset uses java.sql.Timestamp.
  */
case class ClickstreamEvent(
    event_id: String,
    user_id: String,
    event_type: String, // page_view | add_to_cart | purchase
    product_id: Option[String],
    purchase_amount: Option[java.math.BigDecimal],
    timestamp: Option[String], // ISO-8601 on the wire
    session_id: Option[String],
    page_url: Option[String],
    user_agent: Option[String],
    ip_address: Option[String])

/** Parsed + time-repaired event (post S2/P3). */
case class ParsedEvent(
    event_id: String,
    user_id: String,
    event_type: String,
    product_id: Option[String],
    purchase_amount: Option[java.math.BigDecimal],
    event_time: java.sql.Timestamp,
    session_id: Option[String],
    page_url: Option[String],
    user_agent: Option[String],
    ip_address: Option[String])

object Schemas {
  /** The explicit parse schema (streaming_processor.py:53-64): declared, not
    * inferred; from_json nulls non-conforming fields (permissive). */
  val event: StructType = StructType(Seq(
    StructField("event_id", StringType, nullable = false),
    StructField("user_id", StringType, nullable = false),
    StructField("event_type", StringType, nullable = false),
    StructField("product_id", StringType, nullable = true),
    StructField("purchase_amount", DecimalType(10, 2), nullable = true),
    StructField("timestamp", StringType, nullable = true),
    StructField("session_id", StringType, nullable = true),
    StructField("page_url", StringType, nullable = true),
    StructField("user_agent", StringType, nullable = true),
    StructField("ip_address", StringType, nullable = true)))

  /** The driver testdata events table (TESTDATA.md) with ts as raw nanos
    * (see graft.sources.Tables.events). */
  val genericEvent: StructType = StructType(Seq(
    StructField("event_id", LongType, nullable = true),
    StructField("ts", LongType, nullable = true),
    StructField("user_id", LongType, nullable = true),
    StructField("event_type", StringType, nullable = true),
    StructField("value", DoubleType, nullable = true),
    StructField("props", StringType, nullable = true)))
}
