package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.model.Schemas

/** Wire-format parsing for the clickstream pipeline (reference S2/P3/P4,
  * /root/reference/processor/streaming_processor.py:109-129).
  *
  * Works identically on a streaming or batch DataFrame of Kafka-shaped rows
  * (key/value binary or string + optional timestamp) — same Catalyst
  * semantics in both modes is the point of Structured Streaming, and it is
  * what makes every stage here unit-testable in batch.
  */
object Parse {

  /** from_json against the declared schema, flatten, repair the event time
    * (null/empty → processing clock), stamp processing_time.
    *
    * `fixedClock` pins the clock columns for deterministic tests/oracles
    * (reference uses current_timestamp(), :123-126 — kept as the default).
    */
  def parse(kafkaShaped: DataFrame, fixedClock: Option[java.sql.Timestamp] = None): DataFrame = {
    val nowExpr: Column = fixedClock.map(t => lit(t)).getOrElse(current_timestamp())
    kafkaShaped
      .select(
        from_json(col("value").cast("string"), Schemas.event).as("event"),
        col("timestamp").as("kafka_timestamp"))
      .select(col("event.*"), col("kafka_timestamp"))
      .withColumn("event_time",
        when(col("timestamp").isNotNull && col("timestamp") =!= "",
          to_timestamp(col("timestamp"))).otherwise(nowExpr))
      .withColumn("processing_time", nowExpr)
      .drop("timestamp")
  }

  /** Derived session columns (reference P4, :184-193): duration, converted. */
  def withSessionDerived(sessionAgg: DataFrame): DataFrame =
    sessionAgg
      .withColumn("session_duration_seconds",
        (unix_timestamp(col("end_time")) - unix_timestamp(col("start_time"))).cast("int"))
      .withColumn("converted", col("purchases") > 0)

  /** The reference's per-session aggregation (A1, :172-195) — update-mode
    * semantics, no watermark (reference parity; the bounded-state variant is
    * ClickstreamPipeline.sessionAggWatermarked). */
  def sessionAgg(parsed: DataFrame): DataFrame =
    withSessionDerived(
      parsed.groupBy(col("session_id"), col("user_id")).agg(
        min(col("event_time")).as("start_time"),
        max(col("event_time")).as("end_time"),
        count(lit(1)).as("total_events"),
        sum(when(col("event_type") === "page_view", 1L).otherwise(0L)).as("page_views"),
        sum(when(col("event_type") === "add_to_cart", 1L).otherwise(0L)).as("add_to_cart_events"),
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("purchases"),
        sum(when(col("event_type") === "purchase", col("purchase_amount"))
          .otherwise(lit(java.math.BigDecimal.ZERO)).cast("decimal(10,2)"))
          .cast("decimal(10,2)").as("total_purchase_amount")))

  /** The reference's watermarked 1-hour tumbling aggregation (T1/T2 +
    * A2/A3/A5/A9, :276-307). */
  def hourlyAgg(parsed: DataFrame, watermark: String = "10 minutes"): DataFrame = {
    val purchases = sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
    val views     = sum(when(col("event_type") === "page_view", 1L).otherwise(0L))
    parsed
      .withWatermark("event_time", watermark)
      .groupBy(window(col("event_time"), "1 hour").as("hour_window"))
      .agg(
        count(lit(1)).as("total_events"),
        approx_count_distinct(col("user_id")).as("unique_users"),
        views.as("page_views"),
        sum(when(col("event_type") === "add_to_cart", 1L).otherwise(0L)).as("cart_additions"),
        purchases.as("purchases"),
        sum(when(col("event_type") === "purchase", col("purchase_amount"))
          .otherwise(lit(java.math.BigDecimal.ZERO)).cast("decimal(12,2)"))
          .cast("decimal(12,2)").as("revenue"),
        when(views > 0, purchases.cast("double") * 100.0 / views.cast("double"))
          .otherwise(0.0).cast("decimal(5,2)").as("conversion_rate"))
      .select(col("hour_window.start").as("hour_timestamp"), col("*")).drop("hour_window")
  }

  /** Whole-batch dashboard KPIs (A6/A7/A10, :337-394) — pure-plan, no
    * driver collect (the reference's collect() is its scale ceiling). */
  def dashboardKpis(parsed: DataFrame): DataFrame = {
    val wide = parsed.agg(
      countDistinct(col("user_id")).cast("double").as("total_users"),
      countDistinct(col("session_id")).cast("double").as("total_sessions"),
      avg(when(col("event_type") === "purchase", 1.0).otherwise(0.0)).as("conv_frac"),
      sum(when(col("event_type") === "purchase", col("purchase_amount"))
        .otherwise(lit(java.math.BigDecimal.ZERO)))
        .cast("decimal(15,4)").cast("double").as("total_revenue"))
    wide.selectExpr(
      """stack(4,
         'total_users', total_users, 'Total Users',
         'total_sessions', total_sessions, 'Total Sessions',
         'conversion_rate', conv_frac * 100.0, 'Conversion Rate (%)',
         'total_revenue', total_revenue, 'Total Revenue'
         ) as (metric_key, metric_value, metric_label)""")
      .select(col("metric_key"),
        col("metric_value").cast("decimal(15,4)").as("metric_value"),
        col("metric_label"))
  }
}
