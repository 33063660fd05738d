package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Watermarked stream-stream interval join (reference T-class semantics the
  * reference itself never reaches — its processor only does stream-static):
  * each purchase pairs with every view by the same user in the trailing
  * hour, as a REAL self-joined streaming query.
  *
  * Scale/state contract: both sides carry a watermark and the join condition
  * bounds event time on both sides, so the state store retains only the
  * trailing (interval + watermark) window per side — O(events/hour) state,
  * independent of stream length (Structured Streaming's watermarked
  * interval-join state eviction). An INNER interval join emits each pair
  * exactly when both rows have arrived; unlike append-mode aggregation no
  * watermark closure is needed for completeness, so the streamed result
  * equals the batch range join — the SQL-oracle condition.
  */
object StreamingJoin {
  val IntervalSeconds = 3600L

  /** Left-outer variant: unmatched purchases surface with null view columns
    * once the watermark proves no match can arrive (left-side state expiry).
    * The emission rule — verified empirically at all three scale factors —
    * is `p_sec < min(max purchase time, max view time) − 10 min`: the
    * global watermark is the MINIMUM of the two streams' watermarks, and
    * for this condition shape (`v_time <= p_time` binding) a left row is
    * finalizable as soon as the global watermark passes its own timestamp.
    * Purchases after that point still emit their inner matches but never a
    * null row. The SQL oracle states exactly this condition. */
  def purchaseViewPairsOuter(spark: SparkSession, dir: String): DataFrame =
    runJoin(spark, dir, "left_outer")

  def purchaseViewPairs(spark: SparkSession, dir: String): DataFrame =
    runJoin(spark, dir, "inner")

  /** Full-outer variant (T13 completed): BOTH unmatched sides surface with
    * nulls once their state can no longer match. The two expiry rules
    * differ because the interval binds them asymmetrically: a purchase
    * matches views in [p−1h, p], so it finalizes when the global watermark
    * passes `p_sec` (same as left-outer); a view matches purchases in
    * [v, v+1h], so it finalizes only when the watermark passes
    * `v_sec + 3600`. The SQL oracle states both conditions. */
  def purchaseViewPairsFull(spark: SparkSession, dir: String): DataFrame =
    runJoin(spark, dir, "full_outer")

  /** Chained stateful operators (Spark 3.4+ multi-stateful support): the
    * INNER interval join feeds a tumbling purchase-hour aggregation in the
    * SAME streaming query — two state stores, one plan, no intermediate
    * landing. Emission boundary determined empirically (see the oracle):
    * the join's output watermark is the global watermark minus the join's
    * max event-time range (1 h), so an hour window [w, w+3600) emits iff
    * w + 3600 ≤ min(max p, max v) − 600 − 3600. */
  def purchaseViewPairsHourly(spark: SparkSession, dir: String): DataFrame = {
    val joined = joinedPairs(spark, dir, "inner")
    val agg = joined
      .groupBy(window(col("p_time"), "1 hour").as("w"))
      .agg(count(lit(1)).as("pairs"),
        sum(col("p_sec") - col("v_sec")).as("lag_sec_sum"))
      .select(unix_timestamp(col("w.start")).as("hour_sec"),
        col("pairs"), col("lag_sec_sum"))
    MemorySinkRunner.run(spark, agg, "graft_stream_join_hourly", shufflePartitions = 2)
      .orderBy(col("hour_sec"))
  }

  /** Full-outer variant over explicit per-side staged sources + options
    * (the ScaleProbe hook — time-ordered per-side slices with
    * maxFilesPerTrigger). */
  private[graft] def purchaseViewPairsFullFrom(spark: SparkSession, pPath: String,
                                               vPath: String,
                                               options: Map[String, String]): DataFrame = {
    val joined = joinedPairsFrom(spark, pPath, vPath, "full_outer", options)
    MemorySinkRunner.run(spark, joined.drop("p_time"), "graft_stream_join_from",
        shufflePartitions = 2, needNoDataBatch = true)
      .orderBy(col("purchase_id").asc_nulls_last, col("view_id").asc_nulls_last)
  }

  /** Chained join→window-agg variant over explicit per-side sources +
    * options (ScaleProbe hook). */
  private[graft] def purchaseViewPairsHourlyFrom(spark: SparkSession, pPath: String,
                                                 vPath: String,
                                                 options: Map[String, String]): DataFrame = {
    val joined = joinedPairsFrom(spark, pPath, vPath, "inner", options)
    val agg = joined
      .groupBy(window(col("p_time"), "1 hour").as("w"))
      .agg(count(lit(1)).as("pairs"),
        sum(col("p_sec") - col("v_sec")).as("lag_sec_sum"))
      .select(unix_timestamp(col("w.start")).as("hour_sec"),
        col("pairs"), col("lag_sec_sum"))
    MemorySinkRunner.run(spark, agg, "graft_stream_join_hourly_from", shufflePartitions = 2)
      .orderBy(col("hour_sec"))
  }

  private def runJoin(spark: SparkSession, dir: String, joinType: String): DataFrame = {
    val joined = joinedPairs(spark, dir, joinType)
    // join output is a few hundred rows; state-store open/commit per
    // partition per side per micro-batch dominates, so keep partitions low
    // (r17 sweep at sf0.1, GRAFT_STREAM_PARTS 2/4/8: walls 2.00/2.19/2.36 s
    // outer, 2.85/2.94/3.70 s join_hourly; task time monotone in parts —
    // a stream-stream join keeps 4 state stores per partition, so each
    // partition is ~4 store open/commits per micro-batch).
    // Inner joins emit each pair as soon as both rows arrive, so the
    // watermark-advancing no-data batch adds nothing; LEFT OUTER emits its
    // null rows only on that batch and must keep it.
    // nulls-last on both keys: full-outer emits null purchase_id rows, and
    // the oracle engine's default ASC ordering puts nulls last
    MemorySinkRunner.run(spark, joined.drop("p_time"), "graft_stream_join",
        shufflePartitions = 2, needNoDataBatch = joinType != "inner")
      .orderBy(col("purchase_id").asc_nulls_last, col("view_id").asc_nulls_last)
  }

  private def joinedPairs(spark: SparkSession, dir: String, joinType: String): DataFrame =
    joinedPairsFrom(spark,
      StreamingHourly.stagedTypeDir(spark, dir, "purchase"),
      StreamingHourly.stagedTypeDir(spark, dir, "view"),
      joinType, Map.empty)

  private[graft] def joinedPairsFrom(spark: SparkSession, pPath: String, vPath: String,
                                     joinType: String,
                                     options: Map[String, String]): DataFrame = {
    // per-side staged slices (materialized predicate pushdown): each side
    // scans only its own event type instead of both sides decoding the
    // whole table — identical results, 40% of the scan volume. The
    // defensive `where` stays (it rides the parquet scan for free).
    def side(eventType: String): DataFrame = {
      val path   = if (eventType == "purchase") pPath else vPath
      val schema = StreamingHourly.stagedSchema(spark, path)
      spark.readStream.options(options).schema(schema).parquet(path)
        // null users excluded: stream-stream state is keyed by user, and
        // the engines' null-key outer-emission rules differ (the r12 fuzz
        // sweep caught the full-outer view lane under-emitting) — identified
        // users only, mirrored in every stream-join oracle
        .where(col("event_type") === eventType && col("user_id").isNotNull)
        .withColumn("ts_sec", graft.sources.Tables.tsSec(schema))
        .withColumn("event_time", timestamp_seconds(col("ts_sec")))
    }
    val purchases = side("purchase")
      .select(col("user_id").as("p_user"), col("event_id").as("purchase_id"),
        col("ts_sec").as("p_sec"), col("event_time").as("p_time"))
      .withWatermark("p_time", "600 seconds")
    val views = side("view")
      .select(col("user_id").as("v_user"), col("event_id").as("view_id"),
        col("ts_sec").as("v_sec"), col("event_time").as("v_time"))
      .withWatermark("v_time", "600 seconds")

    purchases.join(views,
        expr(s"""v_user = p_user
                |AND v_time >= p_time - INTERVAL $IntervalSeconds SECONDS
                |AND v_time <= p_time""".stripMargin),
        joinType)
      .select(coalesce(col("p_user"), col("v_user")).as("user_id"),
        col("purchase_id"), col("view_id"), col("p_sec"), col("v_sec"),
        col("p_time"))
  }
}
