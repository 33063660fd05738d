package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.functions.Cols

/** Engine-side gap sessionization + per-session metrics.
  *
  * The reference keeps session state in the *producer* (sessions end by
  * escalating probability after 5 min, /root/reference/producer/producer.py:66-78)
  * and the engine just groups by the producer-assigned `session_id`
  * (/root/reference/processor/streaming_processor.py:172-195). The driver's
  * `events` table carries no session_id, so we derive sessions in-engine with
  * the standard event-time gap rule: a new session starts when the time since
  * the user's previous event exceeds `gapSeconds`.
  *
  * Scale notes:
  *  - One shuffle on `user_id`; the `lag` and the running `sum` share the same
  *    (partition, order) spec, so Catalyst plans a single Exchange + Sort and
  *    stacks both Window operators on it — verified via .explain("formatted").
  *  - Ordering key is `event_id` (globally monotone in event time in this data,
  *    and unique), making the whole derivation deterministic — no ties, no
  *    nondeterministic row_number. At 100 TB, per-user data fits trivially in a
  *    task (sessions are per-user streams); skew would only come from a single
  *    pathological user and is absorbed by AQE skew handling on the exchange.
  *  - For the streaming path use session_window / flatMapGroupsWithState
  *    (see graft.streaming); this batch operator exists for replay/backfill,
  *    which is how a 100 TB historical sessionization job would actually run.
  */
object Sessionize {
  val DefaultGapSeconds = 3600L

  /** Adds ts_sec, session_seq (1-based per user) and session_id columns.
    * Null user_ids are excluded: an unidentified event is not
    * sessionizable, and the engines disagree on what a null-keyed session
    * even is (Spark's `concat_ws` skips the null so all null-user rows
    * share ids like "1"; SQL's `||` nullifies the whole id) — the r12
    * data-shape fuzz sweep caught exactly this divergence. */
  def withSessionId(events: DataFrame, gapSeconds: Long = DefaultGapSeconds): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy("event_id")
    val cum    = byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // window-lane fan-out (Spread.byKey, no-op at scale): the per-user
    // window needs a hash(user_id) exchange anyway, but AQE's coalescing
    // sees only the small byte size and folds it to ONE partition on the
    // local SFs, serializing the sort+lag+cumsum lane of the whole session
    // family; the explicit exchange pins session parallelism and every
    // downstream per-user/per-session window rides it (hash(user_id)
    // satisfies any (user_id, …) clustering) with no second exchange
    Spread.byKey(events.where(col("user_id").isNotNull), col("user_id"))
      // requires the normalized `ts_sec` column (Tables.events)
      .withColumn("is_new",
        when(lag(col("ts_sec"), 1).over(byUser).isNull
          || col("ts_sec") - lag(col("ts_sec"), 1).over(byUser) > gapSeconds, 1L)
          .otherwise(0L))
      .withColumn("session_seq", sum(col("is_new")).over(cum))
      .withColumn("session_id", concat_ws("-", col("user_id"), col("session_seq")))
      .drop("is_new")
  }

  /** Gap-parameter sensitivity sweep — how many sessions would the gap
    * rule produce at each candidate threshold, answered in ONE scan: the
    * session count at gap g is `users + |inter-event deltas > g|` (every
    * user opens one session; each over-gap delta opens another), so a
    * single lag-window pass computes every candidate's break count as one
    * conditional sum and the per-gap rows explode from the single
    * aggregate row. The re-scan-per-parameter a naive sweep runs never
    * happens — the shape parameter tuning at 100 TB needs. Ordering
    * follows [[withSessionId]] (per-user event_id). */
  def gapSensitivity(events: DataFrame,
                     gaps: Seq[Long] = Seq(900L, 1800L, 3600L)): DataFrame = {
    require(gaps.nonEmpty)
    val byUser = Window.partitionBy("user_id").orderBy("event_id")
    val deltas = events.where(col("user_id").isNotNull)
      .withColumn("delta", col("ts_sec") - lag(col("ts_sec"), 1).over(byUser))
    val brkCols = gaps.map(g => Cols.countWhen(col("delta") > g).as(s"brk_$g"))
    val aggs = deltas.agg(countDistinct(col("user_id")).as("users"),
      count(lit(1)).as("events") +: brkCols: _*)
    val gapRows = array(gaps.map(g =>
      struct(lit(g).as("g"), col(s"brk_$g").as("b"))): _*)
    aggs.select(col("users"), col("events"), explode(gapRows).as("gb"))
      .select(col("gb.g").as("gap_seconds"), col("users"),
        (col("users") + col("gb.b")).as("sessions"), col("events"),
        Cols.avg4(col("events"), col("users") + col("gb.b"))
          .as("avg_events_per_session"))
      .orderBy(col("gap_seconds"))
  }

  /** Per-session metrics table — parity with analytics.user_sessions
    * (/root/reference/db/init.sql:22-36, computed at
    * streaming_processor.py:172-195): start/end, duration, funnel counts,
    * converted flag, revenue. Single aggregation after sessionization; the
    * groupBy keys are a superset of the window partition key, so no second
    * shuffle is needed for the user_id co-location (Spark still hashes on the
    * composite key; at scale, prefer grouping on (user_id, session_seq)). */
  def sessionMetrics(events: DataFrame, gapSeconds: Long = DefaultGapSeconds): DataFrame =
    withSessionId(events, gapSeconds)
      .groupBy(col("user_id"), col("session_id"))
      .agg(
        min(col("ts_sec")).as("start_sec"),
        max(col("ts_sec")).as("end_sec"),
        (max(col("ts_sec")) - min(col("ts_sec"))).cast("long").as("session_duration_seconds"),
        count(lit(1)).as("total_events"),
        Cols.countWhen(col("event_type") === "view").as("page_views"),
        Cols.countWhen(col("event_type") === "click").as("clicks"),
        Cols.countWhen(col("event_type") === "signup").as("signups"),
        Cols.countWhen(col("event_type") === "error").as("errors"),
        Cols.countWhen(col("event_type") === "purchase").as("purchases"),
        Cols.sumDec2When(col("event_type") === "purchase", col("value"))
          .as("total_purchase_amount"),
        (Cols.countWhen(col("event_type") === "purchase") > 0).as("converted"))

  /** Conversion rate by session-duration bucket — parity with the reference
    * notebook's pd.cut analysis (/root/reference/data_analysis.ipynb cell 4):
    * buckets 0-5 / 5-10 / 10-15 / 15-30 / 30+ minutes. */
  def conversionByDurationBucket(events: DataFrame, gapSeconds: Long = DefaultGapSeconds): DataFrame = {
    val mins = col("session_duration_seconds") / 60.0
    sessionMetrics(events, gapSeconds)
      .withColumn("duration_bucket",
        when(mins <= 5, "0-5min").when(mins <= 10, "5-10min")
          .when(mins <= 15, "10-15min").when(mins <= 30, "15-30min")
          .otherwise("30min+"))
      .groupBy(col("duration_bucket"))
      .agg(
        count(lit(1)).as("sessions"),
        Cols.countWhen(col("converted")).as("converted_sessions"),
        Cols.pct4(Cols.countWhen(col("converted")), count(lit(1))).as("conversion_rate"))
  }

  /** Per-day peak session concurrency — the capacity-planning sweep over
    * session intervals: +1 at each session start, −1 just after its end,
    * and the running sum of deltas in time order IS the live-session
    * count; the census reports each day's maximum and change-point count.
    *
    * Day-boundary semantics: concurrency is sampled at every change point
    * AND at each midnight in the observed span (a synthetic zero-delta row
    * per day boundary). Without the midnight sample, a session carried
    * across midnight understates the next day's peak (its first real event
    * may be a −1), and a day lying fully inside long-running sessions
    * emits no row at all. `change_points` counts only REAL change times
    * (a midnight that is also a session start/end still counts).
    *
    * Scale shape: the sweep's running sum is NOT a global window — it is
    * the bucketed two-stage prefix (per-time-bucket delta sums, one
    * global prefix over the bounded bucket frame, intra-bucket prefix
    * partitioned by bucket), the [[Relational.decilesByValue]] machinery
    * applied to the TIME axis. Endpoint collapse happens first, so the
    * windowed frame is bounded by distinct change times plus one row per
    * calendar day, never by session count. */
  def peakConcurrency(events: DataFrame, gapSeconds: Long = DefaultGapSeconds,
                      bucketSeconds: Long = 4096L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val sess = sessionMetrics(events, gapSeconds)
      .select(col("start_sec"), col("end_sec"))
      .localCheckpoint() // two consumers: the delta stream and the day span
    val raw = sess.select(col("start_sec").as("t"), lit(1L).as("d"), lit(1L).as("rl"))
      .unionAll(sess.select((col("end_sec") + 1L).as("t"), lit(-1L).as("d"), lit(1L).as("rl")))
    // one zero-delta sample per midnight in the span: bounded by the
    // calendar (the Markov |types| doctrine), so explode is a tiny frame
    val seeds = sess.agg(expr("min(start_sec) div 86400").as("d0"),
        expr("max(end_sec) div 86400").as("d1"))
      .select(explode(sequence(col("d0"), col("d1"))).as("day"))
      .select((col("day") * 86400L).as("t"), lit(0L).as("d"), lit(0L).as("rl"))
    val deltas = raw.unionAll(seeds)
      .groupBy(col("t")).agg(sum(col("d")).as("d"), sum(col("rl")).as("rl"))
      .withColumn("bkt", expr(s"t div $bucketSeconds"))
    val hist = deltas.groupBy(col("bkt")).agg(sum(col("d")).as("s"))
    val wPrev = Window.orderBy(col("bkt"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = hist.select(col("bkt"),
      coalesce(sum(col("s")).over(wPrev), lit(0L)).as("off"))
    val wB = Window.partitionBy(col("bkt")).orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    deltas.join(broadcast(offsets), Seq("bkt"))
      .select(col("t"), col("rl"), (col("off") + sum(col("d")).over(wB)).as("conc"))
      .groupBy((col("t") - pmod(col("t"), lit(86400L))).as("day_sec"))
      .agg(max(col("conc")).as("peak_concurrency"),
        Cols.countWhen(col("rl") > 0).as("change_points"))
      .orderBy(col("day_sec"))
  }
}
