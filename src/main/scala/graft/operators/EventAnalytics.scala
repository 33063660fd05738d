package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.functions.Cols

/** The reference's analytics surface, re-expressed over the driver's generic
  * event stream (event_id, ts, user_id, event_type ∈ {view, click, purchase,
  * signup, error}, value, props JSON).
  *
  * Mapping to the reference (SURVEY.md §2):
  *  - hourlyMetrics   ← analytics.hourly_metrics (T2 tumbling window + A2/A3/
  *                      A5/A9 aggregates, streaming_processor.py:276-307)
  *  - dashboardKpis   ← analytics.dashboard_metrics (A6/A7/A10 global agg,
  *                      streaming_processor.py:337-394)
  *  - eventTypeDistribution ← notebook cell 3 ratio-to-total (A11/W1)
  *  - topEntities     ← "top products" dashboard goal (W2) — the JSON props
  *                      key `k` plays the product-id role in this data
  *  - lastWindow      ← Grafana "events in last hour" panel (P5/T11), made
  *                      deterministic by anchoring to max(ts) instead of now()
  *
  * All aggregates use exact decimal / guarded-double arithmetic from
  * [[graft.functions.Cols]] so results are reproducible under AQE
  * re-partitioning and hash-comparable against an external oracle.
  */
object EventAnalytics {

  /** 1-hour tumbling-window metrics. In batch this is a plain groupBy on the
    * hour bucket — one shuffle, partial aggregation map-side (HashAggregate
    * partial → Exchange → HashAggregate final). Cardinality after agg is tiny
    * (one row per hour), so the shuffle carries only partial states.
    * `unique_users` is exact here (oracle-comparable); the HLL variant lives
    * in [[hourlyMetricsApprox]]. */
  def hourlyMetrics(events: DataFrame): DataFrame =
    events
      .groupBy(Cols.hourSec(col("ts_sec")).as("hour_sec"))
      .agg(
        count(lit(1)).as("total_events"),
        countDistinct(col("user_id")).as("unique_users"),
        Cols.countWhen(col("event_type") === "view").as("page_views"),
        Cols.countWhen(col("event_type") === "click").as("clicks"),
        Cols.countWhen(col("event_type") === "purchase").as("purchases"),
        Cols.countWhen(col("event_type") === "signup").as("signups"),
        Cols.countWhen(col("event_type") === "error").as("errors"),
        Cols.sumDec2When(col("event_type") === "purchase", col("value")).as("revenue"),
        Cols.pct4(
          Cols.countWhen(col("event_type") === "purchase"),
          Cols.countWhen(col("event_type") === "view")).as("conversion_rate"))

  /** Same shape but `unique_users` via HyperLogLog++ (reference A5,
    * streaming_processor.py:285 `approx_count_distinct`). This is the variant
    * you run at 100 TB: the exact distinct needs a second shuffle keyed on
    * (hour, user), HLL folds into the single partial-agg pass with O(1) state
    * per group. Not SQL-oracle-comparable (sketch internals differ per
    * engine), so verified by rows/bounds tests instead. */
  def hourlyMetricsApprox(events: DataFrame, rsd: Double = 0.05): DataFrame =
    events
      .groupBy(Cols.hourSec(col("ts_sec")).as("hour_sec"))
      .agg(
        count(lit(1)).as("total_events"),
        approx_count_distinct(col("user_id"), rsd).as("unique_users_approx"),
        Cols.countWhen(col("event_type") === "purchase").as("purchases"),
        Cols.sumDec2When(col("event_type") === "purchase", col("value")).as("revenue"))

  /** Trailing-window volume anomaly detection: each hour's event count
    * against the mean and σ of the PRECEDING `lookback` hours (exclusive
    * ROWS frame), flagging |z| ≥ `zMin`. The heavy count is the same
    * one-shuffle hourly groupBy as [[hourlyMetrics]]; the window then runs
    * over the hourly AGGREGATE — |hours| rows, not |events| — so the
    * global ordering is over a series bounded by the time range, the same
    * shape as the daily cumulative/delta queries.
    *
    * The hour axis is DENSIFIED over [first, last] observed hour before
    * the window: an hour with no events is the clearest volume anomaly (a
    * total outage) and must appear as cnt = 0, not as a missing row — and
    * densification also pins the ROWS frame to true calendar hours (a gap
    * would otherwise silently stretch "trailing 24 h" across arbitrary
    * time). Hours with fewer than `lookback` predecessors have no stable
    * baseline and are not judged. A deviation from a PERFECTLY FLAT
    * baseline (σ = 0, where z is undefined) is reported with sentinel
    * z = ±9999 — flatness is decided by the exact integer test, never
    * float equality.
    *
    * Determinism: the baseline lives in two exact integer window sums
    * (Σx, Σx²); lookback²·σ² = lookback·Σx² − (Σx)² stays in exact 64-bit
    * integers, and z is rendered by IEEE ops that are all correctly
    * rounded — sqrt, divides, subtraction (no log/pow, which differ
    * across math libraries) — then floor-quantized. */
  def hourlyAnomalies(events: DataFrame, lookback: Int = 24,
                      zMin: Double = 2.0): DataFrame = {
    val counted = events.groupBy(Cols.hourSec(col("ts_sec")).as("hour_sec"))
      .agg(count(lit(1)).as("cnt"))
    val axis = counted.agg(min(col("hour_sec")).as("lo"), max(col("hour_sec")).as("hi"))
      .select(explode(sequence(col("lo"), col("hi"), lit(3600L))).as("hour_sec"))
    val hourly = axis.join(counted, Seq("hour_sec"), "left")
      .select(col("hour_sec"), coalesce(col("cnt"), lit(0L)).as("cnt"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("hour_sec")).rowsBetween(-lookback, -1)
    // cnt is squared before summing: at 100-TB scale an hour can hold
    // >~3e9 events, where cnt*cnt overflows 64-bit longs (silent wrap, or
    // a throw under ANSI). decimal(38,0) keeps the sums exact up to 1e19
    // events/hour — same doctrine as the CC label sums.
    val cntDec = col("cnt").cast("decimal(38,0)")
    val base = hourly.select(col("hour_sec"), col("cnt"),
      count(lit(1)).over(w).as("n"),
      sum(cntDec).over(w).as("sx"),
      sum(cntDec * cntDec).over(w).as("sxx"))
    val varNum = lit(lookback.toLong).cast("decimal(38,0)") * col("sxx") -
      col("sx") * col("sx")
    val mean = col("sx").cast("double") / lookback.toDouble
    val z = when(varNum > 0,
        (col("cnt").cast("double") - mean) /
          (sqrt(varNum.cast("double")) / lookback.toDouble))
      .when(cntDec * lookback > col("sx"), lit(9999.0))
      .when(cntDec * lookback < col("sx"), lit(-9999.0))
      .otherwise(lit(0.0))
    base.where(col("n") === lookback)
      .select(col("hour_sec"), col("cnt"),
        Cols.q4(mean).as("baseline_mean"), Cols.q4(z).as("z"))
      .where(abs(col("z")) >= zMin)
      .orderBy(col("hour_sec"))
  }

  /** Robust sibling of [[hourlyAnomalies]]: outliers by median/MAD instead
    * of trailing mean/σ. One extreme hour inflates a mean-based σ and can
    * mask its neighbors (breakdown point 0); the median and the median
    * absolute deviation ignore up to half the hours being wild, which is
    * what traffic data looks like during an incident. robust_z =
    * |cnt − median| / MAD, flagged at `zMin` (≈ 3·MAD is the textbook
    * cut); MAD = 0 with a nonzero deviation gets the 9999 sentinel (same
    * convention as the trailing-z operator).
    *
    * Scale: both medians are exact interpolated percentiles over the
    * BOUNDED hourly aggregate (|hours| rows — the A11 posture), never the
    * event stream; the two 1-row results broadcast back. */
  def hourlyAnomaliesRobust(events: DataFrame, zMin: Double = 3.0): DataFrame = {
    val hours = events.groupBy(Cols.hourSec(col("ts_sec")).as("hour_sec"))
      .agg(count(lit(1)).as("cnt"))
    val med = hours.agg(percentile(col("cnt"), lit(0.5)).as("med"))
    val withDev = hours.crossJoin(broadcast(med))
      .withColumn("dev", abs(col("cnt").cast("double") - col("med")))
    val mad = withDev.agg(percentile(col("dev"), lit(0.5)).as("mad"))
    withDev.crossJoin(broadcast(mad))
      .withColumn("robust_z",
        when(col("mad") > 0.0, Cols.q4(col("dev") / col("mad")))
          .otherwise(when(col("dev") > 0.0, lit(9999.0)).otherwise(lit(0.0))))
      .where(col("robust_z") >= zMin)
      .select(col("hour_sec"), col("cnt"),
        Cols.q4(col("med")).as("median_cnt"), Cols.q4(col("mad")).as("mad"),
        col("robust_z"))
      .orderBy(col("hour_sec"))
  }

  /** Conversion-latency distribution: per user, seconds from FIRST view to
    * the first purchase at-or-after it, bucketed by ⌊log₂(delta+1)⌋ — the
    * "how long does intent take to convert" histogram. Log₂ buckets via
    * the integer bit-length trick (`length(bin(x)) − 1`, same doctrine as
    * the key-skew histogram: never a float log), so the output stays ≤ 64
    * rows no matter how many users exist — the scalable form of a latency
    * percentile (the exact-percentile equivalent would buffer a value per
    * user). delta = 0 (purchase in the same second as the first view)
    * lands in bucket 0.
    *
    * Shape: one hash agg to per-user (first view, first purchase-after)
    * via conditional mins — conditional-aggregation form, no window, no
    * join, two shuffles total (user, then bucket). */
  def conversionLatency(events: DataFrame): DataFrame = {
    val perUser = events
      .groupBy(col("user_id"))
      .agg(min(when(col("event_type") === "view", col("ts_sec"))).as("t_view"))
    val withPurchase = events
      .where(col("event_type") === "purchase")
      .join(perUser, Seq("user_id"))
      .where(col("ts_sec") >= col("t_view"))
      .groupBy(col("user_id"), col("t_view"))
      .agg(min(col("ts_sec")).as("t_purchase"))
    withPurchase
      .select((col("t_purchase") - col("t_view")).as("delta"))
      .groupBy((length(bin(col("delta") + 1)) - 1).cast("long").as("log2_bucket"))
      .agg(count(lit(1)).as("users"),
        min(col("delta")).as("min_sec"), max(col("delta")).as("max_sec"))
      .orderBy(col("log2_bucket"))
  }

  /** Global KPI table in the reference's tall (key, value, label) layout
    * (analytics.dashboard_metrics, db/init.sql:65-70). One whole-table
    * aggregation; emitting the tall shape is a driver-free explode of the
    * single result row — no collect(), unlike the reference's
    * streaming_processor.py:348 (its driver-side collect is the part that
    * cannot survive 100 TB; this formulation runs entirely as a plan). */
  def dashboardKpis(events: DataFrame): DataFrame = {
    val wide = events.agg(
      countDistinct(col("user_id")).cast("double").as("total_users"),
      count(lit(1)).cast("double").as("total_events"),
      Cols.countWhen(col("event_type") === "purchase").cast("double").as("purchases"),
      Cols.countWhen(col("event_type") === "view").cast("double").as("page_views"),
      Cols.sumDec2When(col("event_type") === "purchase", col("value"))
        .cast("double").as("total_revenue"))
    // raw doubles here; the single floor-quantization happens on metric_value
    // at the end (double round()s would not be oracle-deterministic)
    val kpis = wide.select(
      col("total_users"), col("total_events"), col("total_revenue"),
      when(col("page_views") > 0,
        col("purchases") * 100.0 / col("page_views")).otherwise(0.0)
        .as("conversion_rate"),
      when(col("purchases") > 0,
        col("total_revenue") / col("purchases")).otherwise(0.0)
        .as("avg_purchase_value"))
    // tall layout: stack(k, v) pairs, value as fixed decimal
    kpis.selectExpr(
      """stack(5,
         'total_users', total_users, 'Total Users',
         'total_events', total_events, 'Total Events',
         'total_revenue', total_revenue, 'Total Revenue',
         'conversion_rate', conversion_rate, 'Conversion Rate (%)',
         'avg_purchase_value', avg_purchase_value, 'Avg Purchase Value'
         ) as (metric_key, metric_value, metric_label)""")
      .select(col("metric_key"),
        Cols.q4(col("metric_value")).as("metric_value"),
        col("metric_label"))
  }

  /** Event-type distribution with ratio-to-total (reference notebook cell 3:
    * COUNT(*)*100.0/SUM(COUNT(*)) OVER ()). The empty-frame window is a
    * single-partition exchange over the *aggregated* rows (5 rows), so the
    * plan is: shuffle-agg by type → tiny broadcast-sized window. Fine at any
    * scale because the window input is |distinct types|. */
  def eventTypeDistribution(events: DataFrame): DataFrame = {
    // null-category doctrine (r14, the nulls-fuzz event_type extension):
    // the distribution is over KNOWN types, and a null group would also
    // hash-diverge on engine null-sort order
    val counts = events.where(col("event_type").isNotNull)
      .groupBy(col("event_type")).agg(count(lit(1)).as("cnt"))
    counts.select(
      col("event_type"), col("cnt"),
      Cols.pct4(col("cnt"), sum(col("cnt")).over(Window.partitionBy())).as("pct_of_total"))
  }

  /** Top-N entities by revenue — the `k` field of the JSON props column plays
    * the product-id role (reference W2 "top products"). JSON extraction stays
    * inside codegen (`get_json_object`); at 100 TB you would hoist `k` into a
    * real column at ingest, which is what [[withParsedProps]] models. */
  def topEntities(events: DataFrame, n: Int = 10): DataFrame =
    withParsedProps(events)
      .where(col("event_type") === "purchase" && col("k").isNotNull)
      .groupBy(col("k"))
      .agg(
        count(lit(1)).as("purchases"),
        Cols.sumDec2(col("value")).as("revenue"))
      .orderBy(col("revenue").desc, col("k").asc)
      .limit(n)

  /** Per-purchase trailing-window context: how many views/clicks the user
    * made in the hour up to (and including) the purchase second. A range
    * join (`v.ts BETWEEN p.ts - 3600 AND p.ts`) would plan as a nested-loop
    * at scale; expressed as a RANGE window frame it is one shuffle on
    * user_id + one per-partition sort — the same trick as the as-of
    * composition, and the scalable form of interval joins whose bound is a
    * constant. */
  def purchaseContext(events: DataFrame, windowSeconds: Long = 3600): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts_sec"))
      .rangeBetween(-windowSeconds, 0)
    events
      .withColumn("views_last_hour",
        Cols.countWhen(col("event_type") === "view").over(w))
      .withColumn("clicks_last_hour",
        Cols.countWhen(col("event_type") === "click").over(w))
      .where(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id"), col("ts_sec"),
        col("views_last_hour"), col("clicks_last_hour"))
      .orderBy(col("event_id"))
  }

  /** SCD2-style change capture over the event stream: collapse each user's
    * event sequence to the rows where `event_type` CHANGES, each carrying a
    * half-open validity interval [valid_from_sec, valid_to_sec) and a
    * per-user version number — the slowly-changing-dimension (type 2)
    * history table a warehouse builds from a mutation feed, derived here
    * from the reference's event stream (the dimension being tracked is the
    * user's current activity type). The final state of every user is held
    * open with the 9_999_999_999 sentinel (year 2286) instead of NULL:
    * downstream BETWEEN probes need a closed predicate, and cross-engine
    * compare treats a sentinel long identically everywhere while NULL longs
    * round-trip differently through column stores.
    *
    * Shape: two windows over the SAME (user_id → ts_sec, event_id) hash
    * partition + sort — Catalyst collapses them into one exchange and one
    * sort, so the whole history build is one shuffle, linear in events, no
    * join, no state. Ties on ts_sec order by event_id: a total order, so
    * versions are deterministic. */
  def changeIntervals(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts_sec"), col("event_id"))
    events
      .where(col("user_id").isNotNull) // per-entity history needs an entity key
      .select(col("user_id"), col("event_id"), col("event_type"), col("ts_sec"))
      .withColumn("__prev", lag(col("event_type"), 1).over(w))
      .where(col("__prev").isNull || col("__prev") =!= col("event_type"))
      .withColumn("valid_to_sec",
        coalesce(lead(col("ts_sec"), 1).over(w), lit(9999999999L)))
      .withColumn("version", row_number().over(w).cast("long"))
      .select(col("user_id"), col("event_id"), col("event_type"),
        col("ts_sec").as("valid_from_sec"), col("valid_to_sec"), col("version"))
      .orderBy(col("user_id"), col("version"))
  }

  /** First-order Markov transition census over each user's event stream:
    * count (prev_type → next_type) bigrams along the per-user
    * (ts_sec, event_id) total order, then the row-conditional transition
    * probability P(next | prev) as a floor-quantized percentage. The
    * behavioral-model / next-event-prediction baseline.
    *
    * Shape: one user window for the lag (the sessionization exchange
    * shape), one hash agg to the bounded |types|² matrix; the probability
    * window runs over that bounded aggregate, never the event stream. */
  def typeTransitions(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts_sec"), col("event_id"))
    val rowW = Window.partitionBy(col("prev_type"))
    // null-category doctrine (r14): untyped events are dropped BEFORE the
    // lag, so the chain skips them rather than emitting null-typed states
    events.where(col("event_type").isNotNull)
      .withColumn("prev_type", lag(col("event_type"), 1).over(w))
      .where(col("prev_type").isNotNull)
      .groupBy(col("prev_type"), col("event_type").as("next_type"))
      .agg(count(lit(1)).as("transitions"))
      .withColumn("transition_pct",
        Cols.pct4(col("transitions"), sum(col("transitions")).over(rowW)))
      .orderBy(col("prev_type"), col("next_type"))
  }

  /** Last-known-value carry-forward: enrich every event with the value of
    * the user's most recent purchase at or before it — the forward-fill /
    * LKV repair step event pipelines run before attribution joins (the
    * batch analogue of the reference's conditional null-repair, P3,
    * streaming_processor.py:109-115, generalized from "repair this row"
    * to "carry the last known state"). Events before the user's first
    * purchase keep NULL: fabricating a value would be a correctness bug.
    *
    * Shape: one window per user (hash-partitioned on user_id, per-partition
    * sort on (ts_sec, event_id) — a total order, so the fill is
    * deterministic), `last(..., ignoreNulls)` over an unbounded-preceding
    * row frame. Linear in events, one shuffle, no join. */
  def lastKnownValueFill(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts_sec"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events.withColumn("last_purchase_value",
      last(when(col("event_type") === "purchase", col("value")), ignoreNulls = true).over(w))
  }

  /** Oracle-facing census of the fill: per event type, how many events
    * carry a known value and the exact integer-cent mass carried
    * (⌊v·100⌋ — floored in double space, summed as longs, so the total is
    * partition-order independent and engine-portable). */
  def lastKnownValueProfile(events: DataFrame): DataFrame =
    lastKnownValueFill(events)
      // the FILL runs over every event; only the census keys drop the null
      // type group (null-category doctrine, r14)
      .where(col("event_type").isNotNull)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        Cols.countWhen(col("last_purchase_value").isNotNull).as("with_carry"),
        sum(when(col("last_purchase_value").isNotNull,
          floor(col("last_purchase_value") * 100.0).cast("long")).otherwise(0L))
          .as("carry_cents"))
      .orderBy(col("event_type"))

  /** Parse the JSON props payload against a fixed contract (reference S2:
    * from_json with explicit schema, streaming_processor.py:109-115). */
  def withParsedProps(events: DataFrame): DataFrame =
    events.withColumn("k", get_json_object(col("props"), "$.k").cast("int"))

  /** Skip-gram co-occurrence counts over per-user event streams: for each
    * event, pair its entity id (`props.k`) with the ids of the previous
    * `windowSize` events of the same user, unordered-normalized
    * (a ≤ b), and count each pair — the corpus statistic item2vec / SGNS
    * embedding training consumes, and the batch form of "what co-occurs in
    * a session".
    *
    * Shape: `windowSize` `lag` columns over ONE user-partitioned window
    * (single shuffle + per-partition sort, shared by all lags — Catalyst
    * collapses same-spec windows), exploded pairs go straight into a hash
    * aggregate with map-side combine, so the shuffle after the window is
    * |distinct pairs| per partition, bounded by the entity vocabulary —
    * never a self-join of events against events. */
  /** Directed entity-transition graph over per-user event streams: one
    * edge (previous entity → this entity) per consecutive event pair of
    * the same user, weight = transition count. The ORDER-PRESERVING
    * sibling of [[cooccurrenceCounts]] (which unordered-normalizes): the
    * direction is what [[GraphRank.hitsScores]] needs to separate hub
    * entities (gateways users leave FROM) from authorities (destinations
    * users arrive AT). Same total order (ts_sec, event_id) per user, one
    * lag over ONE user-partitioned window, straight into a hash aggregate
    * bounded by the entity vocabulary squared. Self-transitions (k → k)
    * are kept — they are real dwell signal and HITS handles them. */
  def entityTransitions(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts_sec"), col("event_id"))
    withParsedProps(events)
      .withColumn("__prev", lag(col("k"), 1).over(w))
      .where(col("k").isNotNull && col("__prev").isNotNull)
      .select(col("__prev").cast("long").as("src"), col("k").cast("long").as("dst"))
      .groupBy(col("src"), col("dst"))
      .agg(count(lit(1)).as("w"))
  }

  def cooccurrenceCounts(events: DataFrame, windowSize: Int = 2): DataFrame = {
    require(windowSize >= 1, s"windowSize must be >= 1, got $windowSize")
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts_sec"), col("event_id"))
    val lagged = (1 to windowSize).foldLeft(withParsedProps(events)) { (df, i) =>
      df.withColumn(s"__lag$i", lag(col("k"), i).over(w))
    }
    val pairCols = (1 to windowSize).map(i => array(col("k"), col(s"__lag$i")))
    lagged
      .select(explode(array(pairCols: _*)).as("p"))
      .where(!array_contains(transform(col("p"), x => x.isNull), true))
      .select(least(col("p")(0), col("p")(1)).cast("long").as("item_a"),
        greatest(col("p")(0), col("p")(1)).cast("long").as("item_b"))
      .groupBy(col("item_a"), col("item_b"))
      .agg(count(lit(1)).as("pairs"))
      .orderBy(col("item_a"), col("item_b"))
  }

  /** Day-over-day retention: of the users active on day d, the fraction
    * also active on day d+1 — the canonical cohort health metric. Shape:
    * one distinct over (user, day) — a single shuffle with map-side
    * combine — then an equi-join of that small table against its own
    * next-day shift (never a cross join; the join key is (user, day+1)),
    * and a per-day aggregate. At 100 TB the distinct is the only pass over
    * raw events; everything after runs on |users|·|days| rows. */
  def dailyRetention(events: DataFrame): DataFrame = {
    val active = events
      .select(col("user_id"), (col("ts_sec") - pmod(col("ts_sec"), lit(86400L))).as("day_sec"))
      .distinct()
      .localCheckpoint() // referenced by both sides of the shift join
    val next = active.select(col("user_id"), (col("day_sec") - 86400L).as("day_sec"))
    active.join(next, Seq("user_id", "day_sec"), "left_semi")
      .groupBy(col("day_sec")).agg(count(lit(1)).as("retained"))
      .join(active.groupBy(col("day_sec")).agg(count(lit(1)).as("active")), Seq("day_sec"))
      .select(col("day_sec"), col("active"), col("retained"),
        Cols.pct4(col("retained"), col("active")).as("retention_pct"))
      .orderBy(col("day_sec"))
  }

  /** Sliding distinct count — trailing-`windowDays` active users per
    * observed day (the "7-day active users" dashboard series), EXACT and
    * distributed. Distinct users aren't summable across days, so the
    * windowed count cannot ride a running-sum window; the scale-correct
    * identity is coverage replication: collapse raw events to distinct
    * (user, day) FIRST (the one pass over raw data), replicate each pair
    * to the ≤ `windowDays` window-END days it covers, distinct again
    * (adjacent active days cover overlapping ends), keep only observed end
    * days, and count. Everything after the first distinct runs on
    * |users|·|days|·windowDays rows, independent of event volume; no
    * window function, no self-join over the event table. */
  def slidingActiveUsers(events: DataFrame, windowDays: Int = 7): DataFrame = {
    val userDays = events
      .where(col("user_id").isNotNull) // DAU counts identified users (the
      // oracle's count(DISTINCT user_id) skips nulls; the engine must too)
      .select(col("user_id"), (col("ts_sec") - pmod(col("ts_sec"), lit(86400L))).as("day_sec"))
      .distinct()
      .localCheckpoint() // feeds both the coverage explode and the day list
    val days = userDays.select(col("day_sec")).distinct()
    userDays
      .select(col("user_id"),
        explode(sequence(lit(0), lit(windowDays - 1))).as("k"), col("day_sec"))
      .select(col("user_id"), (col("day_sec") + col("k") * 86400L).as("day_sec"))
      .distinct()
      .join(days, Seq("day_sec"), "left_semi")
      .groupBy(col("day_sec"))
      .agg(count(lit(1)).as("active_users"))
      .orderBy(col("day_sec"))
  }

  /** Session funnel: how far each gap-rule session progressed along
    * view → click → purchase IN TIME ORDER — each stage's time is the
    * earliest event of its type AT OR AFTER the previous stage's time
    * (a click before the first view does not count, but a later click
    * rescues the session; the naive global-min formulation undercounts
    * exactly that case). Three stacked window minima over ONE session
    * partitioning — a single shuffle, no joins; a null stage time
    * propagates through the ≥ comparison so each count requires the full
    * ordered chain. */
  def sessionFunnel(events: DataFrame, gapSeconds: Long = Sessionize.DefaultGapSeconds): DataFrame = {
    val sw = Window.partitionBy(col("user_id"), col("session_id"))
    val staged = Sessionize.withSessionId(events, gapSeconds)
      .withColumn("t_view",
        min(when(col("event_type") === "view", col("ts_sec"))).over(sw))
      .withColumn("t_click",
        min(when(col("event_type") === "click" && col("ts_sec") >= col("t_view"),
          col("ts_sec"))).over(sw))
      .withColumn("t_purchase",
        min(when(col("event_type") === "purchase" && col("ts_sec") >= col("t_click"),
          col("ts_sec"))).over(sw))
      .select(col("user_id"), col("session_id"),
        col("t_view"), col("t_click"), col("t_purchase"))
      .distinct()
    staged.agg(
      count(lit(1)).as("sessions"),
      Cols.countWhen(col("t_view").isNotNull).as("reached_view"),
      Cols.countWhen(col("t_click").isNotNull).as("reached_click"),
      Cols.countWhen(col("t_purchase").isNotNull).as("reached_purchase"))
  }

  /** Out-of-orderness / lateness census — the streaming-observability
    * number behind every watermark choice: for each event, how far behind
    * the furthest event time ALREADY SEEN on its key's arrival order
    * (monotone event_id = the generator's emit order) did it arrive?
    * Reported as a bounded ⌊log₂⌋ histogram of lateness seconds plus the
    * count a `watermarkSeconds` watermark would have dropped — the audit
    * that justifies (or indicts) the engine's 600 s setting.
    *
    * Per-key running max on the session exchange (the SCD2 single-exchange
    * shape — no global window); the census is ≤ 64 rows at any volume. */
  def latenessCensus(events: DataFrame, watermarkSeconds: Long = 600): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events
      .withColumn("late", greatest(max(col("ts_sec")).over(w) - col("ts_sec"), lit(0L)))
      .select(when(col("late") === 0, lit(0L))
        .otherwise(length(bin(col("late"))).cast("long")).as("log2_bucket"), col("late"))
      .groupBy(col("log2_bucket"))
      .agg(count(lit(1)).as("n_events"), max(col("late")).as("max_lateness"),
        Cols.countWhen(col("late") > watermarkSeconds).as("beyond_watermark"))
      .orderBy(col("log2_bucket"))
  }

  /** Weekly cohort retention matrix — the classic product-analytics
    * triangle: users grouped by first-seen week, each later week's
    * still-active count as an offset column. Extends [[dailyRetention]]'s
    * day-over-day pair to the full cohort × offset grid.
    *
    * Scale shape: activity collapses to distinct (user, week) first (one
    * hash agg, bounded by users × weeks), cohorts are a per-user min (one
    * agg), and the matrix is one join back + one bounded aggregation —
    * output is |weeks|² rows at any event volume. All integer arithmetic;
    * the retention percentage is the shared pct4 IEEE sequence. */
  def cohortRetention(events: DataFrame): DataFrame = {
    val active = events
      .select(col("user_id"), expr("ts_sec DIV 604800").as("week"))
      .distinct()
      .localCheckpoint() // three consumers: cohorts, sizes, the matrix join
    val cohorts = active.groupBy(col("user_id")).agg(min(col("week")).as("cohort_week"))
    val sizes = cohorts.groupBy(col("cohort_week")).agg(count(lit(1)).as("cohort_users"))
    active.join(cohorts, Seq("user_id"))
      .groupBy(col("cohort_week"), (col("week") - col("cohort_week")).as("week_offset"))
      .agg(count(lit(1)).as("active_users")) // (user, week) already distinct
      .join(sizes, Seq("cohort_week"))
      .select(col("cohort_week"), col("week_offset"), col("active_users"),
        col("cohort_users"),
        Cols.pct4(col("active_users"), col("cohort_users")).as("retention_pct"))
      .orderBy(col("cohort_week"), col("week_offset"))
  }

  /** Time-constrained conversion funnel: first view → first click within
    * `stepSeconds` of it → first purchase within `stepSeconds` of THAT —
    * the marketing-attribution variant of [[sessionFunnel]] where each step
    * must happen inside a bounded window of the previous one (an eventual
    * click hours later is not funnel progress). Same single-exchange
    * stacked-window-minima shape, partitioned per user; the exact
    * view→purchase latency mass rides along as an integer sum. */
  def timedFunnel(events: DataFrame, stepSeconds: Long = 3600): DataFrame = {
    val uw = Window.partitionBy(col("user_id"))
    val staged = events
      .withColumn("t_view",
        min(when(col("event_type") === "view", col("ts_sec"))).over(uw))
      .withColumn("t_click",
        min(when(col("event_type") === "click"
          && col("ts_sec") >= col("t_view")
          && col("ts_sec") <= col("t_view") + stepSeconds, col("ts_sec"))).over(uw))
      .withColumn("t_purchase",
        min(when(col("event_type") === "purchase"
          && col("ts_sec") >= col("t_click")
          && col("ts_sec") <= col("t_click") + stepSeconds, col("ts_sec"))).over(uw))
      .select(col("user_id"), col("t_view"), col("t_click"), col("t_purchase"))
      .distinct()
    staged.agg(
      count(lit(1)).as("users"),
      Cols.countWhen(col("t_view").isNotNull).as("reached_view"),
      Cols.countWhen(col("t_click").isNotNull).as("reached_click"),
      Cols.countWhen(col("t_purchase").isNotNull).as("reached_purchase"),
      sum(when(col("t_purchase").isNotNull, col("t_purchase") - col("t_view"))
        .otherwise(0L)).as("conversion_lag_sum"))
  }

  /** Frequent session paths: the top-k event-type TRIGRAMS along each
    * gap-rule session's event order — the order-3 sibling of
    * [[typeTransitions]]' bigram matrix, scoped to sessions so a path
    * never spans a session boundary. Two lags on the session exchange
    * (no extra shuffle beyond the sessionization window), one
    * map-side-combinable count, bounded top-k heap. */
  def sessionPaths(events: DataFrame, k: Int = 20,
                   gapSeconds: Long = Sessionize.DefaultGapSeconds): DataFrame = {
    val sw = Window.partitionBy(col("user_id"), col("session_id")).orderBy(col("event_id"))
    Sessionize.withSessionId(events, gapSeconds)
      .withColumn("t2", lag(col("event_type"), 1).over(sw))
      .withColumn("t3", lag(col("event_type"), 2).over(sw))
      .where(col("t3").isNotNull)
      .select(concat_ws(">", col("t3"), col("t2"), col("event_type")).as("path"))
      .groupBy(col("path")).agg(count(lit(1)).as("occurrences"))
      .orderBy(col("occurrences").desc, col("path").asc)
      .limit(k)
  }

  /** First/last event per user (reference A8 `first(col)` intent,
    * streaming_processor.py:382-383, made deterministic: min_by/max_by on
    * the monotone event_id instead of order-dependent first()). */
  def firstLastPerUser(events: DataFrame): DataFrame =
    // identified users only; typed events only (null-category doctrine,
    // r14 — DuckDB's arg_min/arg_max SKIP null values while Spark's
    // min_by/max_by return them, so a null-typed endpoint hash-diverges)
    events.where(col("user_id").isNotNull && col("event_type").isNotNull)
      .groupBy(col("user_id"))
      .agg(
        min_by(col("event_type"), col("event_id")).as("first_event_type"),
        max_by(col("event_type"), col("event_id")).as("last_event_type"),
        min(col("event_id")).as("first_event_id"),
        max(col("event_id")).as("last_event_id"),
        count(lit(1)).as("events"))

  /** Purchased-entity baskets per user (reference §2.9 `collect_list` intent
    * — cart reconstruction): sorted id list as a canonical string so the
    * result is order-insensitive and oracle-comparable. */
  def purchaseBaskets(events: DataFrame): DataFrame =
    withParsedProps(events)
      .where(col("event_type") === "purchase" && col("k").isNotNull
        && col("user_id").isNotNull)
      .groupBy(col("user_id"))
      .agg(
        count(lit(1)).as("purchases"),
        Cols.sumDec2(col("value")).as("revenue"),
        concat_ws(",", transform(array_sort(collect_list(col("k"))),
          x => x.cast("string"))).as("basket"))

  /** Association rules over purchased-item baskets (a user's distinct
    * `props.k` purchases): every ordered item pair (a → b) with joint
    * basket count ≥ `minSupport`, scored by the classic trio — support
    * (share of baskets containing both), confidence (share of a's baskets
    * that also hold b), lift (observed/expected joint frequency). All
    * three are integer-count ratios with one floor-quantized divide each.
    *
    * Scale shape: baskets are distinct (user, item) rows; the A-PRIORI
    * property prunes BEFORE the pair join — `n_ab ≥ s` implies both items
    * appear in ≥ s baskets, so items below `minSupport` are semi-joined
    * away first (on real skew this is the difference between joining the
    * catalog and joining its frequent head). The pair self-join shuffles
    * on user_id; pair volume is Σ|basket|² — bounded by the per-user
    * purchase count, not the corpus. Item-count frames are
    * catalog-bounded and broadcast. */
  def associationRules(events: DataFrame, minSupport: Long = 5): DataFrame = {
    // JSON-parse fan-out + basket-keyed layout (Spread.byKey, no-op at
    // scale): the parse lane otherwise runs on the one-row-group scan
    // task, and hashing on user_id up front co-partitions the pair
    // self-join below on its join key
    val items = Spread.byKey(withParsedProps(events), col("user_id"))
      .where(col("event_type") === "purchase" && col("k").isNotNull
        && col("user_id").isNotNull)
      .select(col("user_id"), col("k").cast("long").as("item"))
      .distinct()
    val nBaskets = items.agg(countDistinct(col("user_id")).as("n_baskets"))
    val itemCnt = items.groupBy(col("item")).agg(count(lit(1)).as("n_item"))
    val frequent = itemCnt.where(col("n_item") >= minSupport).select(col("item"))
    val pruned = items.join(broadcast(frequent), Seq("item"), "left_semi")
    val pairs = pruned.select(col("item").as("a"), col("user_id"))
      .join(pruned.select(col("item").as("b"), col("user_id")), Seq("user_id"))
      .where(col("a") =!= col("b"))
      .groupBy(col("a"), col("b")).agg(count(lit(1)).as("n_ab"))
      .where(col("n_ab") >= minSupport)
    pairs
      .join(broadcast(itemCnt.toDF("a", "n_a")), Seq("a"))
      .join(broadcast(itemCnt.toDF("b", "n_b")), Seq("b"))
      .crossJoin(broadcast(nBaskets))
      .select(col("a"), col("b"), col("n_ab"),
        Cols.pct4(col("n_ab"), col("n_baskets")).as("support_pct"),
        Cols.pct4(col("n_ab"), col("n_a")).as("confidence_pct"),
        Cols.q4((col("n_ab") * col("n_baskets")).cast("double")
          / (col("n_a") * col("n_b")).cast("double")).as("lift"))
      .orderBy(col("a"), col("b"))
  }

  /** Events in the trailing window, anchored at max(ts) for determinism
    * (Grafana panel uses NOW() - INTERVAL '1 hour',
    * ecommerce-dashboard.json:18). The scalar max is computed as a subquery
    * joined by cross-broadcast — no driver collect. */
  def lastWindowCounts(events: DataFrame, windowSeconds: Long = 86400): DataFrame = {
    // null-category doctrine (r14): typed events only — the anchor too, so
    // both lanes window off the same filtered stream
    val typed = events.where(col("event_type").isNotNull)
    val anchor = typed.agg(max(col("ts_sec")).as("anchor_sec"))
    typed
      .join(broadcast(anchor))
      .where(col("ts_sec") > col("anchor_sec") - windowSeconds)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("cnt"), Cols.sumDec2(col("value")).as("total_value"))
  }

  /** Per-arm reach funnel — the experiment readout of the funnel family:
    * for each hash arm, how many users reached each stage (any view / any
    * click / any purchase) and the stage-to-stage conversion percentages.
    * Reach (not time-ordered) is deliberate here: the arm comparison
    * wants "did the treatment move the share of users who ever click?",
    * and the time-ordered depth lives in [[sessionFunnel]]. One hash agg
    * to the user frame, one to the 2-row arm frame. */
  def funnelByArm(events: DataFrame): DataFrame = {
    val users = events.where(col("user_id").isNotNull)
      .groupBy(col("user_id"))
      .agg(Cols.countWhen(col("event_type") === "view").as("v"),
        Cols.countWhen(col("event_type") === "click").as("c"),
        Cols.countWhen(col("event_type") === "purchase").as("p"))
      .select(
        (Dedup.PortableHash(concat(lit("ab:"), col("user_id").cast("string"))) % 2)
          .as("arm"),
        when(col("v") > 0, 1L).otherwise(0L).as("viewed"),
        when(col("c") > 0, 1L).otherwise(0L).as("clicked"),
        when(col("p") > 0, 1L).otherwise(0L).as("purchased"))
    users.groupBy(col("arm"))
      .agg(count(lit(1)).as("users"), sum(col("viewed")).as("viewed"),
        sum(col("clicked")).as("clicked"), sum(col("purchased")).as("purchased"))
      .select(col("arm"), col("users"), col("viewed"), col("clicked"),
        col("purchased"),
        Cols.pct4(col("clicked"), col("viewed")).as("view_to_click_pct"),
        Cols.pct4(col("purchased"), col("clicked")).as("click_to_purchase_pct"))
      .orderBy(col("arm"))
  }

  /** DAU/WAU stickiness — per day, 1-day actives over trailing-7-day
    * actives, the classic engagement-intensity ratio. Both lanes are
    * [[slidingActiveUsers]]' coverage-replication distinct counts
    * (window-free at any scale); the ratio is one division on the
    * calendar-bounded day frame. */
  def stickiness(events: DataFrame, windowDays: Int = 7): DataFrame = {
    val dau = slidingActiveUsers(events, 1)
      .select(col("day_sec"), col("active_users").as("dau"))
    val wau = slidingActiveUsers(events, windowDays)
      .select(col("day_sec"), col("active_users").as("wau"))
    dau.join(wau, Seq("day_sec"))
      .select(col("day_sec"), col("dau"), col("wau"),
        Cols.pct4(col("dau"), col("wau")).as("stickiness_pct"))
      .orderBy(col("day_sec"))
  }

  /** New-vs-returning daily census: a user is "new" on their first-seen
    * day, "returning" after — the acquisition/retention mix every growth
    * dashboard leads with. One distinct (user, day) collapse, one per-user
    * min, one bounded daily census. */
  def newVsReturning(events: DataFrame): DataFrame = {
    val userDays = events.where(col("user_id").isNotNull)
      .select(col("user_id"),
        (col("ts_sec") - pmod(col("ts_sec"), lit(86400L))).as("day_sec"))
      .distinct()
      .localCheckpoint() // feeds both the first-seen agg and the census
    val firstSeen = userDays.groupBy(col("user_id"))
      .agg(min(col("day_sec")).as("first_day"))
    userDays.join(firstSeen, Seq("user_id"))
      .groupBy(col("day_sec"))
      .agg(Cols.countWhen(col("day_sec") === col("first_day")).as("new_users"),
        Cols.countWhen(col("day_sec") =!= col("first_day")).as("returning_users"))
      .select(col("day_sec"), col("new_users"), col("returning_users"),
        Cols.pct4(col("new_users"), col("new_users") + col("returning_users"))
          .as("new_pct"))
      .orderBy(col("day_sec"))
  }

  /** Day-over-day total-variation drift of the event-type mix — the
    * distribution-shift monitor a training-data pipeline runs on every
    * ingest batch ("did today's traffic change regime?"). TV distance
    * ½·Σ|pₜ − qₜ| is used instead of KL/JS deliberately: it is pure
    * rational arithmetic on exact counts (KL's logs are libm calls whose
    * rounding differs across engines), bounded in [0,1], and defined even
    * when a type has zero mass on one side. The per-day statistic is
    * Σₜ|cₜ·N_prev − c′ₜ·N_day| / (2·N_day·N_prev) with the cross-products
    * in DECIMAL(38,0) lanes (the [[Hypothesis]] overflow doctrine — at
    * 10¹²-event days an int64 product would wrap); one IEEE division at
    * the end, floor-1e4.
    *
    * Shape: one hash agg to the bounded |days|×|types| frame; the dense
    * day×type grid (absent types must contribute their full mass) is a
    * broadcast of the |types| list; lag windows partition by type over
    * the bounded frame. Only consecutive calendar days compare — a gap
    * day breaks the chain rather than comparing across it.
    *
    * Null-key doctrine (r13, ADVICE fix): rows with a NULL event_type are
    * EXCLUDED up front, in both lanes — left in, they count toward each
    * day's total N (groupBy keeps a null group) but can never match the
    * dense grid's equi-join, so their mass silently vanishes from the TV
    * numerator while inflating the denominator (a pure shift in null-type
    * share would score 0 drift). Same rule as every user_id-keyed
    * operator; the oracle filters identically. */
  def typeMixDrift(events: DataFrame): DataFrame = {
    val dec = DecimalType(38, 0)
    val daily = events
      .where(col("event_type").isNotNull)
      .withColumn("day", expr("ts_sec div 86400"))
      .groupBy(col("day"), col("event_type")).agg(count(lit(1)).as("c"))
      .localCheckpoint() // three consumers: totals, the type list, the grid
    val totals = daily.groupBy(col("day")).agg(sum(col("c")).as("n"))
    val types = daily.select(col("event_type")).distinct()
    val grid = totals.crossJoin(broadcast(types))
      .join(daily, Seq("day", "event_type"), "left")
      .select(col("day"), col("event_type"), col("n"),
        coalesce(col("c"), lit(0L)).as("c"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
    grid
      .withColumn("cp", lag(col("c"), 1).over(w))
      .withColumn("np", lag(col("n"), 1).over(w))
      .withColumn("dp", lag(col("day"), 1).over(w))
      .where(col("dp") === col("day") - 1)
      .groupBy(col("day"))
      .agg(max(col("n")).as("events"), max(col("np")).as("prev_events"),
        sum(abs(col("c").cast(dec) * col("np").cast(dec)
          - col("cp").cast(dec) * col("n").cast(dec))).as("tvnum"))
      .select((col("day") * 86400L).as("day_sec"), col("events"), col("prev_events"),
        Cols.q4(col("tvnum").cast("double")
          / (lit(2.0) * col("events").cast("double")
            * col("prev_events").cast("double"))).as("tv_drift"))
      .orderBy(col("day_sec"))
  }
}
