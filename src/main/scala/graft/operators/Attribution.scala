package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Cols

/** Multi-touch (linear) marketing attribution: each purchase's credit is
  * split EQUALLY across the user's view events in the preceding lookback
  * window — the standard linear model, complementing the engine's
  * last-touch as-of attribution (`AsOfJoin` / q_asof_attribution).
  *
  * Determinism doctrine: credit is apportioned in integer micro-units
  * (10^6 per purchase) with the largest-remainder rule of
  * [[CorpusFilters]]' token apportionment — touch i of n gets
  * `10^6 div n` units plus one extra for the first `10^6 mod n` touches in
  * `(view_sec, view_event_id)` order — so sums are exact longs under any
  * partitioning and the single final divide by 10^6 is one shared IEEE op.
  * Never a float split summed across rows.
  *
  * Scale shape: the touch join is the [[RangeJoin]] grid trick with the
  * user as a co-key — purchases explode to the ≤ ceil(W/w)+1 grid cells
  * their lookback interval covers, views hash to their single cell, and
  * the join runs on `(user_id, cell)` (hash-partitionable, AQE-skew-
  * splittable) with the exact time predicate re-checked on candidates.
  * The per-purchase rank window partitions by purchase id — frames are
  * bounded by touches-per-purchase (lookback-window-bounded), not by
  * corpus size. Reference scope: the reference has no attribution
  * operator; declared SURVEY surface beside the as-of join.
  */
object Attribution {

  val LookbackSeconds = 3600L
  val CreditUnits     = 1000000L

  /** Ranked touch frame shared by the attribution models: one row per
    * (purchase, view-in-lookback) with the touch's per-purchase rank
    * `rk` (by view time then id), the purchase's touch count `n`, and the
    * view's hour-of-day. See the object scaladoc for the grid-join shape. */
  private def rankedTouches(events: DataFrame, lookback: Long): DataFrame = {
    val e = events.where(col("user_id").isNotNull)
      .select(col("event_id"), col("user_id"),
        Cols.tsSec(col("ts")).as("sec"), col("event_type"))
    val w = lookback // grid width = lookback: each interval covers ≤ 2 cells
    val purchases = e.where(col("event_type") === "purchase")
      .select(col("event_id").as("p_id"), col("user_id"), col("sec").as("p_sec"))
      .withColumn("__cell", explode(expr(
        s"sequence((p_sec - ${w}L) div ${w}L, (p_sec - 1L) div ${w}L)")))
    val views = e.where(col("event_type") === "view")
      .select(col("event_id").as("v_id"), col("user_id"), col("sec").as("v_sec"))
      .withColumn("__cell", expr(s"v_sec div ${w}L"))
    val touches = purchases.join(views, Seq("user_id", "__cell"))
      .where(col("v_sec") >= col("p_sec") - w && col("v_sec") < col("p_sec"))
      .select(col("p_id"), col("p_sec"), col("v_id"), col("v_sec"))
    val rk = Window.partitionBy(col("p_id")).orderBy(col("v_sec"), col("v_id"))
    touches
      .withColumn("rk", row_number().over(rk))
      .withColumn("n", count(lit(1)).over(Window.partitionBy(col("p_id"))))
      // `div`, not `/`: Spark's `/` on longs is a DOUBLE divide
      .withColumn("hour", expr("(v_sec % 86400) div 3600"))
  }

  /** The hour-of-day credit census over a per-touch micro-unit column. */
  private def creditByHour(ranked: DataFrame, units: org.apache.spark.sql.Column) =
    ranked.select(col("hour"), col("p_id"), units.as("units"))
      .groupBy(col("hour"))
      .agg(count(lit(1)).as("touches"),
        countDistinct(col("p_id")).as("purchases_touched"),
        (sum(col("units")).cast("double") / 1000000.0).as("credit"))
      .orderBy(col("hour"))

  /** Linear attribution credit by view hour-of-day: which hours' browsing
    * drives purchases. Output: one row per hour 0..23 with touch count,
    * distinct purchases touched, and exact credit (micro-unit sum / 10^6). */
  def linearCreditByHour(events: DataFrame,
                         lookback: Long = LookbackSeconds): DataFrame =
    creditByHour(rankedTouches(events, lookback),
      expr(s"${CreditUnits}L div n") +
        when(col("rk") <= lit(CreditUnits) % col("n"), 1L).otherwise(0L))

  /** Position-based (U-shaped, 40/20/40) attribution: the first and last
    * touches get 40% each, the middles share the remaining 20% by the same
    * largest-remainder rule; n = 1 takes everything, n = 2 splits 50/50.
    * Same ranked-touch frame and integer-unit doctrine as the linear
    * model — only the per-touch unit expression differs. */
  def uShapedCreditByHour(events: DataFrame,
                          lookback: Long = LookbackSeconds): DataFrame = {
    val mid = lit(200000L)
    val units =
      when(col("n") === 1, lit(CreditUnits))
        .when(col("n") === 2, lit(CreditUnits / 2))
        .when(col("rk") === 1 || col("rk") === col("n"), lit(400000L))
        .otherwise(expr("200000L div (n - 2)") +
          when(col("rk") - 1 <= mid % (col("n") - 2), 1L).otherwise(0L))
    creditByHour(rankedTouches(events, lookback), units)
  }

  /** Time-decay attribution with EXACT integer half-life weights: a touch
    * aged into half-life bucket b (of the lookback's `lookback/halfLife`
    * buckets) weighs `2^(maxB − b)` — the freshest bucket weighs 2^maxB,
    * each older bucket half that — so weights are powers of two computed
    * by a shift, never a float `pow` (whose rounding is not guaranteed
    * identical across engines). Per purchase, touch i earns
    * `(10^6 · w_i) div Σw` micro-units and the div-leftover goes to the
    * most recent touch — total is exactly 10^6 per touched purchase under
    * any partitioning. Windows partition by purchase id (lookback-bounded
    * frames), same as the sibling models. */
  def timeDecayCreditByHour(events: DataFrame,
                            lookback: Long = LookbackSeconds,
                            halfLife: Long = 900L): DataFrame = {
    // Exact int64 ceiling (r13, ADVICE fix — the prior flat `<= 43` was one
    // bucket stricter than int64 requires and its comment overstated the
    // overflow point): the per-touch credit product CreditUnits·2^maxB must
    // stay ≤ Long.MaxValue, i.e. 2^maxB ≤ Long.MaxValue div CreditUnits —
    // at CreditUnits = 10^6 that admits maxB ≤ 43 (10^6·2^43 ≈ 8.80e18 <
    // 9.22e18), so 44 buckets, where 2^44·10^6 would wrap silently under
    // Spark's non-ANSI multiply. The require states the bound itself, so
    // the ceiling moves with CreditUnits instead of hiding in a constant.
    // The window sum Σw is TOUCH-count bounded, not lookback-bounded: at
    // the 44-bucket ceiling it stays exact up to ~10^6 touches per
    // purchase window; at the 4-bucket default (weights ≤ 8) up to ~2^59.
    // A static require cannot see the touch count — callers running
    // pathological fan-in at deep bucket ladders should shrink lookback
    // or halfLife
    val buckets = if (halfLife > 0) lookback / halfLife else 0L
    require(halfLife > 0 && lookback % halfLife == 0 && buckets >= 1 &&
      buckets - 1 <= 62 && (1L << (buckets - 1).toInt) <= Long.MaxValue / CreditUnits,
      s"lookback must be a positive multiple of halfLife with CreditUnits*2^(buckets-1)" +
        s" <= Long.MaxValue (buckets <= 44 at CreditUnits=$CreditUnits); got buckets=$buckets")
    val maxB = lookback / halfLife - 1
    val wp = Window.partitionBy(col("p_id"))
    val ranked = rankedTouches(events, lookback)
      .withColumn("w", expr(
        s"shiftleft(1L, cast(${maxB}L - ((p_sec - v_sec - 1) div ${halfLife}L) as int))"))
      .withColumn("sw", sum(col("w")).over(wp))
      .withColumn("part", expr(s"(${CreditUnits}L * w) div sw"))
      .withColumn("sp", sum(col("part")).over(wp))
    creditByHour(ranked,
      col("part") + when(col("rk") === col("n"),
        lit(CreditUnits) - col("sp")).otherwise(0L))
  }
}
