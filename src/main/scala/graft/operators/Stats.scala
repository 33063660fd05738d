package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Cols

/** Cross-engine-deterministic statistics operators: least-squares trend
  * slopes and experiment (A/B) lift with Wilson intervals.
  *
  * Doctrine (graft.functions.Cols): accumulate EXACT integer sums under the
  * aggregation (order-independent), convert once, and run a fixed IEEE
  * expression tree on the scalars — never `avg`/`stddev` over raw doubles,
  * whose reduction order varies by partitioning. Every emitted double is
  * floor-quantized to 4 decimals.
  */
object Stats {

  /** Per-priority least-squares slope of daily revenue — "is this segment
    * growing?" as a regression, not an eyeball. x = day index rebased to
    * the corpus's first day (keeps Σxy far inside 2^53 so the long→double
    * conversions stay exact), y = exact cents. slope =
    * (n·Σxy − Σx·Σy) / (n·Σx² − Σx·Σx) in cents/day, one fixed double
    * expression over the exact sums; groups with a degenerate denominator
    * (fewer than two distinct days) report 0.
    *
    * Shape: one hash agg to (priority, day) cents, one to the per-priority
    * sums (both map-side combinable), the global min day broadcast — no
    * window, no sort, linear in orders. */
  def dailyRevenueTrend(orders: DataFrame): DataFrame = {
    val daily = orders
      .select(col("o_orderpriority").as("priority"),
        Cols.tsSec(col("o_orderdate")).as("sec"),
        Cols.cents(col("o_totalprice")).as("cents"))
      .withColumn("day", expr("sec div 86400"))
      .groupBy(col("priority"), col("day"))
      .agg(sum(col("cents")).as("y"))
    val base = daily.agg(min(col("day")).as("day0"))
    daily.crossJoin(broadcast(base))
      .withColumn("x", col("day") - col("day0"))
      .groupBy(col("priority"))
      .agg(count(lit(1)).as("n_days"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("y")).as("sxy"), sum(col("x") * col("x")).as("sxx"))
      .select(col("priority"), col("n_days"),
        when(col("n_days") * col("sxx") - col("sx") * col("sx") > 0,
          Cols.q4((col("n_days").cast("double") * col("sxy").cast("double")
            - col("sx").cast("double") * col("sy").cast("double"))
            / (col("n_days").cast("double") * col("sxx").cast("double")
              - col("sx").cast("double") * col("sx").cast("double"))))
          .otherwise(lit(0.0)).as("slope_cents_per_day"))
      .orderBy(col("priority"))
  }

  /** Integer EWMA of daily revenue per priority — trailing-average
    * smoothing with α = 1/2, the forecasting companion to
    * [[dailyRevenueTrend]]'s slope. The halving recurrence
    * `s_d = (s_{d−1} + y_d) div 2` is PURE INTEGER arithmetic: unlike a
    * float smoothing constant it cannot drift across engines or
    * accumulation orders, so the smoothed value is oracle-exact (DuckDB's
    * `list_reduce` seeds with the first element and folds left — the same
    * shape as Spark's `aggregate(slice(ys, 2, …), ys[0], …)`).
    *
    * Scale shape: the corpus-sized work is ONE map-side-combinable daily
    * aggregation; the ordered collect + fold runs on the bounded
    * (priority × days) frame — |days| per group, never per-order data. A
    * sequential recurrence cannot be a window function; a bounded-group
    * fold is its distributed form. */
  def dailyRevenueEwma(orders: DataFrame): DataFrame = {
    val daily = orders
      .select(col("o_orderpriority").as("priority"),
        Cols.tsSec(col("o_orderdate")).as("sec"),
        Cols.cents(col("o_totalprice")).as("cents"))
      .withColumn("day", expr("sec div 86400"))
      .groupBy(col("priority"), col("day"))
      .agg(sum(col("cents")).as("y"))
    daily
      .groupBy(col("priority"))
      .agg(count(lit(1)).as("n_days"), max(col("day")).as("last_day"),
        expr("transform(array_sort(collect_list(struct(day, y))), p -> p.y)").as("ys"))
      .select(col("priority"), col("n_days"), col("last_day"),
        (expr("aggregate(slice(ys, 2, greatest(size(ys) - 1, 0)), ys[0]," +
          " (acc, v) -> (acc + v) div 2)").cast("double") / 100.0).as("ewma_revenue"))
      .orderBy(col("priority"))
  }

  /** Holt's linear (double-exponential) smoothing of daily revenue per
    * order priority — the trend-aware sibling of [[dailyRevenueEwma]]:
    * a single-smoothed series lags a trending one by design; Holt keeps a
    * coupled (level, trend) pair so the fitted level tracks drift and the
    * trend state is itself the per-day drift estimate the forecast needs.
    *
    * Integer recurrence in cents (α = alphaPct/100, β = betaPct/100):
    * l_t = (α·y_t + (1−α)·(l_{t−1}+b_{t−1})) div 100 and
    * b_t = (β·(l_t−l_{t−1}) + (1−β)·b_{t−1}) div 100, seeded l_1 = y_1,
    * b_1 = 0. The trend can go negative; Spark's `div` and DuckDB's `//`
    * agree on truncation toward zero for negative operands (probed), so
    * the lanes stay bit-identical without the AsOfJoin floorDiv shim.
    *
    * Shape: the whole recurrence is ONE `aggregate()` expression over the
    * per-priority sorted day list (the Spectral.powerIteration r13
    * doctrine — no per-round jobs, no driver loop), with the per-day
    * (level, trend) path accumulated in the struct and exploded back to
    * rows. The day list is calendar-bounded (the [[theilSenDailyRevenue]]
    * posture), so the collected array is O(days), not O(rows).
    *
    * FORMAL SCALE ACCEPTANCE (ADVICE r13 #3, closed r15): the
    * `concat(acc.out, array(…))` path emit copies the accumulated array
    * each step — O(days²) element copies per group. Unlike the sibling
    * [[cusumDailyVolume]] (whose max(0, prev+d) recurrence solved to an
    * exact O(days) windowed reflection form), this coupled (l, b) pair is
    * div-TRUNCATED each step, which destroys the linearity any closed
    * form or block-parallel scan would need — the fold is irreducibly
    * sequential, and the only removable cost is the path copy. Accepted
    * with arithmetic: the frame is calendar-bounded, so a 10-year corpus
    * is 3 653 days → ≤ 3 653²/2 ≈ 6.7 M 4-field struct copies ONCE per
    * priority group (5 groups), ~10⁸ word moves total — milliseconds on
    * one core, independent of corpus row count (100 TB changes the hash
    * agg below this, not the fold). Revisit only if the day axis ever
    * becomes unbounded (e.g. per-minute grain → 5.3 M rows/decade). */
  def holtLinearDailyRevenue(orders: DataFrame, alphaPct: Int = 30,
                             betaPct: Int = 20): DataFrame = {
    require(alphaPct >= 0 && alphaPct <= 100 && betaPct >= 0 && betaPct <= 100)
    val daily = orders
      .select(col("o_orderpriority").as("priority"),
        Cols.tsSec(col("o_orderdate")).as("sec"),
        Cols.cents(col("o_totalprice")).as("cents"))
      .withColumn("day", expr("sec div 86400"))
      .groupBy(col("priority"), col("day"))
      .agg(sum(col("cents")).as("y"))
    // l_t appears inside both the 'l' and 'b' update: SQL lambdas have no
    // let-binding, so the expression is spelled twice — same value, one
    // deterministic integer sequence
    val lNext = s"(($alphaPct * p.y + ${100 - alphaPct} * (acc.l + acc.b)) div 100)"
    val bNext = s"(($betaPct * ($lNext - acc.l) + ${100 - betaPct} * acc.b) div 100)"
    daily.groupBy(col("priority"))
      .agg(expr("array_sort(collect_list(struct(day, y)))").as("ps"))
      .select(col("priority"), explode(expr(
        s"""aggregate(
           |  slice(ps, 2, greatest(size(ps) - 1, 0)),
           |  named_struct('l', ps[0].y, 'b', 0L,
           |    'out', array(named_struct('day', ps[0].day, 'y', ps[0].y,
           |                              'l', ps[0].y, 'b', 0L))),
           |  (acc, p) -> named_struct(
           |    'l', $lNext,
           |    'b', $bNext,
           |    'out', concat(acc.out, array(named_struct(
           |      'day', p.day, 'y', p.y, 'l', $lNext, 'b', $bNext)))),
           |  acc -> acc.out)""".stripMargin)).as("r"))
      .select(col("priority"), (col("r.day") * 86400L).as("day_sec"),
        (col("r.y").cast("double") / 100.0).as("revenue"),
        (col("r.l").cast("double") / 100.0).as("level"),
        (col("r.b").cast("double") / 100.0).as("trend"))
      .orderBy(col("priority"), col("day_sec"))
  }

  /** Mann–Kendall non-parametric trend test on daily revenue — the
    * hypothesis-test companion to [[theilSenDailyRevenue]]'s point
    * estimate (Kendall 1975): S = Σ_{i<j} sign(y_j − y_i) over
    * chronologically ordered days, variance with the standard tie
    * correction, z with the ±1 continuity correction. Least-squares
    * trends ([[dailyRevenueTrend]]) are pulled by single spike days;
    * Mann–Kendall only consumes pair ORDER, so it answers "is revenue
    * really drifting" robustly.
    *
    * Exactness: S is a sum of integer signs, the tie term
    * Σ t(t−1)(2t+5) and n(n−1)(2n+5) are exact longs (`var_s18` = 18·Var S
    * stays integer; the /18 happens once inside the final z sequence), z
    * is ONE fixed IEEE divide/sqrt, floor-quantized. Zero variance or
    * S = 0 reports z = 0 (zero-signal convention).
    *
    * Shape: the pair join runs on the calendar-bounded daily frame (the
    * [[theilSenDailyRevenue]] posture — days grow with the calendar, not
    * the corpus), checkpointed once and consumed by the pair join (both
    * sides), the tie census, and the count. */
  def mannKendallDailyRevenue(orders: DataFrame): DataFrame = {
    val daily = orders
      .select(Cols.tsSec(col("o_orderdate")).as("sec"),
        Cols.cents(col("o_totalprice")).as("cents"))
      .withColumn("day", expr("sec div 86400"))
      .groupBy(col("day")).agg(sum(col("cents")).as("y"))
      .localCheckpoint()
    val l = daily.select(col("day").as("d1"), col("y").as("y1"))
    val r = daily.select(col("day").as("d2"), col("y").as("y2"))
    // sign is ±1/0 exactly; cast to long BEFORE the sum (the standing
    // no-double-sums rule, even though small-integer doubles sum exactly)
    val s = l.join(r, col("d1") < col("d2"))
      .agg(coalesce(sum(signum(col("y2") - col("y1")).cast("long")), lit(0L))
        .as("s_stat"))
    val ties = daily.groupBy(col("y")).agg(count(lit(1)).as("t"))
      .agg(coalesce(sum(expr("t * (t - 1) * (2 * t + 5)")), lit(0L)).as("tt"))
    val n = daily.agg(count(lit(1)).as("n_days"))
    val z = when(col("var_s18") > 0L && col("s_stat") =!= 0L,
      Cols.q4(
        when(col("s_stat") > 0L, (col("s_stat") - 1L).cast("double"))
          .otherwise((col("s_stat") + 1L).cast("double"))
          / sqrt(col("var_s18").cast("double") / 18.0)))
      .otherwise(lit(0.0))
    s.crossJoin(broadcast(ties)).crossJoin(broadcast(n))
      .select(col("n_days"), col("s_stat"),
        (expr("n_days * (n_days - 1) * (2 * n_days + 5)") - col("tt"))
          .as("var_s18"))
      .withColumn("z", z)
      .withColumn("trend",
        when(col("z") >= 1.96, "increasing")
          .when(col("z") <= -1.96, "decreasing")
          .otherwise("none"))
  }

  /** CUSUM sequential drift detector over daily event volume — the
    * monitoring sibling of the RETROSPECTIVE [[hourlyChangepoint]]: a
    * tabular CUSUM (Page 1954) accumulates deviations from a baseline
    * mean and alarms when the cumulative excess clears a threshold, which
    * is how a production pipeline notices volume drift as it happens
    * rather than in next week's backfill.
    *
    * Integer arithmetic throughout, scaled by the baseline day count so
    * the baseline MEAN never needs a division: with nb baseline days and
    * sumb their total count, day t's scaled deviation is c_t·nb − sumb,
    * the slack is half a baseline mean (sumb div 2 in the same units),
    * and the recurrences are cp_t = max(0, cp_{t−1} + dev_t − slack),
    * cn_t = max(0, cn_{t−1} − dev_t − slack), alarm when either clears
    * 5·sumb (five baseline-mean units). Deterministic on any engine —
    * no floats anywhere.
    *
    * Shape: one hash agg to the calendar-bounded daily frame, then the
    * recurrence via the EXACT Lindley-reflection closed form instead of a
    * sequential fold: cp_t = max(0, cp_{t−1} + d_t) with additive integer
    * increments d_t solves to cp_t = S_t − min(0, min_{j≤t} S_j) over the
    * prefix sums S (the reflected-walk identity — pure integer adds, so
    * bit-identical to the recurrence on any engine; the oracle runs the
    * raw recursive CTE and hash-matches). That makes the whole detector
    * two cumulative window passes over the calendar-bounded daily frame —
    * O(days) work, no O(days²) path concat (the shape ADVICE r13 #3
    * flagged; [[holtLinearDailyRevenue]]'s coupled div-truncated
    * recurrence has no such closed form and keeps the fold under a formal
    * acceptance). The single-partition global window is bounded by the
    * calendar, not the corpus ([[rollingMedianDailyRevenue]] posture). */
  def cusumDailyVolume(events: DataFrame, baselineDays: Int = 7): DataFrame = {
    require(baselineDays >= 1)
    val daily = events
      .withColumn("day", expr("ts_sec div 86400"))
      .groupBy(col("day")).agg(count(lit(1)).as("c"))
      .localCheckpoint()
    // baseline over the first `baselineDays` calendar days — a broadcast
    // scalar frame (nb, sumb), same role as the fold's slice() seed
    val base = daily.orderBy(col("day")).limit(baselineDays)
      .agg(count(lit(1)).as("nb"), sum(col("c")).as("sumb"))
    val wCum = Window.orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    daily.crossJoin(broadcast(base))
      .select(col("day"), col("c"), col("sumb"),
        (col("c") * col("nb") - col("sumb") - expr("sumb div 2")).as("dp"),
        (-(col("c") * col("nb") - col("sumb")) - expr("sumb div 2")).as("dn"))
      .withColumn("sp", sum(col("dp")).over(wCum))
      .withColumn("sn", sum(col("dn")).over(wCum))
      .withColumn("cp", col("sp") - least(lit(0L), min(col("sp")).over(wCum)))
      .withColumn("cn", col("sn") - least(lit(0L), min(col("sn")).over(wCum)))
      .select((col("day") * 86400L).as("day_sec"), col("c").as("events"),
        col("cp").as("cusum_pos"), col("cn").as("cusum_neg"),
        (col("cp") > col("sumb") * 5L || col("cn") > col("sumb") * 5L)
          .as("alarm"))
      .orderBy(col("day_sec"))
  }

  /** Trailing 7-day exact (lower) median of daily revenue — the rolling
    * robust location every ops dashboard wants beside the EWMA: a single
    * spike day moves a trailing mean by its full mass but the trailing
    * median not at all. CALENDAR semantics (a RANGE frame over the day
    * number, not 7 rows): a gap day shrinks the window rather than
    * silently reaching further back; `window_days` reports the actual
    * support. Lower median (element ⌈n/2⌉ of the sorted band) keeps the
    * statistic an observed value — integer cents, no interpolation, exact
    * on any engine.
    *
    * Shape: one hash agg to the calendar-bounded daily frame, then ONE
    * range-framed window whose collected band is ≤ 7 longs — O(days)
    * total state, same posture as [[theilSenDailyRevenue]]'s bounded
    * daily frame (the single-partition global window is bounded by the
    * calendar, not the corpus). */
  def rollingMedianDailyRevenue(orders: DataFrame, windowDays: Int = 7): DataFrame = {
    require(windowDays >= 1)
    val daily = orders
      .select(Cols.tsSec(col("o_orderdate")).as("sec"),
        Cols.cents(col("o_totalprice")).as("cents"))
      .withColumn("day", expr("sec div 86400"))
      .groupBy(col("day")).agg(sum(col("cents")).as("y"))
    val w = Window.orderBy(col("day")).rangeBetween(-(windowDays - 1L), 0L)
    daily
      .withColumn("vals", sort_array(collect_list(col("y")).over(w)))
      .select((col("day") * 86400L).as("day_sec"),
        (col("y").cast("double") / 100.0).as("revenue"),
        (expr("element_at(vals, CAST((size(vals) + 1) div 2 AS INT))")
          .cast("double") / 100.0).as("rolling_median"),
        size(col("vals")).cast("long").as("window_days"))
      .orderBy(col("day_sec"))
  }

  /** Hourly-volume autocorrelation r_k for lags 1..`maxLag` — the
    * periodicity detector (a daily cycle shows as a peak at lag 24). All
    * moments are exact integer sums over the BOUNDED hourly frame: one
    * corpus-sized hash agg builds (hour, count), and the lag join, the
    * Σy/Σy²/Σy·y₊ₖ sums, and the |lags|-row output never touch per-event
    * data again. Squared-count lanes run in DECIMAL(38,0)/HUGEINT (counts
    * near 2³¹/hour would overflow long products at 100 TB — the
    * [[Spectral.dimCorrelations]] guard); the only IEEE math is the single
    * divide/√/floor-quantize sequence per lag, stated op-for-op in the
    * oracle. Zero-variance windows report 0. */
  def hourlyAutocorrelation(events: DataFrame, maxLag: Int = 24): DataFrame = {
    val hourly = events
      .groupBy(expr("ts_sec div 3600").as("h"))
      .agg(count(lit(1)).as("y"))
      .localCheckpoint() // both sides of every lag join
    val lags = hourly.sparkSession.range(1, maxLag + 1).select(col("id").as("lag"))
    hourly.select(col("h"), col("y").as("ya"))
      .crossJoin(broadcast(lags))
      .join(hourly.select(col("h").as("hb"), col("y").as("yb")),
        col("hb") === col("h") + col("lag"))
      .groupBy(col("lag"))
      .agg(count(lit(1)).as("n"),
        sum(col("ya")).as("sa"), sum(col("yb")).as("sb"),
        sum(col("ya").cast("decimal(38,0)") * col("yb")).as("sab"),
        sum(col("ya").cast("decimal(38,0)") * col("ya")).as("saa"),
        sum(col("yb").cast("decimal(38,0)") * col("yb")).as("sbb"))
      .select(col("lag"), col("n"), expr(
        """CASE WHEN (CAST(n AS DECIMAL(38,0)) * saa - CAST(sa AS DECIMAL(38,0)) * sa) > 0
          |       AND (CAST(n AS DECIMAL(38,0)) * sbb - CAST(sb AS DECIMAL(38,0)) * sb) > 0
          |  THEN CAST(floor(
          |    CAST(CAST(n AS DECIMAL(38,0)) * sab - CAST(sa AS DECIMAL(38,0)) * sb AS DOUBLE)
          |    / sqrt(CAST(CAST(n AS DECIMAL(38,0)) * saa - CAST(sa AS DECIMAL(38,0)) * sa AS DOUBLE)
          |         * CAST(CAST(n AS DECIMAL(38,0)) * sbb - CAST(sb AS DECIMAL(38,0)) * sb AS DOUBLE))
          |    * 10000.0) AS BIGINT)
          |  ELSE CAST(0 AS BIGINT) END""".stripMargin).as("autocorr_u"))
      .orderBy(col("lag"))
  }

  /** Theil–Sen robust slope of daily revenue (Theil 1950 / Sen 1968): the
    * MEDIAN of all pairwise slopes — up to ~29% of days can be corrupted
    * (an outage, a backfill spike) without moving it, where the
    * least-squares slope ([[dailyRevenueTrend]]) chases every outlier.
    *
    * Distributed shape, both halves from this engine's own toolkit:
    * all-pairs over the bounded daily frame via the triangle
    * block-partitioned equi-join (the [[Similarity.exactPairsBlocked]]
    * doctrine — never a cartesian, O(days²) work spread evenly over
    * B(B+1)/2 keys), and the exact median of the pair slopes via the
    * histogram-offset selection (the [[Relational.quantilesCont]]
    * machinery: only the bucket histogram windows; two rows reach the
    * interpolation). Slopes are floored 1e-4-cent/day integer units, so
    * selection is integer-exact and the final division is the one IEEE op.
    *
    * Sizing `numBlocks` (the [[Similarity.exactPairsBlocked]] rule): the
    * days² / 2 pairs spread over B(B+1)/2 block-pair keys, so per-task pair
    * volume ≈ days² / B² — pick B ≈ days / √(target rows per task) (e.g.
    * 10⁵-row tasks on a 10⁴-day frame → B ≈ 32). B=8 puts the ~2.9 M pairs
    * of a 2.4 k-day frame into 36 tasks of ~80 k pairs — fine at sf0.1 and
    * still fine at 100 TB, because days grow with CALENDAR TIME, not data
    * volume. The result is invariant in B (PropertySpec checks B ∈
    * {1, 8, 16}); only task granularity changes. */
  def theilSenDailyRevenue(orders: DataFrame, numBlocks: Int = 8): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val daily = orders
      .select(Cols.tsSec(col("o_orderdate")).as("sec"),
        Cols.cents(col("o_totalprice")).as("cents"))
      .withColumn("day", expr("sec div 86400"))
      .groupBy(col("day")).agg(sum(col("cents")).as("y"))
      .localCheckpoint() // both sides of the blocked pair join
    val coded = daily.select(col("day"), col("y"),
      (Dedup.PortableHash(concat(lit("tsn:"), col("day").cast("string")))
        % numBlocks).as("blk"))
    val l = coded.withColumn("bj", explode(sequence(col("blk"), lit(numBlocks - 1))))
      .select(col("blk").as("bi"), col("bj"),
        col("day").as("d1"), col("y").as("y1"))
      // pre-explosion spread (the [[bootstrapMedianCi]] rule): the daily
      // frame is checkpointed on ONE tiny partition, and AQE broadcasts the
      // other side of the block join — without an explicit exchange the
      // entire days²/2 pair explosion lands on that single task (measured
      // at sf0.1: the 2.9M-pair stage ran 1-task, ~2.6 s of the query's
      // 4 s wall; 36-task after). Hash on the block-pair key the join
      // needs, with an explicit partition count so AQE's coalescing (which
      // only sees the ~11k-row PRE-explosion size) can't undo it.
      .repartition(numBlocks * (numBlocks + 1) / 2, col("bi"), col("bj"))
    val r = coded.withColumn("bi", explode(sequence(lit(0), col("blk"))))
      .select(col("bi").as("ri"), col("blk").as("rj"),
        col("day").as("d2"), col("y").as("y2"))
    val pairs = l.join(r, col("bi") === col("ri") && col("bj") === col("rj"))
      .where(col("bi") =!= col("bj") || col("d1") < col("d2"))
      .select(least(col("d1"), col("d2")).as("da"),
        greatest(col("d1"), col("d2")).as("db"),
        when(col("d1") < col("d2"), col("y2") - col("y1"))
          .otherwise(col("y1") - col("y2")).as("dy"),
        abs(col("d2") - col("d1")).as("dx"))
      // greatest(dx, 1) keeps the floor division TOTAL: dx = 0 never
      // survives the pair filter, but Catalyst may reorder a downstream
      // join's derived isnotnull(bucket) predicate ahead of that filter,
      // and ANSI pmod/div on a not-yet-rejected diagonal row would throw
      .select(col("da"), col("db"),
        expr("((dy * 10000) - pmod(dy * 10000, greatest(dx, 1L))) div greatest(dx, 1L)")
          .as("u"))
    // exact median of u via histogram-offset selection (floor-div buckets
    // handle negative slopes); materialized ONCE — the histogram branch
    // and the ranked branch both consume it, and without the checkpoint
    // each would replay the blocked pair join
    val bucketed = pairs.select(col("da"), col("db"), col("u"),
      expr("((u - pmod(u, 1000000)) div 1000000)").as("bucket"))
      .localCheckpoint()
    val hist = bucketed.groupBy(col("bucket")).agg(count(lit(1)).as("cnt"))
    val wPrev = Window.orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = hist.select(col("bucket"),
      coalesce(sum(col("cnt")).over(wPrev), lit(0L)).as("off"),
      sum(col("cnt")).over(Window.partitionBy()).as("n"))
    val wBucket = Window.partitionBy(col("bucket"))
      .orderBy(col("u"), col("da"), col("db"))
    val ranked = bucketed.join(broadcast(offsets), Seq("bucket"))
      .select(col("u"), (col("off") + row_number().over(wBucket)).as("r"), col("n"))
    val cands = ranked.where(
      col("r") === expr("(n - 1) div 2") + 1 || col("r") === expr("(n - 1) div 2") + 2)
    cands.agg(
        first(col("n")).as("n_pairs"),
        min(when(col("r") === expr("(n - 1) div 2") + 1, col("u"))).as("u_lo"),
        min(when(col("r") === expr("(n - 1) div 2") + 2, col("u"))).as("u_hi"))
      .select(col("n_pairs"),
        ((col("u_lo").cast("double")
          + (pmod(col("n_pairs") - 1, lit(2L)).cast("double") / 2.0)
            * (coalesce(col("u_hi"), col("u_lo")).cast("double")
              - col("u_lo").cast("double"))) / 10000.0).as("slope_cents_per_day"))
  }

  /** Exact single-changepoint detection over the hourly event-count series
    * — the two-segment least-squares break (the k=1 case of Bai & Perron's
    * structural-break framework; the batch analogue of a CUSUM alarm):
    * the split k* minimizing SSE_left + SSE_right equivalently MAXIMIZES
    * f(k) = S_l²/n_l + S_r²/n_r, and every candidate's f comes from ONE
    * prefix-sum pass over the bounded hourly aggregate (Σc and row index
    * left of k; totals minus them right of k) — exact integer sums, one
    * fixed IEEE expression per candidate, argmax by (f desc, hour asc).
    *
    * Shape: the event scan collapses to ≤|hours| rows first; the prefix
    * window, the candidate frame, and the argmax all run on that bounded
    * frame — nothing corpus-sized sorts or windows. */
  def hourlyChangepoint(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val hourly = events
      .groupBy((col("ts_sec") - pmod(col("ts_sec"), lit(3600L))).as("hour_sec"))
      .agg(count(lit(1)).as("c"))
    val w = Window.orderBy(col("hour_sec"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = Window.partitionBy()
    val pre = hourly.select(col("hour_sec"),
      sum(col("c")).over(w).as("s_l"), sum(lit(1L)).over(w).as("n_l"),
      sum(col("c")).over(tot).as("s"), count(lit(1)).over(tot).as("n"))
    val cand = pre.where(col("n_l") < col("n"))
      .select(col("hour_sec"), col("s_l"), col("n_l"),
        (col("s") - col("s_l")).as("s_r"), (col("n") - col("n_l")).as("n_r"))
      .withColumn("f",
        col("s_l").cast("double") * col("s_l").cast("double") / col("n_l").cast("double")
          + col("s_r").cast("double") * col("s_r").cast("double") / col("n_r").cast("double"))
    val wr = Window.orderBy(col("f").desc, col("hour_sec").asc)
    cand.withColumn("rn", row_number().over(wr)).where(col("rn") === 1)
      .select(col("hour_sec").as("split_hour_sec"),
        col("n_l").as("hours_left"), col("n_r").as("hours_right"),
        col("s_l").as("events_left"), col("s_r").as("events_right"),
        Cols.q4(col("s_l").cast("double") / col("n_l").cast("double")).as("mean_left"),
        Cols.q4(col("s_r").cast("double") / col("n_r").cast("double")).as("mean_right"))
  }

  /** RFM customer segmentation — the classic marketing cut: per customer
    * Recency (days since last order), Frequency (order count), Monetary
    * (exact cents spend), each scored into quartiles against the GLOBAL
    * customer distribution, and the 4×4×4 segment census reported.
    *
    * Quartile thresholds are three interpolated percentiles per metric —
    * a 1-row broadcast frame; scoring is then a pure projection, and the
    * census a bounded (≤64-row) aggregate. Spark's `percentile` and the
    * oracle's `quantile_cont` interpolate identically (the
    * [[Relational.priceQuantiles]] parity precedent); every comparison is
    * long-vs-double with exact widening. R scores 4 = most recent
    * (≤ p25 of days-since), F/M score 4 = top quartile. */
  def rfmSegments(orders: DataFrame): DataFrame = {
    // per-customer-agg fan-out on its own grouping key (Spread.byKey,
    // no-op at scale)
    val base = Spread.byKey(orders, col("o_custkey"))
      .select(col("o_custkey"),
        Cols.tsSec(col("o_orderdate")).as("sec"),
        Cols.cents(col("o_totalprice")).as("cents"))
      .withColumn("day", expr("sec div 86400"))
    val per = base.groupBy(col("o_custkey"))
      .agg(max(col("day")).as("last_day"), count(lit(1)).as("freq"),
        sum(col("cents")).as("mon"))
    val anchor = per.agg(max(col("last_day")).as("day0"))
    val scored = per.crossJoin(broadcast(anchor))
      .withColumn("recency", col("day0") - col("last_day"))
    val th = scored.agg(
      percentile(col("recency"), lit(0.25)).as("r1"),
      percentile(col("recency"), lit(0.5)).as("r2"),
      percentile(col("recency"), lit(0.75)).as("r3"),
      percentile(col("freq"), lit(0.25)).as("f1"),
      percentile(col("freq"), lit(0.5)).as("f2"),
      percentile(col("freq"), lit(0.75)).as("f3"),
      percentile(col("mon"), lit(0.25)).as("m1"),
      percentile(col("mon"), lit(0.5)).as("m2"),
      percentile(col("mon"), lit(0.75)).as("m3"))
    def asc(v: Column, q1: Column, q2: Column, q3: Column): Column =
      when(v <= q1, 1L).when(v <= q2, 2L).when(v <= q3, 3L).otherwise(4L)
    scored.crossJoin(broadcast(th))
      .select(
        // recent = small days-since = HIGH score: 5 − ascending quartile
        (lit(5L) - asc(col("recency"), col("r1"), col("r2"), col("r3"))).as("r_score"),
        asc(col("freq"), col("f1"), col("f2"), col("f3")).as("f_score"),
        asc(col("mon"), col("m1"), col("m2"), col("m3")).as("m_score"),
        col("mon"))
      .groupBy(col("r_score"), col("f_score"), col("m_score"))
      .agg(count(lit(1)).as("customers"),
        (sum(col("mon")).cast("double") / 100.0).as("monetary_total"))
      .orderBy(col("r_score"), col("f_score"), col("m_score"))
  }

  /** Deterministic A/B readout: users hash-split into two arms
    * (md5₄₈("ab:" + user_id) % 2 — the [[Sampling]] membership doctrine, so
    * the assignment is reproducible anywhere), outcome = the user made ≥1
    * purchase. Reports per arm: users, converters, conversion %, and the
    * Wilson 95% score interval — the interval of choice at small n because
    * it never leaves [0, 1]. Wilson terms are one fixed IEEE expression
    * over (converters, users); IEEE ops (incl. sqrt) are correctly rounded,
    * so both engines emit bit-identical bounds.
    *
    * Shape: per-user outcome is one hash agg over events; the arm rollup
    * is a second agg to two rows. The interval math runs on the 2-row
    * aggregate. */
  def abConversionLift(events: DataFrame, z: Double = 1.96): DataFrame = {
    val perUser = events
      .where(col("user_id").isNotNull) // a null user hashes to a null arm
      .groupBy(col("user_id"))
      .agg(Cols.countWhen(col("event_type") === "purchase").as("purchases"))
      .select(
        (Dedup.PortableHash(concat(lit("ab:"), col("user_id").cast("string"))) % 2)
          .as("arm"),
        when(col("purchases") > 0, 1L).otherwise(0L).as("converted"))
    val arms = perUser.groupBy(col("arm"))
      .agg(count(lit(1)).as("users"), sum(col("converted")).as("converters"))
    val n = col("users").cast("double")
    val p = col("converters").cast("double") / col("users").cast("double")
    val z2 = lit(z * z)
    val center = p + z2 / (lit(2.0) * n)
    val margin = lit(z) * sqrt(p * (lit(1.0) - p) / n + z2 / (lit(4.0) * n * n))
    val denom = lit(1.0) + z2 / n
    arms.select(col("arm"), col("users"), col("converters"),
        Cols.pct4(col("converters"), col("users")).as("conversion_pct"),
        Cols.q4((center - margin) / denom * 100.0).as("wilson_low_pct"),
        Cols.q4((center + margin) / denom * 100.0).as("wilson_high_pct"))
      .orderBy(col("arm"))
  }

  /** Revenue concentration — Gini coefficient and top-1%/top-10% revenue
    * shares over per-customer revenue. The "who contributes the tokens"
    * inequality report a corpus-mixture budget needs, run on the money
    * tables: Gini = Σᵢ(2i − n − 1)·xᵢ / (n·Σx) with i the rank under the
    * total order (revenue, custkey) — any consistent tie order gives the
    * same sum because tied x are equal.
    *
    * Scale shape: revenue is exact integer cents; the global rank is NOT a
    * global row window but the bucketed two-stage prefix count
    * ([[Sampling.systematicWeighted]]'s pattern): per-bucket counts
    * (`cents >> bucketBits`), a running count over the bounded bucket
    * table, and an intra-bucket row_number partitioned by bucket. The
    * scalar (n, Σx) frame broadcasts. Long headroom: Σᵢ rank·cents must
    * stay below 2^63 — at 10⁹ customers averaging 10⁴ dollars that is
    * ~10^21, so beyond ~10⁷ customers route the numerator through
    * DECIMAL(38,0) (the census here is 10⁴–10⁶). */
  def revenueConcentration(orders: DataFrame, bucketBits: Int = 12): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val custRev = orders.groupBy(col("o_custkey"))
      .agg(sum(Cols.cents(col("o_totalprice"))).as("cents"))
    val b = custRev.withColumn("__b", shiftright(col("cents"), bucketBits))
    val wb = Window.orderBy(col("__b")).rowsBetween(Window.unboundedPreceding, -1)
    val off = b.groupBy(col("__b")).agg(count(lit(1)).as("__bn"))
      .withColumn("__off", coalesce(sum(col("__bn")).over(wb), lit(0L)))
      .select(col("__b"), col("__off"))
    val wi = Window.partitionBy(col("__b")).orderBy(col("cents"), col("o_custkey"))
    val ranked = b.join(off, Seq("__b"))
      .withColumn("rk", col("__off") + row_number().over(wi))
    val totals = custRev.agg(count(lit(1)).as("n"), sum(col("cents")).as("tot"))
    ranked.crossJoin(broadcast(totals))
      .agg(
        max(col("n")).as("customers"),
        (max(col("tot")).cast("double") / 100.0).as("total_revenue"),
        Cols.q4(sum((lit(2) * col("rk") - col("n") - 1) * col("cents")).cast("double")
          / (max(col("n")).cast("double") * max(col("tot")).cast("double"))).as("gini"),
        Cols.q4(sum(when(col("rk") > col("n") - expr("n div 10"), col("cents"))
            .otherwise(0L)).cast("double") * 100.0
          / max(col("tot")).cast("double")).as("top10_pct"),
        Cols.q4(sum(when(col("rk") > col("n") - expr("n div 100"), col("cents"))
            .otherwise(0L)).cast("double") * 100.0
          / max(col("tot")).cast("double")).as("top1_pct"))
  }

  /** Daily sample-ratio-mismatch (SRM) check for the hash-armed experiment
    * of [[abConversionLift]] — the trust gate that runs BEFORE anyone reads
    * a lift number: under the 50/50 assignment the per-day unit counts must
    * fit χ² = (n_a − n_b)²/(n_a + n_b) ≲ 3.8415 (95%, 1 dof); a flagged day
    * means the assignment or logging pipeline is dropping one arm. Units
    * are (day, user) pairs, the same portable-hash arm rule as the lift
    * query; all arithmetic is integer until the single χ² divide. One
    * distinct-collapse then a per-day aggregate — nothing here outgrows
    * |days| rows. */
  def sampleRatioCheck(events: DataFrame): DataFrame = {
    val dayUsers = events.where(col("user_id").isNotNull)
      .select((floor(Cols.tsSec(col("ts")) / 86400.0) * 86400).cast("long").as("day_sec"),
        col("user_id"))
      .distinct()
      .select(col("day_sec"),
        (Dedup.PortableHash(concat(lit("ab:"), col("user_id").cast("string"))) % 2).as("arm"))
    val daily = dayUsers.groupBy(col("day_sec"))
      .agg(Cols.countWhen(col("arm") === 0).as("users_a"),
        Cols.countWhen(col("arm") === 1).as("users_b"))
    val diff = col("users_a") - col("users_b")
    val chi2 = (diff * diff).cast("double") / (col("users_a") + col("users_b")).cast("double")
    daily.select(col("day_sec"), col("users_a"), col("users_b"),
        Cols.q4(chi2).as("chi2"),
        when(chi2 > 3.8415, 1L).otherwise(0L).as("srm"))
      .orderBy(col("day_sec"))
  }

  /** Hourly OHLC (open/high/low/close) bars over the event `value` stream —
    * the market-data aggregation shape every metrics dashboard reuses.
    * Open/close are made deterministic with `min_by`/`max_by` on a
    * fixed-width zero-padded `(second, event_id)` string key: lexicographic
    * order on the padded key IS numeric order on the pair, it is globally
    * unique (event_id is), and — unlike a struct ordering key — both
    * engines implement `min_by(x, varchar)` identically. Values are exact
    * cents; high/low are plain integer min/max.
    *
    * Shape: one map-side-combinable hash aggregation to |hours| rows; the
    * only shuffle is on the hour key. At 100 TB the bar frame is bounded by
    * the calendar, not the event count. */
  def hourlyOhlc(events: DataFrame): DataFrame = {
    val sec = Cols.tsSec(col("ts"))
    val ord = concat(lpad(sec.cast("string"), 12, "0"),
      lpad(col("event_id").cast("string"), 16, "0"))
    events.where(col("value").isNotNull)
      .select(Cols.hourSec(sec).as("hour_sec"),
        Cols.cents(col("value")).as("cents"), ord.as("ord"))
      .groupBy(col("hour_sec"))
      .agg(
        (min_by(col("cents"), col("ord")).cast("double") / 100.0).as("open"),
        (max(col("cents")).cast("double") / 100.0).as("high"),
        (min(col("cents")).cast("double") / 100.0).as("low"),
        (max_by(col("cents"), col("ord")).cast("double") / 100.0).as("close"),
        count(lit(1)).as("trades"),
        (sum(col("cents")).cast("double") / 100.0).as("volume"))
      .orderBy(col("hour_sec"))
  }

  /** ABC (Pareto 80/95) inventory classification of parts by lineitem
    * revenue: class A = the cheapest prefix of the revenue-DESC ranking
    * that covers 80% of total revenue, B = to 95%, C = the tail. The
    * descending cumulative revenue uses the same bucketed two-stage prefix
    * machinery as [[revenueConcentration]] — per-bucket sums
    * (`cents >> bucketBits`), a running sum over the 2^bucketBits-times
    * smaller bucket table (the only single-partition window), then an
    * intra-bucket prefix partitioned by bucket — never a global window
    * over the part frame. Class cuts are exact integer comparisons
    * (100·cum vs 80·tot); at corpus scales where total cents approaches
    * 2^63/100, compare on `cum div 100 * 100` instead — the fixture is
    * 10^5× inside the bound. */
  def abcClasses(lineitem: DataFrame, bucketBits: Int = 12): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val rev = lineitem.groupBy(col("l_partkey"))
      .agg(sum(Cols.cents(col("l_extendedprice"))).as("cents"))
    val b = rev.withColumn("__b", shiftright(col("cents"), bucketBits))
    // strictly-greater buckets: every part there outranks every part here
    val wb = Window.orderBy(col("__b").desc).rowsBetween(Window.unboundedPreceding, -1)
    val off = b.groupBy(col("__b")).agg(sum(col("cents")).as("__bs"))
      .withColumn("__off", coalesce(sum(col("__bs")).over(wb), lit(0L)))
      .select(col("__b"), col("__off"))
    val wi = Window.partitionBy(col("__b"))
      .orderBy(col("cents").desc, col("l_partkey"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val ranked = b.join(off, Seq("__b"))
      .withColumn("cum", col("__off") + sum(col("cents")).over(wi))
    val totals = rev.agg(sum(col("cents")).as("tot"), count(lit(1)).as("np"))
    ranked.crossJoin(broadcast(totals))
      .withColumn("abc_class",
        when(col("cum") * 100 <= col("tot") * 80, "A")
          .when(col("cum") * 100 <= col("tot") * 95, "B")
          .otherwise("C"))
      .groupBy(col("abc_class"))
      .agg(count(lit(1)).as("parts"),
        Cols.pct4(count(lit(1)), max(col("np"))).as("parts_pct"),
        (sum(col("cents")).cast("double") / 100.0).as("revenue"),
        Cols.pct4(sum(col("cents")), max(col("tot"))).as("revenue_pct"))
      .orderBy(col("abc_class"))
  }

  /** Benford first-digit audit of order totals — the fraud/data-quality
    * screen: leading digits of naturally-occurring amounts should follow
    * P(d) = log10(1+1/d). The digit is taken from the decimal string of
    * the exact cents value (multiplying by 100 never changes the leading
    * digit), so the lane is integer/string-exact; the expected shares are
    * pinned double literals (both engines parse the same nearest-double),
    * and each digit's χ² contribution runs one fixed IEEE expression over
    * (observed count, n·p). Output: 9 rows. One hash aggregation on a
    * 9-value key — nothing here scales with anything but the row count. */
  def benfordAudit(orders: DataFrame): DataFrame = {
    val cents = Cols.cents(col("o_totalprice"))
    val digits = orders.where(cents > 0)
      .select(substring(cents.cast("string"), 1, 1).as("digit"))
      .groupBy(col("digit")).agg(count(lit(1)).as("observed"))
    val n = digits.agg(sum(col("observed")).as("n"))
    val expected = BenfordP.foldLeft(when(lit(false), 0.0)) { case (acc, (d, p)) =>
      acc.when(col("digit") === d.toString, p)
    }
    val e = col("n").cast("double") * expected
    val dev = col("observed").cast("double") - e
    digits.crossJoin(broadcast(n))
      .select(col("digit"), col("observed"),
        Cols.pct4(col("observed"), col("n")).as("observed_pct"),
        expected.as("expected_p"),
        Cols.q4(dev * dev / e).as("chi2"))
      .orderBy(col("digit"))
  }

  /** log10(1+1/d) for d = 1..9, pinned so the Spark plan and the SQL
    * oracle share literal text (hence bit-identical doubles). */
  private[graft] val BenfordP: Seq[(Int, Double)] = Seq(
    1 -> 0.3010299956639812, 2 -> 0.17609125905568124,
    3 -> 0.12493873660829993, 4 -> 0.09691001300805642,
    5 -> 0.07918124604762482, 6 -> 0.06694678963061322,
    7 -> 0.05799194697768673, 8 -> 0.05115252244738129,
    9 -> 0.04575749056067514)

  /** Robust central tendency: 5%-trimmed and 5%-winsorized means of order
    * totals from the [[Relational.quantilesCont]] interpolated p05/p95
    * fences. The trimmed mean averages only in-fence rows (exact cents sum,
    * one divide); the winsorized mean replaces each clipped tail row by its
    * fence value — computed as `inside_cents/100 + below·p05 + above·p95`
    * over integer aggregates, so no double is ever summed across rows.
    * Shape: the fence frame is 2 rows (broadcast); the census is one
    * scan-side aggregation. */
  def trimmedMeans(ordersIn: DataFrame): DataFrame = {
    val qs = Relational.quantilesCont(ordersIn,
      qs = Seq(("p05", 1L, 20L), ("p95", 19L, 20L)))
    val fences = qs.agg(
      min(when(col("quantile") === "p05", col("value"))).as("p05"),
      min(when(col("quantile") === "p95", col("value"))).as("p95"))
    ordersIn
      .select(Cols.cents(col("o_totalprice")).as("c"))
      .withColumn("v", col("c").cast("double") / 100.0)
      .crossJoin(broadcast(fences))
      .agg(count(lit(1)).as("orders"),
        first(col("p05")).as("p05"), first(col("p95")).as("p95"),
        Cols.countWhen(col("v") < col("p05")).as("below"),
        Cols.countWhen(col("v") > col("p95")).as("above"),
        Cols.countWhen(col("v") >= col("p05") && col("v") <= col("p95")).as("kept"),
        sum(when(col("v") >= col("p05") && col("v") <= col("p95"), col("c"))
          .otherwise(0L)).as("inside_cents"))
      .select(col("orders"), col("p05"), col("p95"), col("kept"),
        when(col("kept") > 0,
          Cols.q4((col("inside_cents").cast("double") / 100.0)
            / col("kept").cast("double"))).otherwise(0.0).as("trimmed_mean"),
        when(col("orders") > 0,
          Cols.q4((col("inside_cents").cast("double") / 100.0
              + col("below").cast("double") * col("p05")
              + col("above").cast("double") * col("p95"))
            / col("orders").cast("double"))).otherwise(0.0).as("winsorized_mean"))
  }

  /** Lead-lag cross-correlation between daily view volume and daily
    * purchase revenue — "do views lead purchases?" answered with Pearson r
    * at lags −1/0/+1 days (r at lag L correlates views on day d with
    * revenue on day d+L). Doctrine: the daily frame is calendar-bounded;
    * each lag is an EQUI-join of that frame to itself on `day + L` (no
    * window, no sort), and every moment (n, Σx, Σy, Σxy, Σx², Σy²) is an
    * exact integer sum — r is one fixed IEEE expression over the six
    * scalars, floor-quantized. sqrt is correctly rounded in IEEE 754, so
    * both engines produce identical bits. Degenerate variance reports 0. */
  def viewRevenueXcorr(events: DataFrame, lags: Seq[Int] = Seq(-1, 0, 1)): DataFrame = {
    // moments in WHOLE DOLLARS (cents div 100): Pearson r is scale-
    // invariant, and the squared daily sums would overflow 64-bit in
    // cents at sf0.1 already — at larger corpora raise the unit again
    val daily = events
      .select(expr("ts_sec div 86400").as("day"),
        (col("event_type") === "view").as("isv"),
        when(col("event_type") === "purchase", Cols.cents(col("value")))
          .otherwise(0L).as("rc"))
      .groupBy(col("day"))
      .agg(Cols.countWhen(col("isv")).as("x"),
        expr("sum(rc) div 100").as("y"))
    val perLag = lags.map { lag =>
      val a = daily.select(col("day"), col("x"))
      val b = daily.select((col("day") - lag).as("day"), col("y"))
      val m = a.join(b, Seq("day")).agg(
        count(lit(1)).as("n"), sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"), sum(col("y") * col("y")).as("syy"))
      val num = (col("n") * col("sxy") - col("sx") * col("sy")).cast("double")
      val vx = (col("n") * col("sxx") - col("sx") * col("sx")).cast("double")
      val vy = (col("n") * col("syy") - col("sy") * col("sy")).cast("double")
      m.select(lit(lag.toLong).as("lag_days"), col("n").as("days"),
        when(vx > 0 && vy > 0, Cols.q4(num / (sqrt(vx) * sqrt(vy))))
          .otherwise(0.0).as("pearson_r"))
    }
    perLag.reduce(_.unionAll(_)).orderBy(col("lag_days"))
  }

  /** Seasonality-adjusted daily anomalies: a day is anomalous when its
    * revenue sits more than two WEEKDAY-CONDITIONAL standard deviations
    * from its weekday's mean — the adjustment that keeps every Saturday
    * from flagging against a Monday baseline. Per-dow moments are exact
    * integer sums over the calendar-bounded daily frame; the z test runs
    * in double over those exact scalars ((n·y − Σy)² vs 4·(n·Σy² − (Σy)²),
    * products taken AFTER one exact long→double conversion so nothing
    * overflows), and the reported z uses the IEEE-exact sqrt. Weekdays
    * with fewer than `minDays` observations are not judged. */
  def seasonalAnomalies(orders: DataFrame, minDays: Long = 8L): DataFrame = {
    // daily totals in WHOLE DOLLARS (cents div 100): the per-dow Σy²
    // would overflow 64-bit in cents at sf0.1; the z statistic is
    // defined on the dollar grain (mirrored in the oracle)
    val daily = orders
      .select(Cols.tsSec(col("o_orderdate")).as("sec"),
        Cols.cents(col("o_totalprice")).as("cents"))
      .withColumn("day", expr("sec div 86400"))
      .groupBy(col("day")).agg(expr("sum(cents) div 100").as("y"))
      .withColumn("dow", (col("day") + 3) % 7)
    val stats = daily.groupBy(col("dow"))
      .agg(count(lit(1)).as("nd"), sum(col("y")).as("sy"),
        sum(col("y") * col("y")).as("syy"))
    val dev  = col("nd").cast("double") * col("y").cast("double") - col("sy").cast("double")
    val varN = (col("nd").cast("double") * col("syy").cast("double")
      - col("sy").cast("double") * col("sy").cast("double"))
    daily.join(broadcast(stats), Seq("dow"))
      .where(col("nd") >= minDays && varN > 0 && dev * dev > lit(4.0) * varN)
      .select((col("day") * 86400).as("day_sec"), col("dow"),
        col("y").cast("double").as("revenue_dollars"),
        col("nd").as("dow_days"),
        Cols.q4(dev / sqrt(varN)).as("z"))
      .orderBy(col("day_sec"))
  }

  /** floor(10^6 · P(Pois(1) ≤ k)) for k = 0..7 — the public Poisson(1)
    * CDF series (e^{-1}·Σ 1/i!), pinned as integers so the hash-to-weight
    * map is pure integer comparison in both engines. */
  private[graft] val PoissonCdf1e6: Seq[Long] =
    Seq(367879L, 735758L, 919698L, 981011L, 996340L, 999405L, 999916L, 999989L)

  /** Two-round Park–Miller (MINSTD, Lehmer 1951) integer mixer for the
    * bootstrap's per-(resample, key) uniform draw: pure int64 arithmetic
    * (every intermediate < 2^48, so Spark's wraparound multiply and
    * DuckDB's checked BIGINT agree exactly), ~50× cheaper per row than a
    * string-concat md5 — at ×R row explosion the hash IS the map-side
    * hot loop, so this is the difference between the explosion being
    * CPU-bound on md5 and being scan-bound. PortableHash (md5₄₈) remains
    * the doctrine for CONTENT keys (strings, dedup identity); this mixer
    * is for synthetic replicate streams keyed by (int, int). */
  private[graft] def minstdUniform1e6(key: Column, r: Column): Column =
    (((pmod(key, lit(2147483647L)) * 48271L % 2147483647L
      + r * 1000003L + 12345L) * 48271L % 2147483647L) % 1000000L)

  /** Deterministic Poisson-bootstrap confidence interval for the median
    * order total — uncertainty quantification WITHOUT nondeterministic
    * RNG: resample r gives row i the weight k where
    * [[minstdUniform1e6]]`(key, r)` falls in the k-th pinned Poisson(1)
    * CDF band ([[PoissonCdf1e6]]) — the standard Poisson bootstrap
    * (resample counts are iid Pois(1) in the n→∞ limit), made a pure
    * function of (resample, key) that any engine reproduces bit-exactly.
    * Each resample's weighted lower median comes from the
    * [[Relational.weightedQuantiles]] machinery run per-resample: 32
    * bounded (r, bucket) histograms, offset windows over the histogram
    * frames only, exact crossing-row selection — the fact table is never
    * sorted. The CI drops each tail's extreme resample (rank 2 and R−1 of
    * R = a ~94% interval at R = 32); the point estimate is the
    * interpolated p50 of the full data.
    *
    * Scale: the ×R row explosion happens map-side and collapses into the
    * per-(r, bucket) partial aggregation before any shuffle; everything
    * downstream of the histogram is R×buckets-bounded. The pre-explode
    * hash repartition matters at BOTH ends of the scale axis: a small
    * input (one parquet row-group → one scan split) would otherwise run
    * the ×R explosion + md5 lane single-task, and a huge one inherits
    * however few splits the scan chose; spreading the narrow pre-explosion
    * frame is a cheap shuffle that parallelizes everything downstream. */
  def bootstrapMedianCi(orders: DataFrame, resamples: Int = 32,
                        width: Double = 1000.0): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(resamples >= 4)
    val parts = orders.sparkSession.sparkContext.defaultParallelism
    val rows = orders.select(col("o_orderkey"),
        Cols.cents(col("o_totalprice")).as("cents"),
        floor(col("o_totalprice") / width).cast("long").as("bucket"))
      .repartition(parts, col("o_orderkey"))
      .withColumn("r", explode(sequence(lit(0), lit(resamples - 1))))
      .withColumn("u", minstdUniform1e6(col("o_orderkey"), col("r")))
    val w = PoissonCdf1e6.zipWithIndex
      .foldLeft(when(lit(false), 0L)) { case (acc, (t, k)) =>
        acc.when(col("u") < t, k.toLong)
      }.otherwise(PoissonCdf1e6.length.toLong)
    val weighted = rows.withColumn("w", w).where(col("w") > 0)
    val hist = weighted.groupBy(col("r"), col("bucket")).agg(sum(col("w")).as("bw"))
    val wPrev = Window.partitionBy(col("r")).orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = hist.select(col("r"), col("bucket"),
      coalesce(sum(col("bw")).over(wPrev), lit(0L)).as("off"), col("bw"),
      sum(col("bw")).over(Window.partitionBy(col("r"))).as("wtot"))
    val thr = expr("(wtot + 1) div 2")
    // each resample's crossing row lives in exactly ONE bucket — the one
    // whose cumulative band straddles the threshold. Join weighted rows to
    // that bucket only (R rows broadcast), so the per-bucket ranking
    // window sorts ~n/buckets rows per resample instead of the whole ×R
    // frame (the quantilesCont only-selected-rows-reach-selection rule;
    // measured ~1.5× on the full query via tools/BootProbe)
    val crossing = offsets.where(col("off") < thr && thr <= col("off") + col("bw"))
    val wBucket = Window.partitionBy(col("r"), col("bucket"))
      .orderBy(col("cents"), col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val med = weighted.join(broadcast(crossing), Seq("r", "bucket"))
      .select(col("r"), col("cents"), col("w"), col("wtot"),
        (col("off") + sum(col("w")).over(wBucket)).as("cw"))
      .where(col("cw") >= thr && col("cw") - col("w") < thr)
      .groupBy(col("r")).agg(min(col("cents")).as("med_cents"))
    val ranked = med.select(col("med_cents"),
      row_number().over(Window.orderBy(col("med_cents"))).as("rk"),
      count(lit(1)).over(Window.partitionBy()).as("nr"))
    val point = Relational.quantilesCont(orders, width, Seq(("p50", 1L, 2L)))
      .agg(min(col("value")).as("median"))
    // `resamples` in the output is the count of resamples that PRODUCED a
    // median (nr), not the requested R: on tiny inputs a resample can draw
    // all-zero Poisson weights and vanish. Below nr = 4 the rank-2 /
    // rank-(nr−1) cuts invert or go null, so emit no interval row at all —
    // the ksTest empty-sample convention
    ranked.agg(
        max(col("nr")).as("resamples"),
        (min(when(col("rk") === 2, col("med_cents"))).cast("double") / 100.0).as("ci_lo"),
        (min(when(col("rk") === col("nr") - 1, col("med_cents"))).cast("double") / 100.0).as("ci_hi"))
      .where(col("resamples") >= 4)
      .crossJoin(broadcast(point))
      .select(col("resamples"), col("median"), col("ci_lo"), col("ci_hi"))
  }

  /** Per-type burstiness (Fano factor — variance-to-mean ratio of the
    * hourly arrival counts over the hours the type occurred): ≈1 is
    * Poisson-like traffic, ≫1 is bursty (campaign spikes, retry storms),
    * ≪1 is throttled/regular — the dispersion diagnostic behind alert
    * threshold choice. Moments are exact longs over the calendar-bounded
    * hourly frame; the sample-variance/mean ratio is one fixed IEEE
    * expression per type (guarded for single-hour types). */
  def burstiness(events: DataFrame): DataFrame = {
    // null-category doctrine (r14): per-type dispersion — known types only
    val hourly = events.where(col("event_type").isNotNull)
      .groupBy(col("event_type"),
        (col("ts_sec") - pmod(col("ts_sec"), lit(3600L))).as("hour_sec"))
      .agg(count(lit(1)).as("n"))
    val m = hourly.groupBy(col("event_type"))
      .agg(count(lit(1)).as("h"), sum(col("n")).as("sn"),
        sum(col("n") * col("n")).as("snn"))
    val vnum = (col("h") * col("snn") - col("sn") * col("sn")).cast("double")
    val vden = (col("h") * (col("h") - 1L)).cast("double")
    val mean = col("sn").cast("double") / col("h").cast("double")
    m.select(col("event_type"), col("h").as("hours"), col("sn").as("events_"),
        Cols.q4(mean).as("mean_per_hour"),
        when(col("h") > 1, Cols.q4(vnum / vden / mean)).otherwise(lit(0.0))
          .as("fano"))
      .orderBy(col("event_type"))
  }

  /** Day-of-week seasonality profile of order revenue: per-weekday order
    * volume, revenue, and a seasonality index = (that weekday's
    * revenue-per-day) / (overall revenue-per-day). The weekday is derived
    * from the epoch-day number — `(days_since_1970 + 3) mod 7`, 0 = Monday
    * (1970-01-01 was a Thursday) — pure integer arithmetic that both
    * engines evaluate identically, instead of the engine-specific
    * `dayofweek` whose origin differs across dialects. The index is a
    * cross-multiplied integer ratio quantized once. Two hash aggregations,
    * keys bounded at 7. */
  def dowSeasonality(orders: DataFrame): DataFrame = {
    val epochDay = expr("CAST(sec AS BIGINT) div 86400")
    val daily = orders
      .select(Cols.tsSec(col("o_orderdate")).as("sec"),
        Cols.cents(col("o_totalprice")).as("cents"))
      .withColumn("day", epochDay)
      .withColumn("dow", (col("day") + 3) % 7)
    val perDow = daily.groupBy(col("dow"))
      .agg(countDistinct(col("day")).as("days"),
        count(lit(1)).as("orders"),
        sum(col("cents")).as("cents"))
    val totals = perDow.agg(sum(col("days")).as("tdays"), sum(col("cents")).as("tcents"))
    val names = Seq("mon", "tue", "wed", "thu", "fri", "sat", "sun")
    val dowName = names.zipWithIndex.foldLeft(when(lit(false), "")) {
      case (acc, (nm, i)) => acc.when(col("dow") === i, nm)
    }
    perDow.crossJoin(broadcast(totals))
      .select(col("dow"), dowName.as("dow_name"), col("days"), col("orders"),
        (col("cents").cast("double") / 100.0).as("revenue"),
        Cols.q4((col("cents") * col("tdays")).cast("double")
          / (col("days") * col("tcents")).cast("double")).as("seasonality"))
      .orderBy(col("dow"))
  }
}
