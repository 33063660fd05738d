package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.functions.Cols

/** Distributed two-sample hypothesis tests, rank statistics, and
  * censoring-aware survival estimation — the "is this split / arm /
  * cohort actually different?" family every experimentation and
  * data-curation pipeline needs beside the point estimates
  * ([[Stats.abConversionLift]], [[Stats.sampleRatioCheck]]).
  *
  * Everything here follows the repo's cross-engine exactness doctrine:
  * the test statistics are assembled from INTEGER counts, cumulative
  * counts, and rank sums (exact on any engine, partition-order-free),
  * with at most one final fixed IEEE double expression per output row,
  * floor-quantized. No log/ln anywhere (not correctly rounded across
  * engines); the only transcendental is sqrt, which IEEE 754 requires
  * correctly rounded.
  *
  * Scale shape shared by the two-sample tests: the value stream collapses
  * to a distinct-value count frame first (one hash agg); cumulative
  * counts come from the same bucketed two-stage prefix machinery as
  * [[Relational.decilesByValue]] — a global window ONLY over the
  * 2^bucketBits-times-smaller bucket histogram, per-value ranking
  * partitioned by bucket — so nothing corpus-sized is globally sorted. */
object Hypothesis {

  /** Per-distinct-value two-sample cumulative frame over order prices:
    * sample 1 = urgent/high-priority orders, sample 2 = the rest (a
    * deterministic, meaningful split — "do expedited orders price
    * differently?"). Returns one row per distinct cents value with
    * per-sample counts (c1, c2), INCLUSIVE cumulative counts (cum1,
    * cum2), and the sample totals (n1, n2) on every row. */
  private[graft] def twoSampleCumFrame(orders: DataFrame,
                                       bucketBits: Int = 12): DataFrame = {
    val arm1 = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    val vals = Spread.byKey(orders, col("o_orderkey")) // value-agg fan-out, no-op at scale
      .select(Cols.cents(col("o_totalprice")).as("v"), arm1.as("a1"))
      .groupBy(col("v"))
      .agg(Cols.countWhen(col("a1")).as("c1"),
        Cols.countWhen(!col("a1")).as("c2"))
      .withColumn("bkt", expr(s"v div ${1L << bucketBits}"))
    val hist = vals.groupBy(col("bkt"))
      .agg(sum(col("c1")).as("s1"), sum(col("c2")).as("s2"))
    val wPrev = Window.orderBy(col("bkt"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = hist.select(col("bkt"),
      coalesce(sum(col("s1")).over(wPrev), lit(0L)).as("off1"),
      coalesce(sum(col("s2")).over(wPrev), lit(0L)).as("off2"))
    val totals = hist.agg(sum(col("s1")).as("n1"), sum(col("s2")).as("n2"))
    val wBkt = Window.partitionBy(col("bkt")).orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    vals.join(broadcast(offsets), Seq("bkt"))
      .crossJoin(broadcast(totals))
      .select(col("v"), col("c1"), col("c2"),
        (col("off1") + sum(col("c1")).over(wBkt)).as("cum1"),
        (col("off2") + sum(col("c2")).over(wBkt)).as("cum2"),
        col("n1"), col("n2"))
  }

  /** Two-sample Kolmogorov–Smirnov test (Smirnov 1939) between
    * urgent/high-priority and normal-priority order prices. The statistic
    * D = max over distinct values v of |F1(v) − F2(v)| is evaluated in
    * PURE INTEGER cross-multiplied form — |cum1·n2 − cum2·n1| — so the
    * max is exact; the single division happens once on the selected
    * maximum. Products run in DECIMAL(38,0) (HUGEINT in the oracle): at
    * corpus scale cum·n overflows int64 long before the distinct-value
    * frame is large (n per side ≳ 3·10⁹), and 128-bit integer products
    * stay exact far past any real row count.
    *
    * Output: one row with the sample sizes, D (floor-1e6-quantized), the
    * α=0.05 critical value c·sqrt((n1+n2)/(n1·n2)) with c = 1.358
    * (the asymptotic Kolmogorov quantile), and the reject flag comparing
    * the two QUANTIZED values (deterministic on both engines). */
  def ksTest(orders: DataFrame): DataFrame = {
    val cum = twoSampleCumFrame(orders)
    val dec = DecimalType(38, 0)
    val dnum = abs(col("cum1").cast(dec) * col("n2").cast(dec)
      - col("cum2").cast(dec) * col("n1").cast(dec))
    val agg = cum.agg(max(dnum).as("dnum"),
      first(col("n1")).as("n1"), first(col("n2")).as("n2"))
    val n1d = col("n1").cast("double")
    val n2d = col("n2").cast("double")
    val ks = floor(col("dnum").cast("double") / (n1d * n2d) * 1e6) / 1e6
    val crit = floor(lit(1.358) * sqrt((n1d + n2d) / (n1d * n2d)) * 1e6) / 1e6
    // an EMPTY sample is not a testable split: emit no verdict row rather
    // than a NaN statistic (0/0 in double) the caller might compare
    agg.where(col("n1") > 0 && col("n2") > 0)
      .select(col("n1"), col("n2"), ks.as("ks_stat"), crit.as("critical"),
        (ks > crit).as("reject"))
  }

  /** Mann–Whitney U / Wilcoxon rank-sum test (Mann & Whitney 1947) on the
    * same priority split, with the tie-corrected normal approximation and
    * the rank-sum AUC (U/(n1·n2) — the probability a random urgent order
    * out-prices a random normal one; the two-sample test and the ROC AUC
    * are the same statistic). Ties take midranks; every rank quantity is
    * kept DOUBLED so midranks stay integral: R2(v) = 2·cumBefore + t + 1
    * (t = ties at v), W2 = Σ c1·R2, u2 = 2·U = W2 − n1·(n1+1). The tie
    * correction needs Σ(t³−t), exact in int64 here (≤ n³; move to
    * DECIMAL(38,0) past n ≈ 2·10⁶ concentrated in one value — the
    * scaladoc bound, not a fixture concern).
    *
    * Output: one row — n1, n2, u2 (exact long), auc (floor-1e6), z
    * (floor-1e4; the continuity-uncorrected tie-adjusted normal score). */
  def rankSumTest(orders: DataFrame): DataFrame = {
    val cum = twoSampleCumFrame(orders)
    val t = col("c1") + col("c2")
    val r2 = lit(2L) * (col("cum1") - col("c1") + col("cum2") - col("c2")) + t + 1L
    val agg = cum.agg(
      sum(col("c1") * r2).as("w2"),
      sum(t * t * t - t).as("ties3"),
      first(col("n1")).as("n1"), first(col("n2")).as("n2"))
    val n1d = col("n1").cast("double")
    val n2d = col("n2").cast("double")
    val nd = n1d + n2d
    val u2 = (col("w2") - col("n1") * (col("n1") + 1L)).as("u2")
    val aucD = floor(col("u2").cast("double") / (lit(2.0) * n1d * n2d) * 1e6) / 1e6
    val varU = (n1d * n2d / 12.0) *
      ((nd + 1.0) - col("ties3").cast("double") / (nd * (nd - 1.0)))
    // fully-tied input (every value equal) makes varU = 0 and the z divide
    // 0/0 → NaN; zero variance means zero signal, so emit z = 0 — the same
    // zero-signal convention as kendallTauDaily's fully-tied axis
    val z = when(varU > 0,
      floor((col("u2").cast("double") - n1d * n2d) / 2.0 / sqrt(varU)
        * 1e4) / 1e4).otherwise(lit(0.0))
    agg.where(col("n1") > 0 && col("n2") > 0) // same empty-sample contract as ksTest
      .select(col("n1"), col("n2"), col("ties3"), u2)
      .select(col("n1"), col("n2"), col("u2"), aucD.as("auc"), z.as("z"))
  }

  /** Kendall rank correlation (tau-b, Kendall 1938) between daily view
    * traffic and daily purchase revenue — the robust "do busy days earn
    * more?" monotone-association check beside the Pearson-flavored
    * [[Stats.viewRevenueXcorr]]. Concordant / discordant / tied pair
    * counts are exact longs from the same Okcan & Riedewald blocked
    * upper-triangle self-join as [[Stats.theilSenDailyRevenue]] (pairs
    * spread over B(B+1)/2 equi-join keys — never a cartesian, and the
    * paired frame is the BOUNDED daily aggregate, which grows with the
    * calendar, not the corpus). tau-b = (C−D)/sqrt((n0−tx)(n0−ty)) is one
    * fixed IEEE expression on the exact counts, floor-1e4-quantized. */
  def kendallTauDaily(events: DataFrame, numBlocks: Int = 4): DataFrame = {
    val daily = events
      .withColumn("day", expr("ts_sec div 86400"))
      .groupBy(col("day"))
      .agg(Cols.countWhen(col("event_type") === "view").as("x"),
        coalesce(sum(when(col("event_type") === "purchase",
          Cols.cents(col("value")))), lit(0L)).as("y"))
      .localCheckpoint() // both sides of the blocked pair join
    val coded = daily.select(col("day"), col("x"), col("y"),
      (Dedup.PortableHash(concat(lit("kt:"), col("day").cast("string")))
        % numBlocks).as("blk"))
    val l = coded.withColumn("bj", explode(sequence(col("blk"), lit(numBlocks - 1))))
      .select(col("blk").as("bi"), col("bj"),
        col("day").as("d1"), col("x").as("x1"), col("y").as("y1"))
    val r = coded.withColumn("bi", explode(sequence(lit(0), col("blk"))))
      .select(col("bi").as("ri"), col("blk").as("rj"),
        col("day").as("d2"), col("x").as("x2"), col("y").as("y2"))
    val pairs = l.join(r, col("bi") === col("ri") && col("bj") === col("rj"))
      .where(col("bi") =!= col("bj") || col("d1") < col("d2"))
    // exact integer sign product: daily aggregates are calendar-bounded,
    // so dx·dy stays far inside int64 at any corpus scale
    val prod = (col("x2") - col("x1")) * (col("y2") - col("y1"))
    val agg = pairs.agg(
      count(lit(1)).as("n0"),
      Cols.countWhen(prod > 0L).as("concordant"),
      Cols.countWhen(prod < 0L).as("discordant"),
      Cols.countWhen(col("x1") === col("x2")).as("tie_x"),
      Cols.countWhen(col("y1") === col("y2")).as("tie_y"))
    val tau = floor((col("concordant") - col("discordant")).cast("double")
      / sqrt((col("n0") - col("tie_x")).cast("double")
        * (col("n0") - col("tie_y")).cast("double")) * 1e4) / 1e4
    // a fully-tied axis has no rank signal: tau-b's denominator is 0 and
    // the double division yields NaN — report 0.0 ("no association
    // measurable") instead, mirroring the zero-variance convention of
    // Spectral.dimCorrelations
    val tauSafe = when(col("n0") > col("tie_x") && col("n0") > col("tie_y"), tau)
      .otherwise(lit(0.0))
    agg.select(col("n0"), col("concordant"), col("discordant"),
      col("tie_x"), col("tie_y"), tauSafe.as("tau_b"))
  }

  /** CUPED variance reduction (Deng, Xu, Kohavi & Walker 2013) for the
    * purchase-revenue A/B metric: the experiment window is the second
    * half of the event time range, the pre-period covariate X is each
    * user's first-half purchase revenue, and the adjusted metric is
    * Y − θ(X − X̄) with the pooled θ = cov(X,Y)/var(X). Reported beside
    * the raw lift so the reader sees both the point estimate and how
    * much variance the pre-period explains (ρ² — the fraction CUPED
    * removes).
    *
    * Exactness: X and Y are exact integer DOLLARS per user (cents div
    * 100 — the [[Stats.viewRevenueXcorr]] overflow rule for squared
    * sums); all moments are exact long sums; θ, the adjusted means, and
    * ρ² are single fixed IEEE expressions over those scalars. One hash
    * agg to the user frame, one agg to a 1-row moment frame — nothing
    * else. */
  def cupedLift(events: DataFrame): DataFrame = {
    val mid = events.agg(
      expr("(min(ts_sec) + max(ts_sec)) div 2").as("tmid"))
    val users = events.where(col("user_id").isNotNull)
      .crossJoin(broadcast(mid))
      .select(col("user_id"),
        when(col("event_type") === "purchase" && col("ts_sec") < col("tmid"),
          Cols.cents(col("value"))).otherwise(0L).as("xc"),
        when(col("event_type") === "purchase" && col("ts_sec") >= col("tmid"),
          Cols.cents(col("value"))).otherwise(0L).as("yc"))
      .groupBy(col("user_id"))
      .agg(expr("sum(xc) div 100").as("x"), expr("sum(yc) div 100").as("y"))
      .select(
        (Dedup.PortableHash(concat(lit("ab:"), col("user_id").cast("string"))) % 2)
          .as("arm"),
        col("x"), col("y"))
    val m = users.agg(
      count(lit(1)).as("n"), sum(col("x")).as("sx"), sum(col("y")).as("sy"),
      sum(col("x") * col("y")).as("sxy"), sum(col("x") * col("x")).as("sxx"),
      sum(col("y") * col("y")).as("syy"),
      Cols.countWhen(col("arm") === 0).as("n0"),
      Cols.countWhen(col("arm") === 1).as("n1"),
      sum(when(col("arm") === 0, col("x")).otherwise(0L)).as("sx0"),
      sum(when(col("arm") === 1, col("x")).otherwise(0L)).as("sx1"),
      sum(when(col("arm") === 0, col("y")).otherwise(0L)).as("sy0"),
      sum(when(col("arm") === 1, col("y")).otherwise(0L)).as("sy1"))
    val num = (col("n") * col("sxy") - col("sx") * col("sy")).cast("double")
    val vx = (col("n") * col("sxx") - col("sx") * col("sx")).cast("double")
    val vy = (col("n") * col("syy") - col("sy") * col("sy")).cast("double")
    val theta = when(vx > 0, num / vx).otherwise(lit(0.0))
    val meanX = col("sx").cast("double") / col("n").cast("double")
    def adj(syA: String, sxA: String, nA: String) =
      (col(syA).cast("double") - theta *
        (col(sxA).cast("double") - col(nA).cast("double") * meanX)) /
        col(nA).cast("double")
    val liftRaw = col("sy1").cast("double") / col("n1").cast("double") -
      col("sy0").cast("double") / col("n0").cast("double")
    val rho2 = when(vx > 0 && vy > 0, num * num / (vx * vy)).otherwise(lit(0.0))
    // a degenerate hash split (every user in one arm) has no lift to
    // report: emit no verdict row rather than NaN lifts — the same
    // empty-sample contract as ksTest/rankSumTest
    m.where(col("n0") > 0 && col("n1") > 0)
      .select(col("n").as("users"), col("n0"), col("n1"),
      (floor(theta * 1e6) / 1e6).as("theta"),
      Cols.q4(liftRaw).as("lift_raw"),
      Cols.q4(adj("sy1", "sx1", "n1") - adj("sy0", "sx0", "n0")).as("lift_cuped"),
      Cols.q4(rho2).as("var_reduction"))
  }

  /** Mantel–Haenszel stratified risk ratio (Mantel & Haenszel 1959) for
    * the A/B conversion metric, stratified by user activity band (1–2,
    * 3–5, 6+ events) — the pooled "is the effect real once you hold
    * engagement constant?" estimate that guards against Simpson
    * reversal, beside per-stratum 2×2 tables and risk ratios.
    *
    * Exactness: all cell counts are exact longs; each stratum's MH
    * numerator a·(c+d)/n and denominator c·(a+b)/n are floor-quantized
    * to integer 1e6 units BEFORE the pooled sum (bounded strata, so the
    * quantization error is < |strata|·1e-6 — the no-double-sums rule);
    * risk ratios are single fixed IEEE expressions, floor-1e4.
    *
    * Shape: one hash agg to the user frame, one to the |strata|×2 table;
    * the pooled row folds the bounded stratum frame. */
  def mantelHaenszel(events: DataFrame): DataFrame = {
    val users = events.where(col("user_id").isNotNull)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_ev"),
        Cols.countWhen(col("event_type") === "purchase").as("purchases"))
      .select(
        (Dedup.PortableHash(concat(lit("ab:"), col("user_id").cast("string"))) % 2)
          .as("arm"),
        when(col("n_ev") <= 2, 0L).when(col("n_ev") <= 5, 1L).otherwise(2L)
          .as("stratum"),
        when(col("purchases") > 0, 1L).otherwise(0L).as("conv"))
    val cells = users.groupBy(col("stratum"))
      .agg(Cols.countWhen(col("arm") === 1 && col("conv") === 1).as("a"),
        Cols.countWhen(col("arm") === 1 && col("conv") === 0).as("b"),
        Cols.countWhen(col("arm") === 0 && col("conv") === 1).as("c"),
        Cols.countWhen(col("arm") === 0 && col("conv") === 0).as("d"))
      .localCheckpoint() // consumed by the stratum rows AND the pooled fold
    def rr(a: Column, b: Column, c: Column, d: Column): Column =
      when(c > 0 && a + b > 0,
        Cols.q4((a * (c + d)).cast("double") / ((a + b) * c).cast("double")))
        .otherwise(lit(0.0))
    val perStratum = cells.select(col("stratum"), col("a"), col("b"),
      col("c"), col("d"), rr(col("a"), col("b"), col("c"), col("d")).as("risk_ratio"))
    val nI = (col("a") + col("b") + col("c") + col("d")).cast("double")
    val pooled = cells.select(
        floor(col("a").cast("double") * (col("c") + col("d")).cast("double") / nI
          * 1e6).cast("long").as("nu"),
        floor(col("c").cast("double") * (col("a") + col("b")).cast("double") / nI
          * 1e6).cast("long").as("de"),
        col("a"), col("b"), col("c"), col("d"))
      .agg(sum(col("nu")).as("nu"), sum(col("de")).as("de"),
        sum(col("a")).as("a"), sum(col("b")).as("b"),
        sum(col("c")).as("c"), sum(col("d")).as("d"))
      .select(lit(99L).as("stratum"), col("a"), col("b"), col("c"), col("d"),
        when(col("de") > 0,
          Cols.q4(col("nu").cast("double") / col("de").cast("double")))
          .otherwise(lit(0.0)).as("risk_ratio"))
    perStratum.unionAll(pooled).orderBy(col("stratum"))
  }

  /** Quantile treatment effects: the per-quantile difference between the
    * treatment and control purchase-value distributions — what a mean
    * lift hides when the effect lives in one tail. Reuses
    * [[Relational.quantilesContByGroup]]'s exact interpolated machinery
    * (histogram-offset ranks, integer selection positions, one mirrored
    * IEEE interpolation) with the hash arm as the group; the pivot and
    * the difference run on the bounded arm×quantile frame. */
  def quantileTreatmentEffect(events: DataFrame): DataFrame = {
    val purchases = events
      .where(col("user_id").isNotNull && col("event_type") === "purchase"
        && col("value").isNotNull)
      .select(
        (Dedup.PortableHash(concat(lit("ab:"), col("user_id").cast("string"))) % 2)
          .as("arm"),
        col("event_id").as("o_orderkey"), col("value").as("o_totalprice"))
    Relational.quantilesContByGroup(purchases, "arm", width = 50.0)
      .groupBy(col("quantile"))
      .agg(min(when(col("arm") === 0, col("value"))).as("control"),
        min(when(col("arm") === 1, col("value"))).as("treatment"))
      .select(col("quantile"), col("control"), col("treatment"),
        Cols.q4(col("treatment") - col("control")).as("qte"))
      .orderBy(col("quantile"))
  }

  /** Empirical-Bayes shrinkage of per-nation customer conversion rates
    * (beta-binomial method of moments — Robbins 1956; the Efron & Morris
    * batting-average estimator): small nations' noisy rates pull toward
    * the cross-nation mean, big nations keep their own signal. The prior
    * (α, β) comes from the unweighted mean and variance of the group
    * rates; the posterior mean is (x + α)/(n + α + β).
    *
    * Exactness: x, n exact longs; each group rate is one division; the
    * cross-group mean and variance sums are floor-quantized to integer
    * 1e9 units per group BEFORE summing (bounded |nations| terms — the
    * no-double-sums rule), and everything downstream is a fixed IEEE
    * expression over those scalars. Degenerate prior (v ≤ 0 or at the
    * Bernoulli bound) falls back to no shrinkage. */
  def ebShrinkage(spark: org.apache.spark.sql.SparkSession, dir: String): DataFrame = {
    val cust = graft.sources.Tables.customer(spark, dir)
      .select(col("c_custkey"), col("c_nationkey"))
    val buyers = graft.sources.Tables.orders(spark, dir)
      .select(col("o_custkey").as("c_custkey")).distinct()
    val groups = cust
      .join(buyers.withColumn("conv", lit(1L)), Seq("c_custkey"), "left")
      .groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("n"),
        sum(coalesce(col("conv"), lit(0L))).as("x"))
      .localCheckpoint() // three consumers: mean pass, var pass, output
    val g = broadcast(groups.agg(count(lit(1)).as("gn"),
      sum(floor(col("x").cast("double") / col("n").cast("double") * 1e9)
        .cast("long")).as("su")))
    val mu = col("su").cast("double") / 1e9 / col("gn").cast("double")
    val vsum = groups.crossJoin(g)
      .select(floor((col("x").cast("double") / col("n").cast("double") - mu)
        * (col("x").cast("double") / col("n").cast("double") - mu) * 1e9)
        .cast("long").as("vq"), col("gn"), col("su"))
      .groupBy(col("gn"), col("su")).agg(sum(col("vq")).as("sv"))
    val v = col("sv").cast("double") / 1e9 / col("gn").cast("double")
    val prior = broadcast(vsum.select(col("gn"), col("su"), col("sv"),
      mu.as("mu"), v.as("v"),
      when(v > 0 && mu * (lit(1.0) - mu) > v,
        mu * (lit(1.0) - mu) / v - lit(1.0)).otherwise(lit(0.0)).as("ab")))
    groups.crossJoin(prior)
      .select(col("c_nationkey"), col("n").as("customers"), col("x").as("buyers"),
        Cols.q4(col("x").cast("double") / col("n").cast("double") * 100.0)
          .as("rate_pct"),
        Cols.q4((col("x").cast("double") + col("mu") * col("ab"))
          / (col("n").cast("double") + col("ab")) * 100.0).as("shrunk_pct"))
      .orderBy(col("c_nationkey"))
  }

  /** Fixed-horizon A/B power analysis: the per-arm sample size needed to
    * detect a 10% relative reduction of the NON-conversion rate
    * (p₂ = p₁ + 0.1·(1−p₁) — a target that stays inside (p₁, 1) for any
    * observed rate, unlike a naive 1.1·p₁) at α = 0.05 (two-sided),
    * power = 0.8 — the "how long must this test run" planning readout,
    * from the standard two-proportion formula
    * n = (z_α·sqrt(2·p̄·(1−p̄)) + z_β·sqrt(p₁q₁ + p₂q₂))² / δ². The
    * randomization unit is the USER-DAY (this fixture's users are all
    * eventually converting, so per-user conversion is degenerate at 1.0;
    * daily conversion is the metric a high-frequency product actually
    * tests). Exact counts in; one fixed IEEE expression out, with the
    * pinned z constants (1.96, 0.8416), ceiling'd to an exact integer. */
  def powerAnalysis(events: DataFrame): DataFrame = {
    val users = events.where(col("user_id").isNotNull)
      .groupBy(col("user_id"), expr("ts_sec div 86400").as("d"))
      .agg(Cols.countWhen(col("event_type") === "purchase").as("p"))
      .agg(count(lit(1)).as("n"), Cols.countWhen(col("p") > 0).as("x"))
    val p1 = col("x").cast("double") / col("n").cast("double")
    val p2 = p1 + lit(0.1) * (lit(1.0) - p1)
    val pbar = (p1 + p2) / 2.0
    val delta = p2 - p1
    val nReq = (lit(1.96) * sqrt(lit(2.0) * pbar * (lit(1.0) - pbar))
      + lit(0.8416) * sqrt(p1 * (lit(1.0) - p1) + p2 * (lit(1.0) - p2)))
    // a saturated base rate (every unit converts) leaves no detectable
    // delta: n_per_arm is reported 0 rather than a 0/0 NaN ceiling
    users.select(col("n").as("units"), col("x").as("converters"),
      Cols.q4(p1 * 100.0).as("base_rate_pct"),
      Cols.q4(p2 * 100.0).as("target_rate_pct"),
      when(col("x") < col("n"),
        ceil(nReq * nReq / (delta * delta)).cast("long"))
        .otherwise(lit(0L)).as("n_per_arm"))
  }

  /** Delete-group jackknife confidence interval (Quenouille 1956; the
    * "bucketed jackknife" every large A/B platform uses for ratio
    * metrics, where the iid-variance formula is wrong under per-user
    * correlation): users hash into B buckets; each leave-one-bucket-out
    * replicate recomputes the conversion rate from TOTALS MINUS that
    * bucket (no rescan — the bucket frame is B rows); the jackknife
    * variance is (B−1)/B · Σ(rateᵢ − mean)².
    *
    * Exactness: bucket counts are exact longs; replicate rates are one
    * division each; the replicate mean and the variance both sum
    * floor-quantized integer units (1e12 / 1e15 grains over B = 32
    * bounded terms — the coarser variance grain keeps worst-case
    * replicate spreads inside int64 while leaving the reported interval
    * ~7 decimal digits of headroom); sqrt is IEEE-exact; the interval is
    * one fixed expression. */
  def jackknifeRateCi(events: DataFrame, buckets: Int = 32): DataFrame = {
    val users = events.where(col("user_id").isNotNull)
      .groupBy(col("user_id"))
      .agg(Cols.countWhen(col("event_type") === "purchase").as("p"))
      .select(
        (Dedup.PortableHash(concat(lit("jk:"), col("user_id").cast("string")))
          % buckets).as("b"),
        when(col("p") > 0, 1L).otherwise(0L).as("conv"))
    val perB = users.groupBy(col("b"))
      .agg(count(lit(1)).as("n"), sum(col("conv")).as("x"))
    val tot = perB.agg(sum(col("n")).as("nn"), sum(col("x")).as("xx"),
      count(lit(1)).as("bb"))
    // a bucket holding the ENTIRE population (tiny inputs) would make its
    // leave-one-out replicate 0/0; such a replicate carries no resampling
    // information and is excluded (the jackknife needs B ≥ 2 real groups)
    val reps = perB.crossJoin(broadcast(tot))
      .where(col("n") < col("nn"))
      .select(col("nn"), col("xx"), col("bb"),
        ((col("xx") - col("x")).cast("double")
          / (col("nn") - col("n")).cast("double")).as("ri"))
    val mq = reps.groupBy(col("nn"), col("xx"), col("bb"))
      .agg(sum(floor(col("ri") * 1e12).cast("long")).as("sq"))
    val vq = reps.crossJoin(broadcast(mq.select(col("sq"))))
      .select(col("nn"), col("xx"), col("bb"),
        floor((col("ri") - col("sq").cast("double") / 1e12 / col("bb").cast("double"))
          * (col("ri") - col("sq").cast("double") / 1e12 / col("bb").cast("double"))
          * 1e15).cast("long").as("t"))
      .groupBy(col("nn"), col("xx"), col("bb")).agg(sum(col("t")).as("sv"))
    val rate = col("xx").cast("double") / col("nn").cast("double")
    val se = sqrt((col("bb") - 1L).cast("double") / col("bb").cast("double")
      * (col("sv").cast("double") / 1e15))
    vq.select(col("nn").as("users"), col("xx").as("converters"),
      Cols.q4(rate * 100.0).as("rate_pct"),
      Cols.q4((rate - lit(1.96) * se) * 100.0).as("ci_lo_pct"),
      Cols.q4((rate + lit(1.96) * se) * 100.0).as("ci_hi_pct"))
  }

  /** Kaplan–Meier survival estimator (Kaplan & Meier 1958) for
    * time-to-first-purchase per user, right-censored at each
    * non-converting user's last observed event — the churn / conversion
    * "how long until they buy?" curve with censoring handled correctly
    * (dropping non-converters would bias the curve optimistic; treating
    * them as never-converting, pessimistic).
    *
    * Exactness: S(h) = Π_{t ≤ h} (1 − d_t/n_t). Each factor is one exact
    * division (d_t, n_t integer counts; n_t = N − |obs < t| from the same
    * bucketed two-stage prefix as [[twoSampleCumFrame]] — no global
    * window over the user frame). The product folds the factors in
    * ASCENDING-t order on both engines (IEEE multiplication is correctly
    * rounded, so an identically-ordered fold is bit-identical; this is
    * the one place the repo multiplies doubles across rows, and the
    * fixed fold order is what makes it legal). Emitted survival is
    * floor-1e6-quantized.
    *
    * Scale shape: users collapse to one row each (hash agg), then to the
    * distinct observed-duration frame — bounded by the time grain, not
    * the corpus. The per-horizon factor lists are collected only over
    * that bounded frame (|factors ≤ h| elements); at a finer time grain
    * cap the factor count by pre-bucketing durations. */
  def survivalKm(events: DataFrame,
                 horizons: Seq[Long] = Seq(60L, 300L, 1800L, 3600L, 21600L, 86400L)): DataFrame = {
    val users = events.where(col("user_id").isNotNull)
      .groupBy(col("user_id"))
      .agg(min(col("ts_sec")).as("t0"), max(col("ts_sec")).as("tl"),
        min(when(col("event_type") === "purchase", col("ts_sec"))).as("tp"))
      .select(
        when(col("tp").isNotNull, col("tp") - col("t0"))
          .otherwise(col("tl") - col("t0")).as("obs"),
        col("tp").isNotNull.as("ev"))
    val vals = users.groupBy(col("obs"))
      .agg(count(lit(1)).as("c"), Cols.countWhen(col("ev")).as("d"))
      .withColumn("bkt", expr("obs div 4096"))
    val hist = vals.groupBy(col("bkt")).agg(sum(col("c")).as("s"))
    val wPrev = Window.orderBy(col("bkt"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = hist.select(col("bkt"),
      coalesce(sum(col("s")).over(wPrev), lit(0L)).as("off"))
    val tot = hist.agg(sum(col("s")).as("nn"))
    val wB = Window.partitionBy(col("bkt")).orderBy(col("obs"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val cum = vals.join(broadcast(offsets), Seq("bkt"))
      .crossJoin(broadcast(tot))
      .select(col("obs"), col("d"),
        (col("off") + coalesce(sum(col("c")).over(wB), lit(0L))).as("cb"),
        col("nn"))
    val factors = cum.where(col("d") > 0)
      .select(col("obs").as("te"), col("d"), col("nn"),
        (lit(1.0) - col("d").cast("double")
          / (col("nn") - col("cb")).cast("double")).as("f"))
    val hz = factors
      .withColumn("h", explode(array(horizons.map(lit): _*)))
      .where(col("te") <= col("h"))
    hz.groupBy(col("h"))
      .agg(first(col("nn")).as("cohort"), sum(col("d")).as("events"),
        (floor(aggregate(
          transform(sort_array(collect_list(struct(col("te"), col("f")))),
            x => x.getField("f")),
          lit(1.0), (acc, x) => acc * x) * 1e6) / 1e6).as("survival"))
      .orderBy(col("h"))
  }

  /** Pearson chi-square test of independence (with Cramér's V effect
    * size) between event type and day-of-week — "does the action mix
    * shift across the week?", the contingency-table sibling of the
    * goodness-of-fit [[Stats.sampleRatioCheck]]. Observed counts, row /
    * column totals, and N are exact longs; each cell's (o−e)²/e runs as
    * ONE fixed IEEE sequence (e = rowTot·colTot/N in doubles) and is
    * floor-quantized to integer 1e6 units BEFORE the sum — summing exact
    * longs instead of raw doubles keeps the total partition-order-free
    * (the repo's standing no-double-sums rule; the quantization error is
    * bounded by |cells|·1e-6, well under the emitted 1e-4 grain).
    *
    * Shape: one hash agg to the bounded |types|×7 table; everything
    * downstream (margins via windows, the cell sum) runs on that bounded
    * frame. Output: one row — n, table dims, chi2 (1e4-floored), dof,
    * and Cramér's V = sqrt(chi2/(n·min(r−1,c−1))) (1e4-floored). */
  def chisqIndependence(events: DataFrame): DataFrame = {
    // null-category doctrine (r14, the typeMixDrift grid precedent): a
    // null type level cannot match the completed grid's equi-join, so its
    // row marginal collapses to 0 and e = 0 divides by zero — known types
    // only, mirrored in the oracle
    val observed = events.where(col("event_type").isNotNull)
      .withColumn("dow", (expr("ts_sec div 86400") + 3) % 7)
      .groupBy(col("event_type"), col("dow"))
      .agg(count(lit(1)).as("o"))
      .localCheckpoint() // feeds the axis frames AND the completed table
    // COMPLETE the contingency table: a (type, dow) combination that never
    // occurred still contributes (0−e)²/e — dropping empty cells silently
    // understates chi² (caught by the crafted deterministic-table test)
    val cells = observed.select(col("event_type")).distinct()
      .crossJoin(observed.select(col("dow")).distinct())
      .join(observed, Seq("event_type", "dow"), "left")
      .select(col("event_type"), col("dow"), coalesce(col("o"), lit(0L)).as("o"))
    val wr = Window.partitionBy(col("event_type"))
    val wc = Window.partitionBy(col("dow"))
    val dims = cells.agg(countDistinct(col("event_type")).as("r"),
      countDistinct(col("dow")).as("c"), sum(col("o")).as("n"))
    val margins = cells.select(col("o"),
      sum(col("o")).over(wr).as("rt"),
      sum(col("o")).over(wc).as("ct"))
      .crossJoin(broadcast(dims))
    val e = col("rt").cast("double") * col("ct").cast("double") /
      col("n").cast("double")
    val contrib = floor((col("o").cast("double") - e) *
      (col("o").cast("double") - e) / e * 1e6).cast("long")
    val agg = margins
      .select(contrib.as("u"), col("n"), col("r"), col("c"))
      .agg(sum(col("u")).as("chi2u"), first(col("n")).as("n"),
        first(col("r")).as("r"), first(col("c")).as("c"))
    val chi2 = floor(col("chi2u").cast("double") / 1e6 * 1e4) / 1e4
    val dof = ((col("r") - 1L) * (col("c") - 1L)).as("dof")
    // a single-level axis (all events in one dow — r12 oneday fuzz) makes
    // min(r,c)−1 = 0: dof is 0, there is no association to normalize, and
    // the unguarded divide raises under ANSI — report V = 0, the
    // zero-signal convention
    val minrc = least(col("r") - 1L, col("c") - 1L)
    val v = when(minrc > 0,
      floor(sqrt(col("chi2u").cast("double") / 1e6 /
        (col("n").cast("double") * minrc.cast("double"))) * 1e4) / 1e4)
      .otherwise(lit(0.0))
    agg.select(col("n"), col("r").as("type_levels"), col("c").as("dow_levels"),
      chi2.as("chi2"), dof, v.as("cramers_v"))
  }

  /** Cohen's kappa inter-rater agreement between two deterministic
    * document "raters" — the labeling-pipeline audit a training corpus
    * needs once any two labelers (heuristic, model, or human batch)
    * classify the same rows: raw agreement overstates consensus when the
    * class distribution is skewed; kappa corrects by the agreement two
    * INDEPENDENT raters with the same marginals would reach by chance.
    *
    * The two raters here band each document into {short, mid, long} from
    * different evidence — rater A from `n_chars` (stored metadata), rater
    * B from the whitespace token count (recomputed from `text`) — so
    * kappa measures how consistently the two length notions agree, per
    * source and overall (the ROLLUP grand-total row, labeled via
    * GROUPING, not a null sentinel, so a literal null source stays
    * distinct).
    *
    * Exactness: kappa = (po−pe)/(1−pe) cross-multiplies to the pure
    * integer form (n·agree − Σ_k row_k·col_k) / (n² − Σ_k row_k·col_k) —
    * counts are exact longs, one final double division, floor-quantized
    * (the [[chisqIndependence]] doctrine). A degenerate table with all
    * mass in one (row, col) marginal pair makes the denominator 0 (chance
    * agreement is already 1): kappa reports 0, the zero-signal convention.
    *
    * Shape: ONE hash aggregation over the documents scan (8 conditional
    * counts per group, map-side combined); the kappa arithmetic runs on
    * the |sources|+1 result frame. No shuffle beyond the group-by. */
  def raterKappa(docs: DataFrame): DataFrame = {
    val nTok = size(split(col("text"), " ")).cast("long")
    val ra = when(col("n_chars") < 200L, "short")
      .when(col("n_chars") < 1000L, "mid").otherwise("long")
    val rb = when(nTok < 40L, "short")
      .when(nTok < 200L, "mid").otherwise("long")
    val rated = docs.select(col("source"), ra.as("ra"), rb.as("rb"))
    // Empty-corpus contract (r13 ADVICE, corrected r14 self-review):
    // Spark's rollup emits ZERO rows on empty input while DuckDB's
    // GROUP BY ROLLUP emits the 0-count grand-total row — so the oracle
    // drops it (WHERE n_docs > 0) and both lanes agree on an empty frame.
    // On non-empty input every group has >= 1 row, so the coalesces and
    // the n_docs guard below are defensive belt-and-braces, not load-
    // bearing.
    val g = rated.rollup(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        coalesce(Cols.countWhen(col("ra") === col("rb")), lit(0L)).as("agree"),
        coalesce(Cols.countWhen(col("ra") === "short"), lit(0L)).as("as_"),
        coalesce(Cols.countWhen(col("ra") === "mid"), lit(0L)).as("am"),
        coalesce(Cols.countWhen(col("ra") === "long"), lit(0L)).as("al"),
        coalesce(Cols.countWhen(col("rb") === "short"), lit(0L)).as("bs"),
        coalesce(Cols.countWhen(col("rb") === "mid"), lit(0L)).as("bm"),
        coalesce(Cols.countWhen(col("rb") === "long"), lit(0L)).as("bl"),
        grouping(col("source")).as("gr"))
    val peNum = col("as_") * col("bs") + col("am") * col("bm") +
      col("al") * col("bl")
    val denom = col("n_docs") * col("n_docs") - peNum
    g.select(
        when(col("gr") === 1, lit("ALL")).otherwise(col("source")).as("source"),
        col("n_docs"), col("agree"),
        when(col("n_docs") > 0L,
          Cols.q4(col("agree").cast("double") / col("n_docs").cast("double")))
          .otherwise(lit(0.0)).as("raw_agreement"),
        when(denom > 0L,
          Cols.q4((col("n_docs") * col("agree") - peNum).cast("double")
            / denom.cast("double")))
          .otherwise(lit(0.0)).as("kappa"))
      .orderBy(col("source").asc_nulls_first)
  }
}
