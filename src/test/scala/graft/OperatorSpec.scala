package graft

import org.apache.spark.sql.functions._

import graft.operators._
import graft.sources.Tables

/** Invariants of the batch analytics operators (SURVEY.md §5 strategy #3). */
class OperatorSpec extends SparkSpec {
  import spark.implicits._

  test("session metrics: funnel counts partition total_events; converted ⇔ purchases>0; end ≥ start") {
    val sm = Sessionize.sessionMetrics(Tables.events(spark, sf))
    val bad = sm.where(
      col("page_views") + col("clicks") + col("signups") + col("errors") + col("purchases") =!= col("total_events")
        || (col("converted") =!= (col("purchases") > 0))
        || col("end_sec") < col("start_sec")
        || col("session_duration_seconds") =!= col("end_sec") - col("start_sec"))
    assert(bad.count() == 0)
  }

  test("sessionization: session count equals gap-rule count and covers all events") {
    val withIds = Sessionize.withSessionId(Tables.events(spark, sf))
    val events  = Tables.events(spark, sf).count()
    assert(withIds.count() == events) // no events lost or duplicated
    val sessions = withIds.select(col("session_id")).distinct().count()
    assert(sessions > 0 && sessions <= events)
  }

  test("hourly metrics: conversion_rate is 0 when page_views is 0; totals add up") {
    val hm = EventAnalytics.hourlyMetrics(Tables.events(spark, sf))
    assert(hm.where(col("page_views") === 0
      && col("conversion_rate") =!= lit(BigDecimal(0))).count() == 0)
    val bad = hm.where(col("page_views") + col("clicks") + col("purchases")
      + col("signups") + col("errors") =!= col("total_events"))
    assert(bad.count() == 0)
  }

  test("hourly anomalies: spike hour flagged with exact z, warmup and normal hours not") {
    // hours 0..24: alternating 99/101 events (mean 100, σ = 1 over any 24
    // consecutive hours); hour 25 spikes to 200 → z = (200-100)/1 = 100.
    // Hour 24 (first judged hour) sits at z = -1 → not flagged; hours
    // 0..23 have no 24-hour baseline → not judged.
    val rows = for {
      h <- 0 to 25
      c = if (h == 25) 200 else if (h % 2 == 0) 99 else 101
      i <- 1 to c
    } yield (h.toLong * 3600 + i)
    val events = rows.toList.toDF("ts_sec")
    val out = EventAnalytics.hourlyAnomalies(events, 24, 2.0).collect()
    assert(out.length == 1, s"expected exactly the spike hour, got ${out.toSeq}")
    assert(out(0).getAs[Long]("hour_sec") == 25L * 3600)
    assert(out(0).getAs[Double]("z") == 100.0)
    assert(out(0).getAs[Double]("baseline_mean") == 100.0)
  }

  test("hourly anomalies: outage hour surfaces as cnt 0; flat-baseline spike gets the sentinel") {
    // hours 0..24 alternate 99/101 (σ = 1); hour 25 has NO events at all
    // (absent from the raw table) — densification must surface it as
    // cnt = 0 with z = (0 − 100)/1 = −100
    val gappy = (for {
      h <- (0 to 24) :+ 26
      c = if (h == 26) 100 else if (h % 2 == 0) 99 else 101
      i <- 1 to c
    } yield (h.toLong * 3600 + i)).toList.toDF("ts_sec")
    val outage = EventAnalytics.hourlyAnomalies(gappy, 24, 2.0).collect()
      .map(r => r.getAs[Long]("hour_sec") -> (r.getAs[Long]("cnt"), r.getAs[Double]("z"))).toMap
    assert(outage.contains(25L * 3600), s"outage hour missing: $outage")
    assert(outage(25L * 3600) == ((0L, -100.0)), s"got ${outage(25L * 3600)}")

    // perfectly flat baseline (σ = 0): a spike is still an anomaly and is
    // reported with the ±9999 sentinel, not silently dropped
    val flat = (for {
      h <- 0 to 24
      c = if (h == 24) 500 else 100
      i <- 1 to c
    } yield (h.toLong * 3600 + i)).toList.toDF("ts_sec")
    val sentinel = EventAnalytics.hourlyAnomalies(flat, 24, 2.0).collect()
    assert(sentinel.length == 1 && sentinel(0).getAs[Long]("hour_sec") == 24L * 3600)
    assert(sentinel(0).getAs[Double]("z") == 9999.0, s"got ${sentinel.toSeq}")
  }

  test("hourly approx distinct stays within HLL error of exact") {
    val exact = EventAnalytics.hourlyMetrics(Tables.events(spark, sf))
      .select(col("hour_sec"), col("unique_users"))
    val approx = EventAnalytics.hourlyMetricsApprox(Tables.events(spark, sf))
      .select(col("hour_sec"), col("unique_users_approx"))
    val joined = exact.join(approx, "hour_sec")
    val off = joined.where(
      abs(col("unique_users_approx") - col("unique_users")) >
        greatest(lit(2.0), col("unique_users") * 0.25)).count()
    assert(off == 0, "approx_count_distinct drifted beyond 25%/±2 of exact")
  }

  test("salted aggregation equals direct aggregation and spreads the hot key") {
    val ev = Tables.events(spark, sf)
    // decimal values: float sums are order-dependent and would differ
    // between the one-stage and two-stage plans by last-bit noise
    val v = graft.functions.Cols.dec2(col("value"))
    val salted = operators.Skew.saltedSumCount(
      ev, Seq("event_type"), v, col("event_id"), salts = 8)
    val direct = ev.groupBy(col("event_type"))
      .agg(sum(v).as("total"), count(lit(1)).as("rows"))
    assert(salted.exceptAll(direct).count() == 0 && direct.exceptAll(salted).count() == 0)
    salted.collect()
    val p = salted.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 2) // partial + merge stages
  }

  test("event type distribution percentages sum to ~100") {
    val total = EventAnalytics.eventTypeDistribution(Tables.events(spark, sf))
      .agg(sum(col("pct_of_total"))).head().getDouble(0)
    assert((total - 100.0).abs < 0.01)
  }

  test("dashboard KPIs contain the 5 metric keys") {
    val keys = EventAnalytics.dashboardKpis(Tables.events(spark, sf))
      .select(col("metric_key")).collect().map(_.getString(0)).toSet
    assert(keys == Set("total_users", "total_events", "total_revenue",
      "conversion_rate", "avg_purchase_value"))
  }

  test("distributed deciles equal the one-window ntile spec row-for-row") {
    val dist  = Relational.orderValueDeciles(spark, sf).collect().map(_.toString).toSeq
    val ntile = Relational.orderValueDecilesNtile(spark, sf).collect().map(_.toString).toSeq
    assert(dist == ntile, s"bucket-offset rank must reproduce ntile exactly:\n$dist\nvs\n$ntile")
    // the tile rule also holds when n < tiles (each row its own tile) and
    // when n mod 10 ≠ 0 (first rem tiles one row larger)
    for (n <- Seq(7, 23, 40)) {
      val sub = Tables.orders(spark, sf).orderBy(col("o_orderkey")).limit(n)
      sub.createOrReplaceTempView("orders_decile_probe")
      val expect = spark.sql(
        """SELECT decile, count(*) AS orders FROM (
          |  SELECT ntile(10) OVER (ORDER BY o_totalprice, o_orderkey) AS decile
          |  FROM orders_decile_probe)
          |GROUP BY decile ORDER BY decile""".stripMargin)
        .collect().map(_.toString).toSeq
      // re-run the operator's rank→tile mapping over the small probe set
      val probe = Relational.decilesByValue(sub).select("decile", "orders")
        .collect().map(_.toString).toSeq
      assert(probe == expect, s"n=$n: $probe != $expect")
    }
  }

  test("Theil-Sen slope ignores a planted outlier day that least squares chases") {
    // 21 days of exactly +1.00/day revenue with day 10 spiked 1e6x: the
    // median of pairwise slopes stays exactly 100 cents/day (only 20 of
    // 210 pairs touch the outlier); OLS would be pulled far away
    val orders = (0 until 21).map { i =>
      val date = java.sql.Date.valueOf(java.time.LocalDate.of(2024, 1, 1).plusDays(i))
      val price = if (i == 10) BigDecimal(1000000) else BigDecimal(i + 1)
      (date, price)
    }.toDF("o_orderdate", "o_totalprice")
    val r = graft.operators.Stats.theilSenDailyRevenue(orders).head()
    assert(r.getAs[Long]("n_pairs") == 210L)
    assert(r.getAs[Double]("slope_cents_per_day") == 100.0, s"got $r")
  }

  test("letter concentration: spam scores 1, alternating digraph dilutes, no-letter docs drop") {
    val docs = Seq(
      ("s1", 1L, "aaaa AAAA!!"), // -> "aaaaaaaa": 64/64 per doc
      ("s1", 2L, "abababab"),    // 4a+4b: (16+16)/64
      ("s2", 3L, "abcd"),        // 4 distinct: 4/16
      ("s2", 4L, "123 !!!")      // no letters: excluded entirely
    ).toDF("source", "doc_id", "text")
    val got = graft.operators.TextAnalysis.letterConcentration(docs).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5))).toSeq
    assert(got == Seq(("s1", 2L, 16L, 96L, 128L, 0.75), ("s2", 1L, 4L, 4L, 16L, 0.25)),
      got.toString)
  }

  test("peak concurrency: crafted overlapping sessions peak at 3; sweep conserves to zero") {
    import spark.implicits._
    // users 1-3 hold sessions spanning [100, 200] simultaneously; user 4's
    // session sits a day later and never overlaps them
    val ev = Seq(
      (1L, 1L, 100L), (2L, 1L, 200L), (3L, 2L, 100L), (4L, 2L, 200L),
      (5L, 3L, 100L), (6L, 3L, 200L), (7L, 4L, 100000L))
      .toDF("event_id", "user_id", "ts_sec")
      .select(col("event_id"), col("user_id"), col("ts_sec"),
        lit("view").as("event_type"), lit(1.0).as("value"))
    val got = Sessionize.peakConcurrency(ev).collect()
    assert(got.map(_.getAs[Long]("peak_concurrency")).max >= 3,
      s"three overlapping sessions must peak at >= 3: ${got.toSeq}")
    // global conservation: sum of all deltas is zero — the last change
    // point's running count returns to 0, so no day reports negative peaks
    got.foreach(r => assert(r.getAs[Long]("peak_concurrency") >= 0))
  }

  test("peak concurrency: a day fully inside a long session reports peak 1 via the midnight seed") {
    import spark.implicits._
    // one session spanning day0 23:00 -> day2 02:00 (every inter-event gap
    // 3000 s < the 3600 s rule): day1 has NO real change point, so only the
    // synthetic midnight sample makes it report its true concurrency
    val ts = 82800L to 180000L by 3000L
    val ev = ts.zipWithIndex.map { case (t, i) => ((i + 1).toLong, 1L, t) }
      .toDF("event_id", "user_id", "ts_sec")
      .select(col("event_id"), col("user_id"), col("ts_sec"),
        lit("view").as("event_type"), lit(1.0).as("value"))
    val got = Sessionize.peakConcurrency(ev).collect()
      .map(r => (r.getAs[Long]("day_sec"), r.getAs[Long]("peak_concurrency"),
        r.getAs[Long]("change_points")))
    assert(got.toSeq == Seq((0L, 1L, 1L), (86400L, 1L, 0L), (172800L, 1L, 1L)),
      s"day1 must report the carried-over concurrency with zero real change points: ${got.toSeq}")
  }

  test("type-mix drift: identical mixes score 0; a full regime flip scores 1; gap days break the chain") {
    import spark.implicits._
    // day0: 2 view + 2 click; day1: same mix (tv=0); day2: all purchase
    // (tv=1 vs day1); day4 exists but day3 doesn't -> no row for day4
    def ev(id: Long, day: Long, i: Long, t: String) =
      (id, 1L, day * 86400L + i, t, 1.0)
    val rows =
      Seq(ev(1, 0, 1, "view"), ev(2, 0, 2, "view"), ev(3, 0, 3, "click"), ev(4, 0, 4, "click"),
        ev(5, 1, 1, "view"), ev(6, 1, 2, "view"), ev(7, 1, 3, "click"), ev(8, 1, 4, "click"),
        ev(9, 2, 1, "purchase"), ev(10, 2, 2, "purchase"),
        ev(11, 4, 1, "view"))
    val df = rows.toDF("event_id", "user_id", "ts_sec", "event_type", "value")
    val got = EventAnalytics.typeMixDrift(df).collect()
      .map(r => (r.getAs[Long]("day_sec") / 86400L, r.getAs[Double]("tv_drift")))
    assert(got.toSeq == Seq((1L, 0.0), (2L, 1.0)),
      s"expected tv=0 for the identical mix, tv=1 for the flip, nothing across the gap: ${got.toSeq}")
  }

  test("source vocab jaccard: hand-computed overlap; bounded in (0,1]; symmetric pair order") {
    import spark.implicits._
    // s1 vocab {a,b,c}; s2 vocab {b,c,d,e}; s3 vocab {z}
    val docs = Seq(
      ("s1", 1L, "a b c a"), ("s2", 2L, "b c d"), ("s2", 3L, "d e"), ("s3", 4L, "z"))
      .toDF("source", "doc_id", "text")
    val got = TextAnalysis.sourceVocabJaccard(docs).collect()
      .map(r => (r.getString(0), r.getString(1), r.getAs[Long]("vocab_a"),
        r.getAs[Long]("vocab_b"), r.getAs[Long]("inter"), r.getAs[Double]("jaccard")))
    // only overlapping pairs emit: s1-s2 share {b,c} -> 2/(3+4-2) = 0.4
    assert(got.toSeq == Seq(("s1", "s2", 3L, 4L, 2L, 0.4)), got.toSeq.toString)
  }

  test("label propagation: two triangles over a weak bridge split into two communities") {
    // triangles {1,2,3} and {4,5,6} with heavy internal edges (w=5) and a
    // single w=1 bridge 3-4: LPA must NOT merge them (CC would), and the
    // census must conserve every node
    val edges = Seq(
      (1L, 2L, 5L), (1L, 3L, 5L), (2L, 3L, 5L),
      (4L, 5L, 5L), (4L, 6L, 5L), (5L, 6L, 5L),
      (3L, 4L, 1L)).toDF("item_a", "item_b", "pairs")
    val got = GraphRank.labelPropagation(edges).collect()
    assert(got.map(_.getAs[Long]("nodes")).sum == 6, "census must conserve nodes")
    assert(got.length == 2, s"expected two communities, got ${got.toSeq}")
    val members = got.map(r =>
      (r.getAs[Long]("min_node"), r.getAs[Long]("max_node"), r.getAs[Long]("nodes")))
    assert(members.contains((1L, 3L, 3L)) && members.contains((4L, 6L, 3L)),
      s"triangles must be the communities: ${members.toSeq}")
  }

  test("k-core census: K4 plus a whisker peels to the clique at k=2 and k=3") {
    // K4 on 1..4 (every node degree 3) with a path 4-5-6 hanging off:
    // the whisker peels (6 then 5), the clique survives both cores
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (4L, 5L), (5L, 6L)).toDF("a", "b")
    val got = GraphRank.kCoreCensus(edges, "a", "b", ks = Seq(2, 3, 4))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set((2L, 4L, 6L), (3L, 4L, 6L), (4L, 0L, 0L)), s"got $got")
  }

  test("Hilbert index: bijective on the full grid, consecutive cells always adjacent") {
    // the defining property — unlike Morton, step d→d+1 NEVER jumps: it is
    // exactly one 4-neighborhood move. Checked exhaustively at bits=4.
    val bits = 4
    val n = 1 << bits
    val grid = (for (x <- 0 until n; y <- 0 until n) yield (x.toLong, y.toLong))
      .toDF("x", "y")
    val pos = ZOrder.withHilbert(grid, "x", "y", bits)
      .select("h", "x", "y").as[(Long, Long, Long)].collect()
      .map(t => t._1 -> (t._2, t._3)).toMap
    assert(pos.size == n * n && pos.keySet == (0L until (n * n).toLong).toSet,
      "hilbert index must be a bijection onto [0, n^2)")
    for (d <- 0L until (n * n - 1).toLong) {
      val (x1, y1) = pos(d); val (x2, y2) = pos(d + 1)
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) == 1,
        s"curve jumped between d=$d ($x1,$y1) and ${d + 1} ($x2,$y2)")
    }
    // locality vs Morton on the same dense grid: sum of per-bucket
    // bounding-rectangle areas (16 buckets) must not be worse
    def extentSum(df: org.apache.spark.sql.DataFrame): Long =
      df.select(((col("x_max") - col("x_min") + 1) * (col("y_max") - col("y_min") + 1))
        .as("a")).as[Long].collect().sum
    val h = extentSum(ZOrder.hilbertProfile(grid, "x", "y", bits, buckets = 16))
    val z = extentSum(ZOrder.zOrderProfile(grid, "x", "y", bits, buckets = 16))
    assert(h <= z, s"hilbert extent sum $h must be <= morton $z")
  }

  test("changepoint: recovers a planted step in hourly volume exactly") {
    // 10 hours at 10 events/hour then 10 hours at 100 — the least-squares
    // break must land after the last low hour, with exact segment stats
    val rows = for (h <- 0 until 20; i <- 0 until (if (h < 10) 10 else 100))
      yield (h * 3600L + i)
    val events = rows.toDF("ts_sec")
    val r = Stats.hourlyChangepoint(events).collect()
    assert(r.length == 1)
    val row = r.head
    assert(row.getAs[Long]("split_hour_sec") == 9L * 3600L, s"got $row")
    assert(row.getAs[Long]("hours_left") == 10L && row.getAs[Long]("hours_right") == 10L)
    assert(row.getAs[Long]("events_left") == 100L && row.getAs[Long]("events_right") == 1000L)
    assert(row.getAs[Double]("mean_left") == 10.0 && row.getAs[Double]("mean_right") == 100.0)
  }

  test("sliding DAU: window=1 equals plain daily actives; 7-day dominates; equals naive range join") {
    val events = Tables.events(spark, sf)
    val daily = EventAnalytics.slidingActiveUsers(events, windowDays = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val plain = events
      .select(col("user_id"), (col("ts_sec") - pmod(col("ts_sec"), lit(86400L))).as("day_sec"))
      .distinct().groupBy("day_sec").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(daily == plain)
    val weekly = EventAnalytics.slidingActiveUsers(events, windowDays = 7)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(weekly.keySet == daily.keySet)
    daily.foreach { case (d, n) => assert(weekly(d) >= n, s"day $d") }
    // independent derivation: per-day distinct over the trailing range join
    val ud = events.select(col("user_id"),
      (col("ts_sec") - pmod(col("ts_sec"), lit(86400L))).as("day_sec")).distinct()
    val naive = ud.select(col("day_sec")).distinct().as("d")
      .join(ud.as("u"), expr("u.day_sec BETWEEN d.day_sec - 6*86400 AND d.day_sec"))
      .groupBy(col("d.day_sec")).agg(countDistinct(col("u.user_id")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(weekly == naive)
  }

  test("interpolated quantiles equal Spark's percentile_cont, incl. tiny frames") {
    def check(ordersIn: org.apache.spark.sql.DataFrame): Unit = {
      val got = Relational.quantilesCont(ordersIn).collect()
        .map(r => r.getString(0) -> r.getDouble(1)).toMap
      val e = ordersIn.agg(
        expr("percentile_cont(0.25) WITHIN GROUP (ORDER BY o_totalprice)").as("p25"),
        expr("percentile_cont(0.50) WITHIN GROUP (ORDER BY o_totalprice)").as("p50"),
        expr("percentile_cont(0.75) WITHIN GROUP (ORDER BY o_totalprice)").as("p75"))
        .head()
      for ((q, i) <- Seq("p25", "p50", "p75").zipWithIndex)
        // ours interpolates on exact cents, Spark on raw doubles — same
        // value up to one rounding step, never bit-contractual (the ORACLE
        // pins the engine's exact sequence; this anchors the semantics)
        assert(math.abs(got(q) - e.getDouble(i)) < 1e-6, s"$q: ${got(q)} vs ${e.getDouble(i)}")
    }
    check(Tables.orders(spark, sf))
    for (n <- Seq(1, 2, 3, 4, 5, 7))
      check(Tables.orders(spark, sf).orderBy(col("o_orderkey")).limit(n))
  }

  test("per-group interpolated quantiles equal Spark's grouped percentile_cont") {
    val got = Relational.priorityPriceQuantilesCont(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    val e = Tables.orders(spark, sf).groupBy(col("o_orderpriority")).agg(
        expr("percentile_cont(0.25) WITHIN GROUP (ORDER BY o_totalprice)").as("p25"),
        expr("percentile_cont(0.50) WITHIN GROUP (ORDER BY o_totalprice)").as("p50"),
        expr("percentile_cont(0.75) WITHIN GROUP (ORDER BY o_totalprice)").as("p75"))
      .collect()
    assert(e.nonEmpty)
    e.foreach { r =>
      val g = r.getString(0)
      for ((q, i) <- Seq("p25", "p50", "p75").zipWithIndex)
        assert(math.abs(got((g, q)) - r.getDouble(i + 1)) < 1e-6,
          s"$g/$q: ${got((g, q))} vs ${r.getDouble(i + 1)}")
    }
  }

  test("forward fill equals the naive per-user scan; pre-first-purchase stays null") {
    val filled = EventAnalytics.lastKnownValueFill(Tables.events(spark, sf))
      .select(col("user_id"), col("ts_sec"), col("event_id"), col("event_type"),
        col("value"), col("last_purchase_value"))
      .as[(Long, Long, Long, String, Double, Option[Double])].collect()
    filled.groupBy(_._1).foreach { case (_, evs) =>
      var lastPurchase: Option[Double] = None
      evs.sortBy(e => (e._2, e._3)).foreach { case (_, _, id, typ, v, got) =>
        if (typ == "purchase") lastPurchase = Some(v)
        assert(got == lastPurchase, s"event $id: expected $lastPurchase, got $got")
      }
    }
    assert(filled.exists(_._6.isEmpty), "some user's head events precede any purchase")
    assert(filled.exists(e => e._6.nonEmpty && e._4 != "purchase"),
      "carry must reach non-purchase events")
  }

  test("session paths: trigram mass equals sum of per-session max(len-2, 0)") {
    val events = Tables.events(spark, sf)
    val paths = EventAnalytics.sessionPaths(events, k = 1000000)
    val mass = paths.agg(sum(col("occurrences"))).head().getLong(0)
    val expected = Sessionize.withSessionId(events)
      .groupBy(col("user_id"), col("session_id")).count()
      .select(greatest(col("count") - 2, lit(0L)).as("t"))
      .agg(sum(col("t"))).head().getLong(0)
    assert(mass == expected, s"trigram mass $mass != $expected")
  }

  test("hourly autocorrelation: alternating series gives exact ±1 at lags 1 and 2") {
    // hours 0..10 with counts 1,3,1,3,… — lag-1 pairs are perfectly
    // anticorrelated (r = −1 → −10000 units), lag-2 perfectly correlated
    val rows = for {
      h <- 0 to 10
      i <- 0 until (if (h % 2 == 0) 1 else 3)
    } yield h * 3600L + i
    val events = rows.toDF("ts_sec")
    val r = Stats.hourlyAutocorrelation(events, maxLag = 3)
      .as[(Long, Long, Long)].collect().map(x => x._1 -> x._3).toMap
    assert(r(1L) == -10000L && r(2L) == 10000L)
  }

  test("revenue EWMA: crafted series folds exactly; single day passes through") {
    import java.sql.Timestamp
    def day(d: Long) = new Timestamp(d * 86400L * 1000L)
    // priority A, days 0..2, revenues 1.00, 3.00, 5.00 (100, 300, 500 cents):
    // s0=100, s1=(100+300)/2=200, s2=(200+500)/2=350 -> 3.50
    // priority B, single day 10.01 -> passes through unchanged
    val orders = Seq(
      (1L, "A", 1.00, day(0)), (2L, "A", 3.00, day(1)), (3L, "A", 5.00, day(2)),
      (4L, "B", 10.01, day(5)))
      .toDF("o_orderkey", "o_orderpriority", "o_totalprice", "o_orderdate")
    val got = Stats.dailyRevenueEwma(orders)
      .as[(String, Long, Long, Double)].collect().toList
    assert(got == List(("A", 3L, 2L, 3.50), ("B", 1L, 5L, 10.01)))
  }

  test("Holt smoothing: constant series is a fixed point; linear ramp follows the hand recurrence") {
    import java.sql.Timestamp
    def day(d: Long) = new Timestamp(d * 86400L * 1000L)
    // priority A constant 1.00/day: l stays 100 cents, b stays 0 — the
    // recurrence's fixed point. Priority B ramp 1.00/2.00/3.00: hand-run
    // l2=(30*200+70*100)div100=130, b2=(20*30)div100=6;
    // l3=(30*300+70*136)div100=185, b3=(20*55+80*6)div100=15.
    val orders = Seq(
      (1L, "A", 1.00, day(0)), (2L, "A", 1.00, day(1)), (3L, "A", 1.00, day(2)),
      (4L, "B", 1.00, day(0)), (5L, "B", 2.00, day(1)), (6L, "B", 3.00, day(2)))
      .toDF("o_orderkey", "o_orderpriority", "o_totalprice", "o_orderdate")
    val got = Stats.holtLinearDailyRevenue(orders)
      .as[(String, Long, Double, Double, Double)].collect().toList
    assert(got == List(
      ("A", 0L, 1.00, 1.00, 0.0), ("A", 86400L, 1.00, 1.00, 0.0),
      ("A", 172800L, 1.00, 1.00, 0.0),
      ("B", 0L, 1.00, 1.00, 0.0), ("B", 86400L, 2.00, 1.30, 0.06),
      ("B", 172800L, 3.00, 1.85, 0.15)), s"got $got")
  }

  test("rolling median: lower median on even bands; calendar gaps shrink the window") {
    import java.sql.Timestamp
    def day(d: Long) = new Timestamp(d * 86400L * 1000L)
    // days 0,1 -> day 1's band is {1.00, 3.00}: LOWER median 1.00 (an
    // observed value, no interpolation). Day 9 sits past the 7-day reach
    // of every earlier day: window_days collapses to 1, median = itself.
    val orders = Seq(
      (1L, 1.00, day(0)), (2L, 3.00, day(1)), (3L, 2.00, day(2)),
      (4L, 9.00, day(9)))
      .toDF("o_orderkey", "o_totalprice", "o_orderdate")
    val got = Stats.rollingMedianDailyRevenue(orders)
      .as[(Long, Double, Double, Long)].collect().toList
    assert(got == List(
      (0L, 1.00, 1.00, 1L), (86400L, 3.00, 1.00, 2L),
      (172800L, 2.00, 2.00, 3L), (777600L, 9.00, 9.00, 1L)), s"got $got")
  }

  test("l-diversity: homogeneous, two-value and diverse classes band correctly") {
    // three QI classes (nation, bal band 0): nation 1 all 'X' (l=1,
    // homogeneous — the disclosure k-anonymity misses), nation 2 {X,Y}
    // (l=2), nation 3 {X,Y,Z} (l=3)
    val df = Seq(
      (1L, 1, 100.0, "X"), (2L, 1, 200.0, "X"), (3L, 1, 300.0, "X"),
      (4L, 2, 100.0, "X"), (5L, 2, 200.0, "Y"),
      (6L, 3, 100.0, "X"), (7L, 3, 200.0, "Y"), (8L, 3, 300.0, "Z"))
      .toDF("c_custkey", "c_nationkey", "c_acctbal", "c_mktsegment")
    val got = DataQuality.lDiversityCensus(df)
      .as[(String, Long, Long, Long, Double)].collect().toList
    assert(got == List(
      ("l<=1 homogeneous", 1L, 3L, 1L, 37.5),
      ("l=2", 1L, 2L, 2L, 25.0),
      ("l>=3", 1L, 3L, 3L, 37.5)), s"got $got")
  }

  test("Mann-Kendall: monotone ramp is significant; all-tied series zeroes the variance") {
    import java.sql.Timestamp
    def day(d: Long) = new Timestamp(d * 86400L * 1000L)
    // strictly increasing 5 days: S = C(5,2) = 10, no ties ->
    // var_s18 = 5*4*15 = 300, z = 9/sqrt(300/18) = 2.2045... -> increasing
    val up = (0L to 4L).map(d => (d, 1.0 + d, day(d)))
      .toDF("o_orderkey", "o_totalprice", "o_orderdate")
    val ru = Stats.mannKendallDailyRevenue(up).collect()(0)
    assert(ru.getAs[Long]("n_days") == 5L && ru.getAs[Long]("s_stat") == 10L
      && ru.getAs[Long]("var_s18") == 300L)
    assert(ru.getAs[Double]("z")
      == math.floor(9.0 / math.sqrt(300.0 / 18.0) * 10000.0) / 10000.0)
    assert(ru.getAs[String]("trend") == "increasing")
    // constant 3 days: every pair ties -> S = 0 AND the tie correction
    // consumes the whole variance (3*2*11 - 3*2*11 = 0) -> z 0, none
    val flat = (0L to 2L).map(d => (d, 2.0, day(d)))
      .toDF("o_orderkey", "o_totalprice", "o_orderdate")
    val rf = Stats.mannKendallDailyRevenue(flat).collect()(0)
    assert(rf.getAs[Long]("s_stat") == 0L && rf.getAs[Long]("var_s18") == 0L
      && rf.getAs[Double]("z") == 0.0 && rf.getAs[String]("trend") == "none")
  }

  test("CUSUM drift: level shift accumulates at dev-minus-slack and alarms past 5 baseline means") {
    // 7 baseline days of 10 events, then 3 days of 40: nb=7, sumb=70,
    // dev = 40*7-70 = 210, slack = 35 -> cp walks 175, 350, 525; the
    // alarm needs cp > 5*sumb = 350, so exactly the third spike day fires
    val rows = for {
      d <- 0L to 9L
      i <- 0L until (if (d <= 6) 10L else 40L)
    } yield (d * 1000 + i, d * 86400L)
    val events = rows.toDF("event_id", "ts_sec")
    val got = Stats.cusumDailyVolume(events)
      .as[(Long, Long, Long, Long, Boolean)].collect().toList
    assert(got.size == 10)
    // baseline days: dev = 0, cp = max(0, 0 - 35) = 0, no alarms
    got.take(7).foreach { case (_, c, cp, cn, a) =>
      assert(c == 10L && cp == 0L && cn == 0L && !a)
    }
    assert(got.drop(7).map(r => (r._3, r._5)) ==
      List((175L, false), (350L, false), (525L, true)), s"got $got")
  }

  test("dataset card: volume, modal lang, short share and within-source dup share") {
    val docs = Seq(
      // source a: 4 docs, exact dup pair, one short, modal lang en
      ("a", "en", 300L, "alpha beta gamma"), ("a", "en", 300L, "alpha beta gamma"),
      ("a", "de", 100L, "kurz"), ("a", "en", 500L, "one two three four"),
      // source b: no dups, lang tie de/es broken lexicographically -> de
      ("b", "de", 900L, "x y"), ("b", "es", 900L, "p q r"))
      .toDF("source", "lang", "n_chars", "text")
    val got = TextAnalysis.datasetCard(docs)
      .as[(String, Long, Long, Double, Double, String, Double, Double)]
      .collect().toList
    // a: tokens 3+3+1+4=11, avg 2.75, short 1/4=25%, en 3/4=75%, dup 2/4=50%
    // b: tokens 2+3=5, avg 2.5, short 0, de 1/2=50%, dup 0
    assert(got == List(
      ("a", 4L, 11L, 2.75, 25.0, "en", 75.0, 50.0),
      ("b", 2L, 5L, 2.5, 0.0, "de", 50.0, 0.0)), s"got $got")
  }

  test("t-closeness: hand TV distances band correctly; null segments excluded") {
    // global (after null filter): X=4, Y=2, N=6. Class nation 1 = {2X, 2Y}:
    // sum|cv*N - gv*k| = |12-16| + |12-8| = 8, t = 8/(2*4*6) = 0.1666.
    // Class nation 2 = {2X}: |12-8| + |0-4| = 8, t = 8/(2*2*6) = 0.3333.
    val df = Seq(
      (1L, 1, 100.0, "X"), (2L, 1, 200.0, "X"), (3L, 1, 300.0, "Y"),
      (4L, 1, 400.0, "Y"), (5L, 1, 500.0, null.asInstanceOf[String]),
      (6L, 2, 100.0, "X"), (7L, 2, 200.0, "X"))
      .toDF("c_custkey", "c_nationkey", "c_acctbal", "c_mktsegment")
    val got = DataQuality.tClosenessCensus(df)
      .as[(String, Long, Long, Double, Double)].collect().toList
    assert(got == List(
      ("t<=0.2 close", 1L, 4L, 0.1666, 66.6666),
      ("t<=0.4", 1L, 2L, 0.3333, 33.3333)), s"got $got")
  }

  test("collocations: Dice rewards glued pairs over frequent-word adjacency; floor filters rare pairs") {
    // "alpha beta" members never appear apart -> dice 1.0; "the pad" ->
    // 2*5/(10+5) = 0.6666; "of the" -> 2*5/(10+10) = 0.5. Pairs seen < 5
    // times (none here besides the constructed ones) are floored out.
    val docs = (
      (1 to 5).map(i => (i.toLong, "alpha beta")) ++
      (6 to 10).map(i => (i.toLong, "of the pad")) ++
      (11 to 15).map(i => (i.toLong, "of")) ++
      (16 to 20).map(i => (i.toLong, "the"))
    ).toDF("doc_id", "text")
    val got = TextAnalysis.collocations(docs)
      .as[(String, Long, Long, Long, Double)].collect().toList
    assert(got == List(
      ("alpha beta", 5L, 5L, 5L, 1.0),
      ("the pad", 5L, 10L, 5L, 0.6666),
      ("of the", 5L, 10L, 10L, 0.5)), s"got $got")
  }

  test("readability: Coleman-Liau from hand counts; zero-word source reports 0") {
    // "The cat sat. The dog ran." -> 18 letters, 6 words, 2 enders:
    // CLI = 0.0588*300 - 0.296*(200/6) - 15.8
    val docs = Seq(
      (1L, "a", "The cat sat. The dog ran."),
      (2L, "b", ""))
      .toDF("doc_id", "source", "text")
    val got = TextAnalysis.readabilityBySource(docs)
      .as[(String, Long, Long, Long, Long, Double)].collect().toList
    val cli = math.floor((0.0588 * (18.0 * 100.0 / 6.0)
      - 0.296 * (2.0 * 100.0 / 6.0) - 15.8) * 10000.0) / 10000.0
    assert(got == List(("a", 1L, 18L, 6L, 2L, cli), ("b", 1L, 0L, 0L, 0L, 0.0)),
      s"got $got")
  }

  test("Fisher separability: hand geometry — separated pair scores dist2/scatter exactly") {
    // label 0 = {(0,0), (0.5,0)}: centroid (0.25,0), scatter 25e6 unit^2
    // over n^2=4 -> sigma^2 = 6.25e6; label 1 = {(1,0), (1,0)}: scatter 0.
    // dist2 = (0.25-1)^2 = 0.5625; fisher = 5.625e7 / 6.25e6 = 9.0
    val emb = Seq(
      (1L, Array(0.0f, 0.0f), 0), (2L, Array(0.5f, 0.0f), 0),
      (3L, Array(1.0f, 0.0f), 1), (4L, Array(1.0f, 0.0f), 1))
      .toDF("vec_id", "embedding", "label")
    val got = Similarity.fisherSeparability(emb)
      .as[(Long, Long, Double, Double)].collect().toList
    assert(got == List((0L, 1L, 0.5625, 9.0)), s"got $got")
  }

  test("cohort retention: offset-0 row is the full cohort; matrix bounded by cohort size") {
    val m = EventAnalytics.cohortRetention(Tables.events(spark, sf))
      .as[(Long, Long, Long, Long, Double)].collect()
    assert(m.nonEmpty)
    m.filter(_._2 == 0L).foreach { case (cw, _, active, size, pct) =>
      assert(active == size && pct == 100.0, s"cohort $cw offset 0 must be complete")
    }
    m.foreach { case (cw, off, active, size, _) =>
      assert(off >= 0 && active <= size, s"cohort $cw offset $off exceeds its cohort")
    }
    // cohort sizes partition the user universe
    val users = Tables.events(spark, sf).select(col("user_id")).distinct().count()
    assert(m.filter(_._2 == 0L).map(_._4).sum == users)
  }

  test("timed funnel: stages monotone; tighter window never beats a looser one") {
    val ev = Tables.events(spark, sf)
    def row(step: Long) = EventAnalytics.timedFunnel(ev, step)
      .as[(Long, Long, Long, Long, Long)].head()
    val (users, v1, c1, p1, lag1) = row(3600)
    assert(users >= v1 && v1 >= c1 && c1 >= p1 && (p1 == 0 || lag1 > 0))
    val (_, v2, c2, p2, _) = row(600)
    assert(v2 == v1, "first-view stage ignores the step bound")
    assert(c2 <= c1 && p2 <= p1, "a tighter step window cannot increase funnel depth")
  }

  test("CDC merge: latest change wins, deletes drop, inserts add, untouched keys pass") {
    val base = Seq((1L, "O", 100L), (2L, "O", 200L), (3L, "O", 300L), (4L, "O", 400L))
      .toDF("k", "base_st", "base_cents")
    val changes = Seq(
      (2L, 1L, "U", "P", 250L),  // single update
      (3L, 1L, "U", "P", 310L),  // superseded…
      (3L, 2L, "U", "F", 320L),  // …by this later image
      (4L, 1L, "U", "P", 410L),  // update, then
      (4L, 3L, "D", "x", 0L),    // delete wins on seq
      (9L, 1L, "I", "N", 950L))  // insert under a fresh key
      .toDF("k", "seq", "op", "st", "cents")
    val got = Snapshot.mergeChanges(base, changes)
      .as[(Long, String, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got == Map(1L -> (("O", 100L)), 2L -> (("P", 250L)),
      3L -> (("F", 320L)), 9L -> (("N", 950L))))

    // fixture conservation: deletes always carry the max seq on their key,
    // so merged row count = |base| − |delete keys| + |insert keys|
    val orders = Tables.orders(spark, sf)
    def sel(tag: String) = orders.where(
      Dedup.PortableHash(concat(lit(tag), col("o_orderkey").cast("string"))) % lit(
        if (tag == "del:") 7 else 9) < 1).count()
    val prof = Snapshot.mergeUpsertProfile(orders)
      .as[(String, Long, Double)].collect()
    assert(prof.map(_._2).sum == orders.count() - sel("del:") + sel("ins:"))
    assert(prof.exists(_._1 == "N"), "insert status must appear in the census")
  }

  test("snapshot diff statuses on crafted snapshots; census conserves both sides") {
    def df(rows: Seq[(Long, String, String)]) = rows.toDF("doc_id", "source", "text")
    val oldSnap = df(Seq((1L, "s", "a"), (2L, "s", "b"), (3L, "s", "c")))
    val newSnap = df(Seq((2L, "s", "b"), (3L, "s", "c2"), (4L, "s", "d")))
    val got = Snapshot.snapshotDiff(oldSnap, newSnap)
      .as[(Long, String, String)].collect().map(r => r._1 -> r._3).toMap
    assert(got == Map(1L -> "removed", 2L -> "unchanged", 3L -> "changed", 4L -> "added"))

    // per-source conservation on the derived-fixture profile:
    //   added+changed+unchanged = |new|, removed+changed+unchanged = |old|
    val docs = Tables.documents(spark, sf)
    val prof = Snapshot.snapshotDiffProfile(docs)
      .as[(String, Long, Long, Long, Long)].collect()
    assert(prof.nonEmpty && prof.map(_._2).sum > 0 && prof.map(_._3).sum > 0)
    val mut = Dedup.PortableHash(concat(lit("mut:"), col("doc_id").cast("string"))) % 8 < 1
    def count(member: String, extra: org.apache.spark.sql.Column = lit(true)) =
      docs.where(Dedup.PortableHash(concat(lit(member), col("doc_id").cast("string"))) % 10 < 9)
        .where(extra).groupBy(col("source")).count()
        .as[(String, Long)].collect().toMap
    val oldN = count("snapA:")
    val newN = count("snapB:")
    prof.foreach { case (src, added, removed, changed, unchanged) =>
      assert(added + changed + unchanged == newN.getOrElse(src, 0L), s"$src new side")
      assert(removed + changed + unchanged == oldN.getOrElse(src, 0L), s"$src old side")
    }
    assert(prof.map(_._4).sum > 0, "the 1/8 mutation rule must yield changed docs")
  }

  test("cooccurrence counts equal the naive sliding-window enumeration") {
    val events = Tables.events(spark, sf)
    val got = EventAnalytics.cooccurrenceCounts(events, 2)
      .as[(Long, Long, Long)].collect().toSeq
    val raw = EventAnalytics.withParsedProps(events)
      .select(col("user_id"), col("ts_sec"), col("event_id"), col("k"))
      .as[(Long, Long, Long, Option[Int])].collect()
    val naive = raw.groupBy(_._1).toSeq.flatMap { case (_, evs) =>
      val ks = evs.sortBy(e => (e._2, e._3)).map(_._4)
      ks.indices.flatMap { i =>
        Seq(1, 2).flatMap { off =>
          for { a <- ks(i); b <- if (i >= off) ks(i - off) else None }
            yield (math.min(a, b).toLong, math.max(a, b).toLong)
        }
      }
    }.groupBy(identity).map { case (p, xs) => (p._1, p._2, xs.size.toLong) }
      .toSeq.sortBy(p => (p._1, p._2))
    assert(got == naive)
    assert(got.nonEmpty && got.forall(p => p._1 <= p._2))
  }

  test("scd2 intervals: per-user tiling, consecutive versions, and every event covered by its own type") {
    val events = Tables.events(spark, sf)
    val iv = EventAnalytics.changeIntervals(events)
    // intervals tile [first event, sentinel): consecutive versions abut
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("version"))
    val tiled = iv.withColumn("next_from", lead(col("valid_from_sec"), 1).over(w))
    assert(tiled.where(col("next_from").isNotNull
      && col("valid_to_sec") =!= col("next_from")).count() == 0, "intervals must abut")
    assert(tiled.where(col("next_from").isNull
      && col("valid_to_sec") =!= 9999999999L).count() == 0, "last interval must stay open")
    val badVersion = iv.groupBy(col("user_id"))
      .agg(count(lit(1)).as("n"), max(col("version")).as("mx"), min(col("version")).as("mn"))
      .where(col("mx") =!= col("n") || col("mn") =!= 1)
    assert(badVersion.count() == 0, "versions must be 1..n per user")
    // reconstruction: an event strictly between change points carries the
    // type of the covering interval (the SCD2 read-back contract)
    val covered = events.select(col("user_id"), col("ts_sec"), col("event_id"),
        col("event_type").as("et"))
      .join(iv, Seq("user_id"))
      .where(col("ts_sec") >= col("valid_from_sec") && col("ts_sec") < col("valid_to_sec"))
    // ts ties at a change boundary legitimately mix types within one
    // second; exclude exactly those (same user, same second, >1 type)
    val mixed = events.groupBy(col("user_id"), col("ts_sec"))
      .agg(countDistinct(col("event_type")).as("nt")).where(col("nt") > 1)
      .select(col("user_id"), col("ts_sec"))
    val bad = covered.join(mixed, Seq("user_id", "ts_sec"), "left_anti")
      .where(col("et") =!= col("event_type"))
    assert(bad.count() == 0, "covered events must carry the interval's type")
  }

  test("systematic weighted sample: ~k rows, zero-weight rows excluded, partitioning-independent") {
    val docs = Tables.documents(spark, sf)
    val n = docs.count()
    val k = 40
    val picked = Sampling.systematicWeighted(docs, col("doc_id"), col("n_chars"), k)
    val ids = picked.select(col("doc_id")).as[Long].collect().sorted.toSeq
    assert(ids.size <= k, s"systematic sample can never exceed k (got ${ids.size})")
    assert(ids.size >= k / 2 && ids.nonEmpty, s"sample too small: ${ids.size} of $n")
    assert(picked.where(col("n_chars") <= 0).count() == 0)
    // same selection regardless of how the input happens to be partitioned
    val re = Sampling.systematicWeighted(docs.repartition(7, col("source")),
      col("doc_id"), col("n_chars"), k)
      .select(col("doc_id")).as[Long].collect().sorted.toSeq
    assert(re == ids, "selection must be a pure function of (id, weight)")
    // heavier docs are favored: sampled mean length ≥ corpus mean length
    val meanAll = docs.agg(avg(col("n_chars"))).head.getDouble(0)
    val meanSel = picked.agg(avg(col("n_chars"))).head.getDouble(0)
    assert(meanSel >= meanAll, f"weighting must favor heavy docs ($meanSel%.0f < $meanAll%.0f)")
  }

  test("personalized pagerank: mass never reaches a component without a seed") {
    // component A {1,2,3} is strongest → owns all 3 seeds; component B {4,5}
    // is disconnected, and with seed-only teleport must stay at rank 0
    val edges = Seq((1L, 2L, 10L), (2L, 3L, 8L), (1L, 3L, 5L), (4L, 5L, 1L))
      .toDF("item_a", "item_b", "pairs")
    val ranks = GraphRank.personalizedPageRank(edges)
      .as[(Long, Long)].collect().toMap
    assert(Seq(1L, 2L, 3L).forall(n => ranks(n) > 0), s"seed component lost mass: $ranks")
    assert(Seq(4L, 5L).forall(n => ranks(n) == 0), s"seedless component gained mass: $ranks")
  }

  test("weighted pagerank equals the naive fixed-point iteration, mass near-conserved") {
    val edges = EventAnalytics.cooccurrenceCounts(Tables.events(spark, sf), 2)
    val scale = 1000000000000L
    val got = GraphRank.weightedPageRank(edges, iterations = 10, k = 50, scale = scale)
      .as[(Long, Long)].collect().toSeq
    // naive driver-side reference on the collected edge list
    val e = edges.as[(Long, Long, Long)].collect()
    val dir = e.flatMap { case (a, b, w) =>
      if (a == b) Seq((a, b, w)) else Seq((a, b, w), (b, a, w)) }
    val strength = dir.groupBy(_._1).map { case (s, xs) => (s, xs.map(_._3).sum) }
    val nodes = strength.keys.toSeq.sorted
    val n = nodes.size.toLong
    val teleport = (15L * (scale / n)) / 100L
    var rank = nodes.map(_ -> scale / n).toMap
    for (_ <- 1 to 10) {
      val in = dir.groupBy(_._2).map { case (dst, es) =>
        dst -> es.map { case (src, _, w) => (rank(src) * w) / strength(src) }.sum }
      rank = nodes.map(v => v -> (teleport + (85L * in.getOrElse(v, 0L)) / 100L)).toMap
    }
    val expect = rank.toSeq.sortBy { case (v, r) => (-r, v) }.take(50)
    assert(got == expect)
    // integer division only sheds mass: total stays within n units per round
    val total = rank.values.sum
    assert(total <= scale && total >= scale - 11 * n * 100,
      s"mass drifted implausibly: $total of $scale")
  }

  test("bfs distances: crafted path graph and naive BFS equality on the real graph") {
    // path 1-2-3-4-5-6, heavy (1,2) edge: node 2's strength 11 (10+1) tops
    // node 1's 10, so the single seed is 2; hops=2 reaches {1,2,3,4}
    // (dist 1 = {1,3}, dist 2 = {4}); 5,6 stay unreached (dist/root −1)
    val path = Seq((1L, 2L, 10L), (2L, 3L, 1L), (3L, 4L, 1L), (4L, 5L, 1L), (5L, 6L, 1L))
      .toDF("item_a", "item_b", "pairs")
    val got = GraphRank.bfsDistances(path, seeds = 1, hops = 2)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      (-1L, -1L, 2L, 5L, 6L),
      (2L, 0L, 1L, 2L, 2L), (2L, 1L, 2L, 1L, 3L), (2L, 2L, 1L, 4L, 4L)), s"got $got")
    // real graph: census equals a naive driver-side multi-source BFS
    val edges = EventAnalytics.cooccurrenceCounts(Tables.events(spark, sf), 2)
    val e = edges.as[(Long, Long, Long)].collect()
    val adj = e.flatMap { case (a, b, _) =>
      if (a == b) Seq(a -> b) else Seq(a -> b, b -> a) }
      .groupBy(_._1).map { case (k, xs) => k -> xs.map(_._2).toSet }
    val strength = e.flatMap { case (a, b, w) =>
      if (a == b) Seq(a -> w) else Seq(a -> w, b -> w) }
      .groupBy(_._1).map { case (k, xs) => k -> xs.map(_._2).sum }
    val seeds = strength.toSeq.sortBy { case (n, s) => (-s, n) }.take(3).map(_._1)
    var lbl = seeds.map(s => s -> (0L, s)).toMap // node -> (dist, root), lex-min
    for (_ <- 1 to 4) {
      val prop = lbl.toSeq.flatMap { case (n, (d, r)) =>
        adj.getOrElse(n, Set.empty).map(m => m -> (d + 1, r)) }
      lbl = (lbl.toSeq ++ prop).groupBy(_._1)
        .map { case (n, xs) => n -> xs.map(_._2).min }
    }
    val naive = strength.keys.toSeq
      .map(n => lbl.get(n).map { case (d, r) => (r, d) }.getOrElse((-1L, -1L)) -> n)
      .groupBy(_._1)
      .map { case ((r, d), xs) =>
        (r, d, xs.size.toLong, xs.map(_._2).min, xs.map(_._2).max) }
      .toSeq.sortBy(t => (t._1, t._2))
    val gotReal = GraphRank.bfsDistances(edges, seeds = 3, hops = 4)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(gotReal == naive)
  }

  test("z-order: known interleaves, domain folding, and per-cell aligned rectangles") {
    // bit-level ground truth: x=3 (011), y=5 (101) → z = 1+2+4+32 = 39
    val pts = Seq((3L, 5L), (1L, 0L), (0L, 1L), (65536L + 3L, 5L))
      .toDF("x", "y")
      .select(ZOrder.zValue(col("x"), col("y")).as("z")).as[Long].collect().toSeq
    assert(pts == Seq(39L, 1L, 2L, 39L), s"morton codes wrong: $pts")
    // layout audit: 256 cells over 16-bit dims → every cell is an aligned
    // 4096×4096 rectangle in (partkey, suppkey) space
    val prof = ZOrder.zOrderProfile(Tables.lineitem(spark, sf),
      "l_partkey", "l_suppkey").collect()
    assert(prof.nonEmpty)
    prof.foreach { r =>
      val (xmin, xmax, ymin, ymax) =
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
      assert(xmin / 4096 == xmax / 4096 && ymin / 4096 == ymax / 4096,
        s"cell ${r.getLong(0)} not an aligned 4096-rectangle: $r")
    }
    // conservation: every lineitem row lands in exactly one cell
    assert(prof.map(_.getLong(1)).sum == Tables.lineitem(spark, sf).count())
  }

  test("HITS: bipartite hub/authority roles separate; fixed point exact; empty graph empty") {
    // directed bipartite: hubs {1,2} -> authorities {10,11,12}; hub 1 links
    // all three, hub 2 only the shared target 10. Expected values are the
    // 8-round integer recurrence replayed by an independent scalar
    // recompute (floor-div renorm keeps scores in [0, ~2·scale), so there
    // is no clean closed form — the point is the ROLES and the exact
    // arithmetic): authority(10) > authority(11) = authority(12) by the
    // shared-target symmetry, hub(1) > hub(2) by coverage, pure
    // authorities report hub 0 and pure hubs authority 0 — the role
    // separation PageRank on the symmetrized graph cannot express.
    val e = Seq((1L, 10L), (1L, 11L), (1L, 12L), (2L, 10L))
      .toDF("src", "dst").withColumn("w", lit(1L))
    val got = GraphRank.hitsScores(e).as[(Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      (10L, 1780859L, 0L), (11L, 1259256L, 0L), (12L, 1259256L, 0L),
      (1L, 0L, 1074842L), (2L, 0L, 445214L)), s"got $got")
    assert(got.forall { case (_, a, h) => a < 2000000L && h < 2000000L },
      "renormalized scores must stay under 2*scale")
    // empty transition graph (sparse-fuzz doctrine): empty output, no crash
    val none = Seq.empty[(Long, Long, Long)].toDF("src", "dst", "w")
    assert(GraphRank.hitsScores(none).count() == 0)
  }

  test("entity transitions: direction preserved, self-loops kept, null entities dropped") {
    val ev = Seq(
      (1L, 10L, """{"k":1}""", 100L), (2L, 10L, """{"k":2}""", 200L),
      (3L, 10L, """{"k":2}""", 300L), (4L, 10L, null.asInstanceOf[String], 400L),
      (5L, 10L, """{"k":1}""", 500L),
      (6L, 20L, """{"k":2}""", 100L), (7L, 20L, """{"k":1}""", 200L))
      .toDF("event_id", "user_id", "props", "ts_sec")
    val got = EventAnalytics.entityTransitions(ev)
      .as[(Long, Long, Long)].collect().toSet
    // user 10: 1->2, 2->2 (self-loop), 2->null dropped, null->1 dropped;
    // user 20: 2->1 — so (1,2) and (2,1) are DISTINCT edges
    assert(got == Set((1L, 2L, 1L), (2L, 2L, 1L), (2L, 1L, 1L)), s"got $got")
  }

  test("triangle census: crafted graphs and equality with the naive triple enumeration") {
    // K4 plus a pendant: every K4 node closes 3 of its wedges; the pendant
    // (node 5, degree 1) and its attachment point get the right coefficient
    val k4 = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L), (4L, 5L))
      .toDF("item_a", "item_b").withColumn("pairs", lit(1L))
    val got = GraphRank.triangleCounts(k4, k = 10)
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(got == Seq(
      (1L, 3L, 3L, 1.0), (2L, 3L, 3L, 1.0), (3L, 3L, 3L, 1.0),
      (4L, 4L, 3L, 0.5), (5L, 1L, 0L, 0.0)), s"got $got")
    // real graph: per-node counts equal the naive a<b<c enumeration
    val edges = EventAnalytics.cooccurrenceCounts(Tables.events(spark, sf), 2)
    val e = edges.as[(Long, Long, Long)].collect()
      .collect { case (a, b, _) if a < b => (a, b) }.toSet
    val nodes = e.flatMap(p => Seq(p._1, p._2))
    val triples = for {
      t <- e.toSeq; (a, b) = t; c <- nodes
      if b < c && e.contains((b, c)) && e.contains((a, c))
    } yield (a, b, c)
    val naive = triples.flatMap(t => Seq(t._1, t._2, t._3))
      .groupBy(identity).map { case (n, xs) => n -> xs.size.toLong }
    val gotReal = GraphRank.triangleCounts(edges, k = 1000)
      .as[(Long, Long, Long, Double)].collect()
    assert(gotReal.map(r => r._1 -> r._3).toMap ==
      nodes.map(n => n -> naive.getOrElse(n, 0L)).toMap)
  }

  test("type transitions: bigram conservation and row-conditional shares sum to ~100") {
    val events = Tables.events(spark, sf)
    val tt = EventAnalytics.typeTransitions(events).collect()
    // every user with n events contributes exactly n-1 bigrams
    val nEvents = events.count()
    val nUsers = events.select(col("user_id")).distinct().count()
    assert(tt.map(_.getLong(2)).sum == nEvents - nUsers)
    tt.groupBy(_.getString(0)).foreach { case (prev, rows) =>
      val s = rows.map(_.getDouble(3)).sum
      assert(s >= 99.0 && s <= 100.0001, s"$prev shares sum to $s")
    }
  }

  test("robust anomalies: a wild hour cannot mask a moderate outlier (MAD breakdown)") {
    // 47 calm hours alternating 99/101, one extreme hour (10000 events) and
    // one moderate outlier (160). Median = 101, MAD = 2 → the moderate hour
    // scores 59/2 = 29.5 and is flagged DESPITE the wild hour; a
    // mean/σ detector would fold the 10000 into σ and miss it.
    val rows =
      (for { h <- 0 until 47; i <- 1 to (if (h % 2 == 0) 99 else 101) }
        yield h.toLong * 3600 + i) ++
        (1 to 10000).map(i => 47L * 3600 + (i % 3600)) ++
        (1 to 160).map(i => 48L * 3600 + i)
    val out = EventAnalytics.hourlyAnomaliesRobust(rows.toDF("ts_sec"), 3.0)
      .collect()
    assert(out.map(_.getLong(0)).toSet == Set(47L * 3600, 48L * 3600),
      s"expected exactly the wild and moderate hours: ${out.mkString(",")}")
    val moderate = out.find(_.getLong(0) == 48L * 3600).get
    assert(moderate.getDouble(4) == 29.5, s"59/2 must score 29.5: $moderate")
  }

  test("conversion latency: crafted deltas land in exact log2 buckets; non-converters excluded") {
    // user 1: view@100, purchase@100 → delta 0 → bucket 0
    // user 2: view@100, purchase@103 → delta 3 → bucket 2
    // user 3: purchase@50 BEFORE first view@100, purchase@1124 after → delta 1024 → bucket 10
    // user 4: views only; user 5: purchases only — both excluded
    val ev = Seq(
      (1L, "view", 100L), (1L, "purchase", 100L),
      (2L, "view", 100L), (2L, "purchase", 103L),
      (3L, "purchase", 50L), (3L, "view", 100L), (3L, "purchase", 1124L),
      (4L, "view", 100L), (5L, "purchase", 100L)
    ).toDF("user_id", "event_type", "ts_sec")
    val got = EventAnalytics.conversionLatency(ev)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq((0L, 1L, 0L, 0L), (2L, 1L, 3L, 3L), (10L, 1L, 1024L, 1024L)),
      s"got $got")
  }

  test("revenue trend: a perfectly linear series recovers its exact slope") {
    // priority P: revenue 100.00 + 7.25/day over 10 days → slope 725 cents/day
    // priority F: constant revenue → slope 0; priority S: single day → 0
    val rows =
      (0 until 10).map(d => ("P", 86400L * (20000 + d), 100.0 + 7.25 * d)) ++
        (0 until 10).map(d => ("F", 86400L * (20000 + d), 55.5)) ++
        Seq(("S", 86400L * 20003, 10.0))
    val orders = rows.toDF("o_orderpriority", "sec", "o_totalprice")
      .withColumn("o_orderdate", timestamp_seconds(col("sec")))
    val got = Stats.dailyRevenueTrend(orders)
      .as[(String, Long, Double)].collect().toSeq
    assert(got == Seq(("F", 10L, 0.0), ("P", 10L, 725.0), ("S", 1L, 0.0)), s"got $got")
  }

  test("ab lift: arms partition users, wilson interval brackets the estimate") {
    val events = Tables.events(spark, sf)
    val arms = Stats.abConversionLift(events).collect()
    assert(arms.length == 2 && arms.map(_.getLong(0)).toSet == Set(0L, 1L))
    assert(arms.map(_.getLong(1)).sum ==
      events.select(col("user_id")).distinct().count())
    arms.foreach { r =>
      val (users, conv) = (r.getLong(1), r.getLong(2))
      val (pct, lo, hi) = (r.getDouble(3), r.getDouble(4), r.getDouble(5))
      assert(conv <= users)
      assert(lo <= pct + 1e-9 && pct <= hi + 1e-9, s"interval must bracket: $r")
      assert(lo >= 0.0 && hi <= 100.0, s"wilson stays inside [0,100]: $r")
    }
  }

  test("key skew histogram: crafted counts land in their exact log2 buckets") {
    // keys with 1, 3, 4, 7, 8, 1000 rows → buckets 0,1,2,2,3,9
    val rows = Seq(("a", 1), ("b", 3), ("c", 4), ("d", 7), ("e", 8), ("f", 1000))
      .flatMap { case (key, c) => Seq.fill(c)(key) }
    val hist = Skew.keySkewHistogram(rows.toDF("k"), Seq("k"))
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(hist == Seq(
      (0L, 1L, 1L, 1L, 1L),      // 1
      (1L, 1L, 3L, 3L, 3L),      // 3
      (2L, 2L, 11L, 4L, 7L),     // 4, 7
      (3L, 1L, 8L, 8L, 8L),      // 8
      (9L, 1L, 1000L, 1000L, 1000L))) // 1000 (2^9 ≤ 1000 < 2^10)
  }

  test("edit-distance-1 join: deletion-neighborhood candidates ≡ brute-force levenshtein ≤ 1") {
    // substitution (table/cable), deletion (table/able), insertion
    // (table/tables), identity (able=able), and distance-2 negatives
    // (table/cables is sub+ins, mango unrelated); duplicate-variant tokens
    // (aa→a twice) must not double-report a pair
    val left  = Seq("table", "aa", "mango").toDF("form")
    val right = Seq("cable", "able", "tables", "cables", "a", "aab").toDF("clean")
    val got = TextAnalysis.editDistance1Join(left, "form", right, "clean")
      .as[(String, String)].collect().toSet
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) => if (i == 0) j else if (j == 0) i else 0)
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val want = (for {
      a <- Seq("table", "aa", "mango"); b <- Seq("cable", "able", "tables", "cables", "a", "aab")
      if lev(a, b) <= 1
    } yield (a, b)).toSet
    assert(got == want, s"got $got want $want")
    assert(want.contains(("table", "cable")) && want.contains(("table", "able")) &&
      want.contains(("table", "tables")) && want.contains(("aa", "a")) &&
      want.contains(("aa", "aab")) && !want.exists(_._1 == "mango"))
  }

  test("CAS audit: crafted duplicate payloads yield exact copy and byte accounting") {
    // kind image: "xx" twice + "yyy" once; kind audio: "zzzz" three times
    val media = Seq(
      (1L, "image", "xx"), (2L, "image", "xx"), (3L, "image", "yyy"),
      (4L, "audio", "zzzz"), (5L, "audio", "zzzz"), (6L, "audio", "zzzz"))
      .toDF("media_id", "kind", "t")
      .select(col("media_id"), col("kind"), col("t").cast("binary").as("payload"))
    val got = Multimodal.casAudit(media)
      .as[(String, Long, Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      ("audio", 3L, 1L, 1L, 3L, 12L, 4L, 8L),
      ("image", 3L, 2L, 1L, 2L, 7L, 5L, 2L)))
  }

  test("SRM check: a crafted imbalanced day flags, a balanced day does not") {
    // find user ids for each arm under the registered hash rule
    val arm = (u: Long) => {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s"ab:$u".getBytes("UTF-8"))
      (md.take(6).foldLeft(0L)((acc, b) => (acc << 8) | (b & 0xffL)) % 2).toInt
    }
    val as = (0L until 200L).filter(arm(_) == 0).take(30)
    val bs = (0L until 200L).filter(arm(_) == 1).take(30)
    val day0 = 86400L * 100; val day1 = 86400L * 101
    // day0: 30 vs 30 (χ²=0); day1: 30 vs 5 → χ² = 625/35 ≈ 17.86 → SRM
    val rows = (as.map((day0, _)) ++ bs.map((day0, _)) ++
      as.map((day1, _)) ++ bs.take(5).map((day1, _))).zipWithIndex
      .map { case ((d, u), i) => (i.toLong, d + u, u, "view", 1.0) }
    val df = rows.toDF("event_id", "ts_sec", "user_id", "event_type", "value")
      .withColumn("ts", col("ts_sec").cast("timestamp"))
    val got = Stats.sampleRatioCheck(df)
      .as[(Long, Long, Long, Double, Long)].collect().toSeq
    assert(got == Seq(
      (day0, 30L, 30L, 0.0, 0L),
      (day1, 30L, 5L, math.floor(625.0 / 35.0 * 10000.0) / 10000.0, 1L)))
  }

  test("hourly OHLC: hand bars; same-second open/close ties broken by event_id") {
    val ev = Seq(
      (1L, 5L, 10.0), (2L, 600L, 30.0), (3L, 1200L, 5.0), (4L, 3599L, 20.0),
      // hour 1: two events in the SAME second — event_id orders open=7, close=9
      (5L, 3600L, 7.0), (6L, 3600L, 9.0))
      .toDF("event_id", "ts_sec", "value")
      .withColumn("ts", col("ts_sec").cast("timestamp"))
    val got = Stats.hourlyOhlc(ev)
      .as[(Long, Double, Double, Double, Double, Long, Double)].collect().toSeq
    assert(got == Seq(
      (0L, 10.0, 30.0, 5.0, 20.0, 4L, 65.0),
      (3600L, 7.0, 9.0, 7.0, 9.0, 2L, 16.0)), got.toString)
  }

  test("ABC classes: 80/15/5 revenue split lands one part per class; boundary cum=80% is A") {
    val li = Seq((1L, 50.0), (1L, 30.0), (2L, 15.0), (3L, 5.0))
      .toDF("l_partkey", "l_extendedprice")
    val got = Stats.abcClasses(li)
      .as[(String, Long, Double, Double, Double)].collect().toSeq
    assert(got == Seq(
      ("A", 1L, 33.3333, 80.0, 80.0),
      ("B", 1L, 33.3333, 15.0, 15.0),
      ("C", 1L, 33.3333, 5.0, 5.0)), got.toString)
  }

  test("Benford audit: digits from exact cents, zero-cent rows excluded, shares sum") {
    val o = Seq(1.00, 2.50, 19.99, 0.05, 0.00).zipWithIndex
      .map { case (p, i) => (i.toLong, p) }.toDF("o_orderkey", "o_totalprice")
    val got = Stats.benfordAudit(o).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got == Seq(("1", 2L, 50.0), ("2", 1L, 25.0), ("5", 1L, 25.0)), got.toString)
    val chis = Stats.benfordAudit(o).select(col("chi2")).as[Double].collect()
    assert(chis.forall(_ >= 0.0))
  }

  test("trimmed/winsorized means: 1..20 dollars → p05=1.95, p95=19.05, both means 10.5") {
    val o = (1 to 20).map(i => (i.toLong, i.toDouble)).toDF("o_orderkey", "o_totalprice")
    val got = Stats.trimmedMeans(o)
      .as[(Long, Double, Double, Long, Double, Double)].collect().head
    assert(got == ((20L, 1.95, 19.05, 18L, 10.5, 10.5)), got.toString)
  }

  test("association rules: support/confidence/lift from hand baskets; sub-support pairs pruned") {
    // baskets: u1{1,2} u2{1,2} u3{1,2} u4{1,3} u5{2} → with minSupport=2:
    // (1,2): n_ab=3, support 60%, confidence 3/4, lift 3·5/(4·4)=0.9375;
    // (1,3) has n_ab=1 → pruned
    val rows = Seq((1L, 1L), (1L, 2L), (2L, 1L), (2L, 2L), (3L, 1L), (3L, 2L),
      (4L, 1L), (4L, 3L), (5L, 2L)).zipWithIndex.map { case ((u, k), i) =>
      (i.toLong, u, "purchase", s"""{"k": $k}""")
    }
    val df = rows.toDF("event_id", "user_id", "event_type", "props")
    val got = EventAnalytics.associationRules(df, minSupport = 2)
      .as[(Long, Long, Long, Double, Double, Double)].collect().toSeq
    assert(got == Seq(
      (1L, 2L, 3L, 60.0, 75.0, 0.9375),
      (2L, 1L, 3L, 60.0, 75.0, 0.9375)), got.toString)
  }

  test("zonemap skip audit: scanned bounds matching on every layout; curves never scan more than x-sort") {
    val got = ZOrder.zonemapSkipAudit(Tables.lineitem(spark, sf), "l_partkey", "l_suppkey")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(3), r.getLong(4), r.getLong(5)))).toMap // total, scanned, matching
    assert(got.keySet == Set("hilbert", "xsort", "zorder"))
    got.values.foreach { case (total, scanned, matching) =>
      assert(matching <= scanned && scanned <= total, got.toString)
    }
    // same rows, same answer: rows_total and rows_matching agree across layouts
    assert(got.values.map(v => (v._1, v._3)).toSet.size == 1, got.toString)
    // the two-sided curves never lose to the single-column sort on the
    // registered wide-x × narrow-y rectangle (strictly better at sf≥0.01)
    assert(got("hilbert")._2 <= got("xsort")._2 && got("zorder")._2 <= got("xsort")._2)
  }

  test("linear attribution: largest-remainder micro-units, half-open lookback, zero-touch purchases drop") {
    // user 1: purchase at 10000 → lookback [6400, 10000); touches 6400 (h1),
    //   7200 (h2), 9999 (h2); n=3 → earliest gets 333334, others 333333
    // user 2: purchase at 7500 → [3900, 7500); touches 4000 (h1), 7200 (h2)
    //   (its view at 7500 is NOT a touch — half-open at the purchase second)
    // user 3: purchase with no views → no credit rows
    val rows = Seq(
      (10L, 1L, 10000L, "purchase"), (1L, 1L, 6400L, "view"),
      (2L, 1L, 7200L, "view"), (3L, 1L, 9999L, "view"),
      (11L, 2L, 7500L, "purchase"), (4L, 2L, 4000L, "view"),
      (5L, 2L, 7500L, "view"), (6L, 2L, 7200L, "view"),
      (12L, 3L, 50000L, "purchase"))
    val df = rows.toDF("event_id", "user_id", "ts_sec", "event_type")
      .withColumn("ts", col("ts_sec").cast("timestamp"))
    val got = Attribution.linearCreditByHour(df)
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(got == Seq(
      (1L, 2L, 2L, 833334.0 / 1000000.0),
      (2L, 3L, 2L, 1166666.0 / 1000000.0)), got.toString)
  }

  test("u-shaped attribution: 40/20/40 with largest-remainder middles; credit conserved per purchase") {
    // u1: purchase at 10000, views 6400(h1) 7200 8000 9999(h2) → n=4:
    //   0.4 / 0.1 / 0.1 / 0.4 — h1 gets 0.4, h2 gets 0.6
    // u2: purchase at 7500, views 4000 5000 6000 (all h1) → n=3: 0.4/0.2/0.4
    val rows = Seq(
      (10L, 1L, 10000L, "purchase"), (1L, 1L, 6400L, "view"), (2L, 1L, 7200L, "view"),
      (3L, 1L, 8000L, "view"), (4L, 1L, 9999L, "view"),
      (11L, 2L, 7500L, "purchase"), (5L, 2L, 4000L, "view"),
      (6L, 2L, 5000L, "view"), (7L, 2L, 6000L, "view"))
    val df = rows.toDF("event_id", "user_id", "ts_sec", "event_type")
      .withColumn("ts", col("ts_sec").cast("timestamp"))
    val got = Attribution.uShapedCreditByHour(df)
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(got == Seq((1L, 4L, 2L, 1.4), (2L, 3L, 1L, 0.6)), got.toString)
    // conservation: both models hand out exactly 1.0 per touched purchase
    val lin = Attribution.linearCreditByHour(df).agg(sum(col("credit"))).as[Double].head()
    val ush = Attribution.uShapedCreditByHour(df).agg(sum(col("credit"))).as[Double].head()
    assert(lin == 2.0 && ush == 2.0, (lin, ush).toString)
  }

  test("k-anonymity: hand classes band correctly and rows partition the table") {
    // classes: (0,A,0)x1 → k=1; (1,B,0)x3 → k=2-4; (2,C,0)x12 → k>=10
    val rows = Seq.fill(1)((0, "A", 100.0)) ++ Seq.fill(3)((1, "B", 100.0)) ++
      Seq.fill(12)((2, "C", 100.0))
    val df = rows.zipWithIndex.map { case ((n, s, b), i) => (i.toLong, n, s, b) }
      .toDF("c_custkey", "c_nationkey", "c_mktsegment", "c_acctbal")
    val got = DataQuality.kAnonymityCensus(df)
      .as[(String, Long, Long, Double)].collect().toSeq
    assert(got == Seq(
      ("k=1 identifiable", 1L, 1L, 6.25),
      ("k=2-4", 1L, 3L, 18.75),
      ("k>=10", 1L, 12L, 75.0)), got.toString)
  }

  test("view-revenue xcorr: planted 1-day lead maximizes r at lag +1") {
    // x(d) pseudo-random; purchase revenue on day d proportional to views
    // on day d-1 → pearson_r at lag +1 is (up to q4 floor) exactly 1
    val days = 10 to 30
    def x(d: Int) = (d * 37 % 11) + 1
    val rows = days.flatMap { d =>
      val views = (1 to x(d)).map(i => (d.toLong * 1000 + i, 5L,
        d.toLong * 86400 + i, "view", 0.0))
      val buy = if (d > days.head)
        Seq((d.toLong * 1000 + 999, 5L, d.toLong * 86400 + 500, "purchase",
          50.0 * x(d - 1))) else Seq.empty
      views ++ buy
    }
    val df = rows.toDF("event_id", "user_id", "ts_sec", "event_type", "value")
      .withColumn("ts", col("ts_sec").cast("timestamp"))
      .withColumn("ts_sec", col("ts_sec")) // Tables.events provides ts_sec; fixture keeps it
    val r = Stats.viewRevenueXcorr(df).collect()
      .map(row => row.getLong(0) -> row.getDouble(2)).toMap
    assert(r(1L) >= 0.9999, r.toString)
    assert(r(0L) < r(1L) && r(-1L) < r(1L), r.toString)
  }

  test("seasonal anomalies: a spiked wednesday flags against its own weekday, flat weekdays never judged") {
    // 9 weeks: every day 100 dollars, except week 5's wednesday at 500.
    // day 0 = 1970-01-01 (thu); wednesday = dow 2 → epoch days ≡ 6 mod 7
    val days = (0 until 63).map(_ + 6) // start on a wednesday
    val rows = days.zipWithIndex.map { case (d, i) =>
      val dollars = if (i == 35) 500.0 else 100.0 // i=35 is a wednesday (35 % 7 == 0)
      (i.toLong, d.toLong * 86400L, dollars)
    }
    val df = rows.toDF("o_orderkey", "sec0", "o_totalprice")
      .withColumn("o_orderdate", col("sec0").cast("timestamp"))
    val got = Stats.seasonalAnomalies(df).collect()
    assert(got.length == 1, got.mkString(","))
    assert(got(0).getAs[Long]("day_sec") == (6L + 35L) * 86400L
      && got(0).getAs[Long]("dow") == 2L
      && got(0).getAs[Double]("revenue_dollars") == 500.0
      && got(0).getAs[Double]("z") > 2.0, got(0).toString)
  }

  test("bootstrap median CI: constant data collapses the interval; real-data CI brackets the point") {
    val const = (1 to 200).map(i => (i.toLong, 50.0)).toDF("o_orderkey", "o_totalprice")
    val c = Stats.bootstrapMedianCi(const).head()
    assert(c.getAs[Long]("resamples") == 32L && c.getAs[Double]("median") == 50.0
      && c.getAs[Double]("ci_lo") == 50.0 && c.getAs[Double]("ci_hi") == 50.0, c.toString)
    val r = Stats.bootstrapMedianCi(Tables.orders(spark, sf)).head()
    assert(r.getAs[Double]("ci_lo") <= r.getAs[Double]("median")
      && r.getAs[Double]("median") <= r.getAs[Double]("ci_hi"), r.toString)
  }

  test("bootstrap median CI: too few surviving resamples emit no interval row") {
    // single order, key 1, R=4: the pinned MINSTD draws give resamples
    // r=1 and r=2 all-zero Poisson weight, so only nr=2 resamples produce
    // a median — below the nr>=4 floor the rank-2/rank-(nr-1) cuts invert,
    // so the operator must emit nothing rather than a degenerate interval
    val one = Seq((1L, 100.0)).toDF("o_orderkey", "o_totalprice")
    assert(Stats.bootstrapMedianCi(one, resamples = 4).count() == 0,
      "nr < 4 must suppress the interval row")
  }

  test("merkle ranges: disjoint ordered key ranges partition the table; xors fold to the global digest") {
    val li = Tables.lineitem(spark, sf)
    val cols = Seq(col("l_orderkey"), col("l_linenumber"), col("l_returnflag"),
      graft.functions.Cols.cents(col("l_extendedprice")))
    val ranges = DataQuality.rangeChecksums(li, col("l_orderkey"), cols).collect()
    val global = DataQuality.tableChecksum(li, cols).collect().head
    assert(ranges.map(_.getAs[Long]("rows")).sum == global.getAs[Long]("rows"))
    assert(ranges.map(_.getAs[Long]("xor_digest")).reduce(_ ^ _)
      == global.getAs[Long]("xor_digest"))
    val bounds = ranges.map(r => (r.getAs[Long]("key_lo"), r.getAs[Long]("key_hi")))
    bounds.foreach { case (lo, hi) => assert(lo <= hi) }
    assert(bounds.toSeq.sliding(2).forall {
      case Seq((_, h1), (l2, _)) => h1 < l2
      case _                     => true
    }, bounds.mkString(","))
  }

  test("gap sweep: sessions non-increasing in gap; the 3600 row equals withSessionId's count") {
    val ev = Tables.events(spark, sf)
    val sweep = Sessionize.gapSensitivity(ev).collect()
    val byGap = sweep.sortBy(_.getLong(0)).map(_.getAs[Long]("sessions"))
    assert(byGap.toSeq.sliding(2).forall { case Seq(a, b) => a >= b; case _ => true },
      byGap.mkString(","))
    val s3600 = sweep.find(_.getLong(0) == 3600L).get.getAs[Long]("sessions")
    val direct = Sessionize.withSessionId(ev.where(col("user_id").isNotNull))
      .select(col("session_id")).distinct().count()
    assert(s3600 == direct, s"$s3600 != $direct")
  }

  test("time-decay attribution: power-of-two half-life weights, div-floor shares, leftover to freshest") {
    // purchase at 10000; views 9999 (age 1 → bucket 0, w=8), 8000 (age 2000
    // → bucket 2, w=2), 6400 (age 3600 → bucket 3, w=1); Σw=11 →
    // parts 727272/181818/90909, leftover 1 unit → the freshest (rk=n)
    val rows = Seq((10L, 1L, 10000L, "purchase"), (1L, 1L, 6400L, "view"),
      (2L, 1L, 8000L, "view"), (3L, 1L, 9999L, "view"))
    val df = rows.toDF("event_id", "user_id", "ts_sec", "event_type")
      .withColumn("ts", col("ts_sec").cast("timestamp"))
    val got = Attribution.timeDecayCreditByHour(df)
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(got == Seq(
      (1L, 1L, 1L, 90909.0 / 1000000.0),
      (2L, 2L, 1L, 909091.0 / 1000000.0)), got.toString)
    // overflow guard at the EXACT int64 bound (r13): 45 buckets push
    // CreditUnits * 2^44 past Long.MaxValue — the require refuses
    intercept[IllegalArgumentException] {
      Attribution.timeDecayCreditByHour(df, lookback = 45L * 900L, halfLife = 900L)
    }
    // 44 buckets is the exact ceiling (10^6 * 2^43 = 8.80e18 < 9.22e18)
    // and must be accepted — the r12 flat 43 was one bucket conservative
    Attribution.timeDecayCreditByHour(df, lookback = 44L * 900L, halfLife = 900L).count()
  }

  test("split drift: chi2 is zero when both splits share one distribution; named category drifts") {
    // users hash-split by the usplit rule; craft per-user event sets so
    // shares are IDENTICAL across splits → every chi2 contribution is 0
    def arm(u: Long): Int = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s"usplit:$u".getBytes("UTF-8"))
      ((md.take(6).foldLeft(0L)((acc, b) => (acc << 8) | (b & 0xffL)) % 5) min 1).toInt
    }
    val trains = (0L until 100L).filter(arm(_) == 1).take(4) // 4 train users
    val tests  = (0L until 100L).filter(arm(_) == 0).take(2) // 2 test users
    // every user contributes one view and one click → identical shares
    val rows = (trains ++ tests).zipWithIndex.flatMap { case (u, i) =>
      Seq((i.toLong * 2, u, 100L, "view"), (i.toLong * 2 + 1, u, 200L, "click"))
    }
    val df = rows.toDF("event_id", "user_id", "ts_sec", "event_type")
      .withColumn("ts", col("ts_sec").cast("timestamp"))
    val got = Sampling.splitDriftAudit(df)
      .as[(String, Long, Long, Double, Double, Double)].collect().toSeq
    assert(got == Seq(
      ("click", 4L, 2L, 50.0, 50.0, 0.0),
      ("view", 4L, 2L, 50.0, 50.0, 0.0)), got.toString)
  }

  test("phrase census: overlapping matches count; repeated-token phrase; zero-match phrase drops") {
    val docs = Seq(
      (1L, "a b a b a"), // "a b a" matches at pos 0 AND 2 (overlap)
      (2L, "x a b a y"), // one more
      (3L, "b b b"))     // "b b" matches at pos 0 and 1
      .toDF("doc_id", "text")
    val got = TextAnalysis.phraseCensus(docs,
        Seq(Seq("a", "b", "a"), Seq("b", "b"), Seq("zz")))
      .as[(String, Long, Long)].collect().toSeq
    assert(got == Seq(("a b a", 2L, 3L), ("b b", 1L, 2L)), got.toString)
  }

  test("dow seasonality: epoch-day arithmetic names 1970-01-01 thursday; balanced days index 1") {
    // one 10-dollar order on each of thu 1970-01-01, fri 1970-01-02, mon 1970-01-05
    val o = Seq((1L, 0L, 10.0), (2L, 86400L, 10.0), (3L, 4L * 86400L, 10.0))
      .toDF("o_orderkey", "sec0", "o_totalprice")
      .withColumn("o_orderdate", col("sec0").cast("timestamp"))
    val got = Stats.dowSeasonality(o)
      .as[(Long, String, Long, Long, Double, Double)].collect().toSeq
    assert(got == Seq(
      (0L, "mon", 1L, 1L, 10.0, 1.0),
      (3L, "thu", 1L, 1L, 10.0, 1.0),
      (4L, "fri", 1L, 1L, 10.0, 1.0)), got.toString)
  }
}
