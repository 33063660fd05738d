package graft

import org.apache.spark.sql.functions._

import graft.operators._
import graft.sources.Tables

/** Invariants of the two-sample / contingency hypothesis-test operators. */
class HypothesisSpec extends SparkSpec {
  import spark.implicits._

  test("two-sample cum frame: cumulative counts are monotone and end at the totals") {
    val cum = Hypothesis.twoSampleCumFrame(Tables.orders(spark, sf))
    val rows = cum.orderBy(col("v")).collect()
    assert(rows.nonEmpty)
    var c1 = 0L; var c2 = 0L
    rows.foreach { r =>
      c1 += r.getAs[Long]("c1"); c2 += r.getAs[Long]("c2")
      assert(r.getAs[Long]("cum1") == c1, s"cum1 drift at v=${r.getAs[Long]("v")}")
      assert(r.getAs[Long]("cum2") == c2, s"cum2 drift at v=${r.getAs[Long]("v")}")
    }
    assert(rows.last.getAs[Long]("cum1") == rows.head.getAs[Long]("n1"))
    assert(rows.last.getAs[Long]("cum2") == rows.head.getAs[Long]("n2"))
  }

  test("ks: D matches the naive single-threaded scan; bounds hold") {
    val orders = Tables.orders(spark, sf)
    val ks = Hypothesis.ksTest(orders).collect()(0)
    val (n1, n2) = (ks.getAs[Long]("n1"), ks.getAs[Long]("n2"))
    assert(n1 > 0 && n2 > 0)
    val d = ks.getAs[Double]("ks_stat")
    assert(d >= 0.0 && d <= 1.0)
    // naive: sort the two samples driver-side, walk the merged step function
    val vals = orders.select(
        (expr("CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)")).as("v"),
        col("o_orderpriority").isin("1-URGENT", "2-HIGH").as("a1"))
      .as[(Long, Boolean)].collect()
    val s1 = vals.filter(_._2).map(_._1).sorted
    val s2 = vals.filterNot(_._2).map(_._1).sorted
    val steps = (s1 ++ s2).distinct.sorted
    val dNaive = steps.map { v =>
      math.abs(s1.count(_ <= v).toDouble / s1.length - s2.count(_ <= v).toDouble / s2.length)
    }.max
    assert(math.abs(d - dNaive) < 2e-6, s"engine D=$d naive D=$dNaive")
  }

  test("rank-sum: u2 matches the naive doubled rank sum; AUC symmetric bound") {
    val orders = Tables.orders(spark, sf)
    val rs = Hypothesis.rankSumTest(orders).collect()(0)
    val (n1, n2) = (rs.getAs[Long]("n1"), rs.getAs[Long]("n2"))
    val u2 = rs.getAs[Long]("u2")
    assert(u2 >= 0 && u2 <= 2 * n1 * n2, "0 <= U <= n1*n2")
    val auc = rs.getAs[Double]("auc")
    assert(auc >= 0.0 && auc <= 1.0)
    // naive doubled midranks on the driver
    val vals = orders.select(
        (expr("CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)")).as("v"),
        col("o_orderpriority").isin("1-URGENT", "2-HIGH").as("a1"))
      .as[(Long, Boolean)].collect()
    val byV = vals.groupBy(_._1).toSeq.sortBy(_._1)
    var cb = 0L; var w2 = 0L
    byV.foreach { case (_, g) =>
      val c1 = g.count(_._2).toLong; val t = g.length.toLong
      w2 += c1 * (2 * cb + t + 1)
      cb += t
    }
    assert(u2 == w2 - n1 * (n1 + 1), s"engine u2=$u2 naive=${w2 - n1 * (n1 + 1)}")
  }

  test("kendall: blocked pair counts equal the naive enumeration at several block counts") {
    val ev = Tables.events(spark, sf)
    val naive = {
      val daily = ev.withColumn("day", expr("ts_sec div 86400"))
        .groupBy(col("day"))
        .agg(functions.Cols.countWhen(col("event_type") === "view").as("x"),
          coalesce(sum(when(col("event_type") === "purchase",
            functions.Cols.cents(col("value")))), lit(0L)).as("y"))
        .as[(Long, Long, Long)].collect().sortBy(_._1)
      var (c, d, tx, ty, n0) = (0L, 0L, 0L, 0L, 0L)
      for (i <- daily.indices; j <- (i + 1) until daily.length) {
        val p = (daily(j)._2 - daily(i)._2) * (daily(j)._3 - daily(i)._3)
        n0 += 1
        if (p > 0) c += 1 else if (p < 0) d += 1
        if (daily(i)._2 == daily(j)._2) tx += 1
        if (daily(i)._3 == daily(j)._3) ty += 1
      }
      (n0, c, d, tx, ty)
    }
    for (b <- Seq(1, 3, 4, 7)) {
      val r = Hypothesis.kendallTauDaily(ev, numBlocks = b).collect()(0)
      assert((r.getAs[Long]("n0"), r.getAs[Long]("concordant"),
        r.getAs[Long]("discordant"), r.getAs[Long]("tie_x"),
        r.getAs[Long]("tie_y")) == naive, s"blocked(b=$b) != naive")
    }
  }

  test("kaplan-meier: survival matches the naive driver fold; monotone non-increasing in h") {
    val ev = Tables.events(spark, sf)
    val km = Hypothesis.survivalKm(ev).orderBy(col("h")).collect()
    assert(km.nonEmpty)
    // monotone: S(h) non-increasing, events cumulative non-decreasing
    km.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getAs[Double]("survival") >= b.getAs[Double]("survival") - 1e-12)
        assert(a.getAs[Long]("events") <= b.getAs[Long]("events"))
      case _ =>
    }
    // naive: driver-side KM over the same user durations
    val users = ev.where(col("user_id").isNotNull)
      .groupBy(col("user_id"))
      .agg(min(col("ts_sec")).as("t0"), max(col("ts_sec")).as("tl"),
        min(when(col("event_type") === "purchase", col("ts_sec"))).as("tp"))
      .select(
        when(col("tp").isNotNull, col("tp") - col("t0"))
          .otherwise(col("tl") - col("t0")).as("obs"),
        col("tp").isNotNull.as("ev"))
      .as[(Long, Boolean)].collect()
    val n = users.length.toLong
    val eventTimes = users.filter(_._2).groupBy(_._1).view.mapValues(_.length.toLong)
      .toSeq.sortBy(_._1)
    km.foreach { r =>
      val h = r.getAs[Long]("h")
      var s = 1.0
      eventTimes.filter(_._1 <= h).foreach { case (t, d) =>
        val atRisk = n - users.count(_._1 < t)
        s = s * (1.0 - d.toDouble / atRisk.toDouble)
      }
      val sQ = math.floor(s * 1e6) / 1e6
      assert(math.abs(r.getAs[Double]("survival") - sQ) < 1e-12,
        s"h=$h engine=${r.getAs[Double]("survival")} naive=$sQ")
    }
  }

  test("markov stationary: matches the naive integer power iteration exactly") {
    val ev = Tables.events(spark, sf)
    val engine = GraphRank.markovStationary(ev).collect()
      .map(r => (r.getAs[String]("state"), r.getAs[Long]("rank"))).toMap
    // naive: collect the bigram matrix, run the identical recurrence
    val trans = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts_sec"), col("event_id"))
    val tr = ev.withColumn("src", lag(col("event_type"), 1).over(trans))
      .where(col("src").isNotNull)
      .groupBy(col("src"), col("event_type").as("dst"))
      .agg(count(lit(1)).as("w"))
      .as[(String, String, Long)].collect()
    val s = tr.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    val states = (tr.map(_._1) ++ tr.map(_._2)).distinct.sorted
    val scale = 1000000000000L
    val k = states.length
    var rank = states.map(st => st -> scale / k).toMap
    for (_ <- 1 to 12) {
      val in = tr.groupBy(_._2).view.mapValues(
        _.map { case (src, _, w) => rank(src) * w / s(src) }.sum).toMap
      rank = states.map(st =>
        st -> ((15L * (scale / k)) / 100L + 85L * in.getOrElse(st, 0L) / 100L)).toMap
    }
    assert(engine == rank, s"engine=$engine naive=$rank")
  }

  test("cuped: variance reduction in [0,1]; adjusted lift equals raw when theta is 0") {
    val r = Hypothesis.cupedLift(Tables.events(spark, sf)).collect()(0)
    assert(r.getAs[Long]("users") == r.getAs[Long]("n0") + r.getAs[Long]("n1"))
    val vr = r.getAs[Double]("var_reduction")
    assert(vr >= 0.0 && vr <= 1.0)
    // CUPED leaves the expectation unbiased: with theta = 0 the adjustment
    // vanishes, and in general the two lifts differ only by the theta term
    if (r.getAs[Double]("theta") == 0.0)
      assert(r.getAs[Double]("lift_cuped") == r.getAs[Double]("lift_raw"))
  }

  test("mantel-haenszel: pooled cells are the stratum sums; RRs non-negative") {
    val rows = Hypothesis.mantelHaenszel(Tables.events(spark, sf)).collect()
    val strata = rows.filter(_.getAs[Long]("stratum") != 99L)
    val pooled = rows.find(_.getAs[Long]("stratum") == 99L).get
    for (cOl <- Seq("a", "b", "c", "d"))
      assert(pooled.getAs[Long](cOl) == strata.map(_.getAs[Long](cOl)).sum)
    rows.foreach(r => assert(r.getAs[Double]("risk_ratio") >= 0.0))
  }

  test("mmr: fixture picks are distinct per query, pick 1 is the top-rel candidate") {
    val emb = Tables.embeddings(spark, sf)
    val mmr = Similarity.mmrRerank(emb).collect()
    val byQ = mmr.groupBy(_.getAs[Long]("query_id"))
    byQ.foreach { case (qid, rows) =>
      val picks = rows.map(_.getAs[Long]("neighbor_id"))
      assert(picks.distinct.length == picks.length, s"q=$qid repeated pick")
      assert(rows.map(_.getAs[Long]("pick")).sorted.sameElements(1L to rows.length))
    }
    val top1 = Similarity.topKCosine(emb, emb.where(col("vec_id") < 3), 1)
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toMap
    byQ.foreach { case (qid, rows) =>
      val first = rows.find(_.getAs[Long]("pick") == 1L).get.getAs[Long]("neighbor_id")
      assert(first == top1(qid), s"q=$qid MMR pick 1 != cosine top-1")
    }
  }

  test("mmr: a near-duplicate of pick 1 is demoted below a diverse candidate") {
    // query [1,0,0]; candidates 0/1 are near-identical twins at +45°, 2
    // sits at -45° — equally relevant but orthogonal to the twins. Pure
    // top-2 = the twin pair; MMR must take the diverse vector at pick 2
    // (twin penalty ~0.3·1.0 vs diverse penalty ~0.3·0).
    val rows = Seq(
      (100L, Array(1.0f, 0.0f, 0.0f), "q"),
      (0L, Array(0.7f, 0.7f, 0.0f), "a"),
      (1L, Array(0.7f, 0.70001f, 0.0f), "a"), // near-duplicate of vec 0
      (2L, Array(0.7f, -0.7f, 0.0f), "b"))    // diverse, same relevance
    val emb = spark.createDataFrame(rows).toDF("vec_id", "embedding", "label")
    val mmr = Similarity.mmrRerank(emb, nQueries = 101, listK = 3, k = 2)
      .where(col("query_id") === 100L).orderBy(col("pick")).collect()
    assert(mmr(0).getAs[Long]("neighbor_id") == 0L)
    assert(mmr(1).getAs[Long]("neighbor_id") == 2L,
      "diversification must beat the near-duplicate twin")
  }

  test("qte: per-quantile diffs equal treatment minus control; quantiles monotone per arm") {
    val rows = Hypothesis.quantileTreatmentEffect(Tables.events(spark, sf)).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (c, t) = (r.getAs[Double]("control"), r.getAs[Double]("treatment"))
      assert(r.getAs[Double]("qte") == math.floor((t - c) * 1e4) / 1e4)
    }
    val byLabel = rows.map(r => r.getAs[String]("quantile") ->
      (r.getAs[Double]("control"), r.getAs[Double]("treatment"))).toMap
    for (arm <- Seq[((Double, Double)) => Double](_._1, _._2))
      assert(arm(byLabel("p25")) <= arm(byLabel("p50"))
        && arm(byLabel("p50")) <= arm(byLabel("p75")))
  }

  test("eb shrinkage: shrunk rates sit between the raw rate and the pooled prior mean") {
    val rows = Hypothesis.ebShrinkage(spark, sf).collect()
    assert(rows.nonEmpty)
    // prior mean: unweighted mean of group rates (the operator's mu)
    val mu = rows.map(r =>
      r.getAs[Long]("buyers").toDouble / r.getAs[Long]("customers")).sum / rows.length
    rows.foreach { r =>
      val raw = r.getAs[Double]("rate_pct")
      val shrunk = r.getAs[Double]("shrunk_pct")
      val lo = math.min(raw, mu * 100.0) - 1e-3
      val hi = math.max(raw, mu * 100.0) + 1e-3
      assert(shrunk >= lo && shrunk <= hi,
        s"nation=${r.getAs[Long]("c_nationkey")} shrunk=$shrunk outside [$lo,$hi]")
    }
  }

  test("power analysis: required n shrinks as the base rate's detectable delta grows") {
    val r = Hypothesis.powerAnalysis(Tables.events(spark, sf)).collect()(0)
    assert(r.getAs[Long]("units") > 0)
    assert(r.getAs[Double]("target_rate_pct") > r.getAs[Double]("base_rate_pct"))
    assert(r.getAs[Long]("n_per_arm") > 0)
  }

  test("rbo: bounded by the identical-list ceiling 1 - p^k; zero iff no overlap") {
    val r = Retrieval.rboLexicalDense(Tables.documents(spark, sf),
      Tables.embeddings(spark, sf)).collect()(0)
    val k = r.getAs[Long]("depth").toInt
    val ceiling = 1.0 - math.pow(0.9, k) // identical top-k lists
    val rbo = r.getAs[Double]("rbo")
    assert(rbo >= 0.0 && rbo <= ceiling + 1e-9, s"rbo=$rbo ceiling=$ceiling")
    assert(r.getAs[Long]("overlap_at_k") >= 0 && r.getAs[Long]("overlap_at_k") <= k)
    if (r.getAs[Long]("overlap_at_k") == 0) assert(rbo == 0.0)
  }

  test("langid confusion: cells partition the corpus; margin shares sum to 100 per class") {
    val docs = Tables.documents(spark, sf)
    val rows = TextAnalysis.langIdConfusion(docs).collect()
    assert(rows.map(_.getAs[Long]("docs")).sum == docs.count())
    rows.groupBy(_.getAs[String]("labeled_lang")).foreach { case (_, g) =>
      val s = g.map(_.getAs[Double]("recall_pct")).sum
      assert(s > 99.9 && s <= 100.0001, s"recall shares must sum to ~100: $s")
    }
    rows.groupBy(_.getAs[String]("predicted_lang")).foreach { case (_, g) =>
      val s = g.map(_.getAs[Double]("precision_pct")).sum
      assert(s > 99.9 && s <= 100.0001, s"precision shares must sum to ~100: $s")
    }
  }

  test("jackknife CI: brackets the point rate and tightens with more data") {
    val r = Hypothesis.jackknifeRateCi(Tables.events(spark, sf)).collect()(0)
    val rate = r.getAs[Double]("rate_pct")
    assert(r.getAs[Double]("ci_lo_pct") <= rate && rate <= r.getAs[Double]("ci_hi_pct"))
    assert(r.getAs[Long]("users") >= r.getAs[Long]("converters"))
  }

  test("order reconciliation: every order and orphan lands in exactly one band") {
    val rec = DataQuality.orderReconciliation(spark, sf).collect()
    val orders = Tables.orders(spark, sf).count()
    val detailOnly = rec.filter(_.getAs[String]("band") == "orphan_detail")
      .map(_.getAs[Long]("orders")).sum
    assert(rec.map(_.getAs[Long]("orders")).sum == orders + detailOnly,
      "bands must partition headers plus detail-orphans")
    rec.foreach { b =>
      assert(b.getAs[String]("band").matches("orphan_(header|detail)|ratio_\\d{4}"))
    }
  }

  test("product analytics: funnel arms partition users; stickiness <= 100; new+returning = DAU") {
    val ev = Tables.events(spark, sf)
    val funnel = EventAnalytics.funnelByArm(ev).collect()
    val totalUsers = ev.where(col("user_id").isNotNull)
      .select(col("user_id")).distinct().count()
    assert(funnel.map(_.getAs[Long]("users")).sum == totalUsers)
    funnel.foreach { r =>
      assert(r.getAs[Long]("viewed") <= r.getAs[Long]("users"))
      assert(r.getAs[Double]("view_to_click_pct") <= 100.0001)
    }
    val st = EventAnalytics.stickiness(ev).collect()
    st.foreach { r =>
      assert(r.getAs[Long]("dau") <= r.getAs[Long]("wau"))
      assert(r.getAs[Double]("stickiness_pct") <= 100.0001)
    }
    val nvr = EventAnalytics.newVsReturning(ev).collect()
    val dauByDay = st.map(r => r.getAs[Long]("day_sec") -> r.getAs[Long]("dau")).toMap
    nvr.foreach { r =>
      assert(r.getAs[Long]("new_users") + r.getAs[Long]("returning_users")
        == dauByDay(r.getAs[Long]("day_sec")),
        "new + returning must equal that day's actives")
    }
    assert(nvr.head.getAs[Long]("returning_users") == 0L
      || nvr.head.getAs[Long]("new_users") > 0, "the first day is all-new")
  }

  test("embedding outliers: a planted far vector is flagged; clean classes flag nothing") {
    // two tight clusters plus one vector far from its own class centroid
    val mk = (base: Float) => Array.fill(4)(base)
    val rows = Seq(
      (0L, mk(1.0f), 0), (1L, mk(1.01f), 0), (2L, mk(0.99f), 0),
      (3L, mk(1.0f), 0), (4L, Array.fill(4)(9.0f), 0), // the planted outlier
      (10L, mk(5.0f), 1), (11L, mk(5.01f), 1), (12L, mk(4.99f), 1))
    val emb = spark.createDataFrame(rows).toDF("vec_id", "embedding", "label")
    val got = Similarity.centroidOutliers(emb).collect()
    val c0 = got.find(_.getAs[Long]("label") == 0L).get
    assert(c0.getAs[Long]("outliers") == 1L, s"planted outlier must be flagged: ${got.toSeq}")
    val c1 = got.find(_.getAs[Long]("label") == 1L).get
    assert(c1.getAs[Long]("outliers") == 0L, s"tight class must be clean: ${got.toSeq}")
  }

  test("neyman allocation: quotas sum exactly to the budget; high-variance strata earn more") {
    val rows = Sampling.neymanAllocation(Tables.orders(spark, sf)).collect()
    assert(rows.map(_.getAs[Long]("quota")).sum == 1000L, "Hamilton rule must hit the budget exactly")
    // allocation ordering follows N*sigma ordering (same N-scale strata here)
    val byWeight = rows.sortBy(r => -r.getAs[Long]("stratum_n") * r.getAs[Double]("sigma"))
    val byQuota = rows.sortBy(-_.getAs[Long]("quota"))
    assert(byWeight.head.getAs[String]("stratum") == byQuota.head.getAs[String]("stratum"),
      "the heaviest N*sigma stratum must receive the largest quota")
  }

  test("langid calibration: bins partition the corpus; rates bounded") {
    val docs = Tables.documents(spark, sf)
    val rows = TextAnalysis.langidCalibration(docs).collect()
    assert(rows.map(_.getAs[Long]("docs")).sum == docs.count())
    rows.foreach { r =>
      assert(r.getAs[Long]("en_docs") <= r.getAs[Long]("docs"))
      val d = r.getAs[Long]("score_decile")
      assert(d >= 0 && d <= 10)
    }
  }

  test("degenerate inputs: empty arm, fully-tied series, saturated rate, whole-population bucket") {
    // one-arm orders: the two-sample tests emit NO verdict row, not NaN
    val oneArm = spark.createDataFrame(Seq(
      (1L, 100.0, "5-LOW"), (2L, 200.0, "5-LOW"), (3L, 300.0, "5-LOW")))
      .toDF("o_orderkey", "o_totalprice", "o_orderpriority")
    assert(Hypothesis.ksTest(oneArm).count() == 0)
    assert(Hypothesis.rankSumTest(oneArm).count() == 0)
    // constant daily series: tau-b reports 0.0 instead of NaN
    val constEv = spark.createDataFrame(
      (1 to 8).map(i => (i.toLong, 1L, i.toLong * 86400L, "view", 1.0)))
      .toDF("event_id", "user_id", "ts_sec", "event_type", "value")
    val kt = Hypothesis.kendallTauDaily(constEv).collect()(0)
    assert(kt.getAs[Double]("tau_b") == 0.0 && !kt.getAs[Double]("tau_b").isNaN)
    // every user-day converts: required n reports 0, not a NaN ceiling
    val satEv = spark.createDataFrame(
      (1 to 6).map(i => (i.toLong, (i % 3).toLong, i.toLong, "purchase", 1.0)))
      .toDF("event_id", "user_id", "ts_sec", "event_type", "value")
    val pw = Hypothesis.powerAnalysis(satEv).collect()(0)
    assert(pw.getAs[Long]("n_per_arm") == 0L)
    // three users land in few hash buckets; the jackknife must not divide
    // by zero even if one bucket holds everyone
    val ci = Hypothesis.jackknifeRateCi(satEv).collect()(0)
    assert(!ci.getAs[Double]("ci_lo_pct").isNaN && !ci.getAs[Double]("ci_hi_pct").isNaN)
  }

  test("chi-square on a single-level axis: dof 0, V = 0.0, no ANSI divide error") {
    // every event in ONE day-of-week (the oneday fuzz shape): min(r,c)-1 = 0
    val oneDow = spark.createDataFrame(
      (1 to 6).map(i => (i.toLong, 1L, 100L + i, if (i % 2 == 0) "view" else "click", 1.0)))
      .toDF("event_id", "user_id", "ts_sec", "event_type", "value")
    val r = Hypothesis.chisqIndependence(oneDow).collect()(0)
    assert(r.getAs[Long]("dow_levels") == 1L && r.getAs[Long]("dof") == 0L
      && r.getAs[Double]("cramers_v") == 0.0, r.toString)
  }

  test("rank-sum on a fully-tied sample: z is 0.0 (zero variance = zero signal), never NaN") {
    // both arms present but every value identical: varU = 0 and the
    // unguarded z divides 0/0 — the guard must emit the kendall-style 0.0
    val tied = spark.createDataFrame(Seq(
      (1L, 100.0, "1-URGENT"), (2L, 100.0, "1-URGENT"),
      (3L, 100.0, "5-LOW"), (4L, 100.0, "5-LOW")))
      .toDF("o_orderkey", "o_totalprice", "o_orderpriority")
    val r = Hypothesis.rankSumTest(tied).collect()
    assert(r.length == 1, "two populated arms must still emit a verdict row")
    assert(r(0).getAs[Double]("z") == 0.0 && !r(0).getAs[Double]("z").isNaN, r(0).toString)
    assert(r(0).getAs[Double]("auc") == 0.5, "all-tied AUC is exactly 1/2")
  }

  test("cuped with every user hashed into one arm: no verdict row, never NaN lifts") {
    // users 1,4,6,10 all hash (md5_48("ab:" || uid) % 2) to arm 0
    val oneArm = spark.createDataFrame(Seq(
      (1L, 1L, 100L, "purchase", 10.0), (2L, 4L, 200L, "purchase", 20.0),
      (3L, 6L, 300L, "purchase", 30.0), (4L, 10L, 400L, "purchase", 40.0)))
      .toDF("event_id", "user_id", "ts_sec", "event_type", "value")
    assert(Hypothesis.cupedLift(oneArm).count() == 0,
      "a one-arm split has no lift to report")
  }

  test("final four: coverage bounded; envelope monotone; temperature flattens; fano non-negative") {
    val cov = Relational.catalogCoverage(spark, sf).collect()
    cov.foreach { r =>
      assert(r.getAs[Long]("sold_parts") <= r.getAs[Long]("parts"))
      assert(r.getAs[Double]("coverage_pct") <= 100.0001)
    }
    val env = Relational.trafficEnvelope(Tables.events(spark, sf)).collect()
      .groupBy(_.getAs[Long]("hod"))
    env.foreach { case (_, g) =>
      val byQ = g.map(r => r.getAs[String]("quantile") -> r.getAs[Double]("events")).toMap
      assert(byQ("p25") <= byQ("p50") && byQ("p50") <= byQ("p75"))
    }
    // temperature sampling sits between raw share and uniform: the largest
    // source's sampled share shrinks vs its token share, the smallest grows
    val mt = CorpusFilters.mixtureTemperature(Tables.documents(spark, sf)).collect()
    val top = mt.maxBy(_.getAs[Long]("source_tokens"))
    val bot = mt.minBy(_.getAs[Long]("source_tokens"))
    if (top.getAs[Long]("source_tokens") > bot.getAs[Long]("source_tokens")) {
      assert(top.getAs[Double]("sampled_share_pct") <= top.getAs[Double]("token_share_pct") + 1e-3)
      assert(bot.getAs[Double]("sampled_share_pct") >= bot.getAs[Double]("token_share_pct") - 1e-3)
    }
    val fano = Stats.burstiness(Tables.events(spark, sf)).collect()
    fano.foreach(r => assert(r.getAs[Double]("fano") >= 0.0
      && r.getAs[Double]("mean_per_hour") > 0.0))
  }

  test("temperature smoothing compresses the share range monotonically") {
    // τ = 2 sampling (share^(1/2), renormalized) must (a) preserve the
    // source ordering (sqrt is monotone), (b) up-weight every source below
    // the uniform share and down-weight every source above it, and (c)
    // strictly shrink the max/min share ratio (to its square root, up to
    // the 1e-4 output quantization) — the "compresses the weight range"
    // property of the mBERT/XLM-R sampling rule.
    val mt = CorpusFilters.mixtureTemperature(Tables.documents(spark, sf))
      .collect()
      .map(r => (r.getAs[Double]("token_share_pct"),
        r.getAs[Double]("sampled_share_pct")))
      .sortBy(_._1)
    assert(mt.length >= 2, "need at least two sources for a range")
    mt.sliding(2).foreach { case Array((t1, s1), (t2, s2)) =>
      assert(t1 <= t2 && s1 <= s2 + 1e-3,
        s"sampled shares must preserve token-share order: ($t1,$s1) vs ($t2,$s2)")
    }
    val uniform = 100.0 / mt.length
    mt.foreach { case (t, s) =>
      if (t < uniform - 0.1) assert(s >= t - 1e-3, s"below-uniform source must not shrink: $t -> $s")
      if (t > uniform + 0.1) assert(s <= t + 1e-3, s"above-uniform source must not grow: $t -> $s")
    }
    val (tMin, sMin) = mt.head
    val (tMax, sMax) = mt.last
    if (tMin > 0 && tMax / tMin > 1.01) {
      val rawRatio = tMax / tMin
      val smoothed = sMax / sMin
      assert(smoothed < rawRatio,
        s"share ratio must compress: $rawRatio -> $smoothed")
      assert(math.abs(smoothed - math.sqrt(rawRatio)) < 0.02 * math.sqrt(rawRatio),
        s"τ=2 compresses the ratio to its square root: got $smoothed vs ${math.sqrt(rawRatio)}")
    }
  }

  test("chi-square: a crafted independent table scores ~0; a deterministic one scores V=1") {
    // independent: every (type, dow) cell has exactly 5 events -> chi2 = 0
    val indep = (for {
      t <- Seq("view", "click"); d <- 0L until 7L; i <- 1 to 5
    } yield (t, d, i)).zipWithIndex.map { case ((t, d, _), i) =>
      (i.toLong, 1L, (d + 4) * 86400L + i, t, 1.0) // (day+3)%7 cycles over dows
    }
    val dfI = spark.createDataFrame(indep)
      .toDF("event_id", "user_id", "ts_sec", "event_type", "value")
    val rI = Hypothesis.chisqIndependence(dfI).collect()(0)
    assert(rI.getAs[Double]("chi2") <= 1e-3, s"independent table: ${rI}")
    // deterministic: type fully determines the weekday -> Cramer's V = 1
    val dep = (for (d <- 0L until 2L; i <- 1 to 10) yield (d, i))
      .zipWithIndex.map { case ((d, _), i) =>
        (i.toLong, 1L, (d + 4) * 86400L + i, if (d == 0) "view" else "click", 1.0)
      }
    val dfD = spark.createDataFrame(dep)
      .toDF("event_id", "user_id", "ts_sec", "event_type", "value")
    val rD = Hypothesis.chisqIndependence(dfD).collect()(0)
    assert(rD.getAs[Double]("cramers_v") >= 0.999, s"deterministic table: ${rD}")
  }

  test("mantel-haenszel survives a crafted Simpson reversal") {
    // Stratum A (heavy users): treatment converts 9/10 vs control 4/5.
    // Stratum B (light users): treatment 2/10 vs control 1/10.
    // Within BOTH strata treatment wins; an imbalanced pooled table can
    // reverse that — the MH pooled RR must stay > 1.
    // Build synthetic users pinned to arms/strata via trial hashing.
    def arm(uid: Long): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s"ab:$uid".getBytes("UTF-8"))
      md.take(6).foldLeft(0L)((acc, b) => (acc << 8) | (b & 0xffL)) % 2
    }
    val treatHeavy = LazyList.from(1).map(_.toLong)
      .filter(arm(_) == 1).take(10).toList
    val ctrlHeavy = LazyList.from(1).map(_.toLong)
      .filter(arm(_) == 0).take(5).toList
    val treatLight = LazyList.from(1000).map(_.toLong)
      .filter(arm(_) == 1).take(10).toList
    val ctrlLight = LazyList.from(1000).map(_.toLong)
      .filter(arm(_) == 0).take(10).toList
    def mkEvents(users: Seq[Long], nEv: Int, converters: Int): Seq[(Long, Long, String)] =
      users.zipWithIndex.flatMap { case (u, i) =>
        val base = (1 to nEv).map(k => (u, (u * 100 + k), "view"))
        if (i < converters) base :+ ((u, u * 100 + 99, "purchase")) else base
      }
    val rows = (mkEvents(treatHeavy, 9, 9) ++ mkEvents(ctrlHeavy, 9, 4)
      ++ mkEvents(treatLight, 1, 2) ++ mkEvents(ctrlLight, 1, 1))
      .zipWithIndex.map { case ((u, ts, t), i) => (i.toLong, u, ts, t, 1.0) }
    val df = spark.createDataFrame(rows)
      .toDF("event_id", "user_id", "ts_sec", "event_type", "value")
    val mh = Hypothesis.mantelHaenszel(df).collect()
    val pooled = mh.find(_.getAs[Long]("stratum") == 99L).get
    assert(pooled.getAs[Double]("risk_ratio") > 1.0,
      s"MH pooled RR must keep the within-stratum direction: ${mh.toSeq}")
  }

  test("chi-square independence: dof and margins consistent; chi2 >= 0; V in [0,1]") {
    val r = Hypothesis.chisqIndependence(Tables.events(spark, sf)).collect()(0)
    val (tl, dl) = (r.getAs[Long]("type_levels"), r.getAs[Long]("dow_levels"))
    assert(r.getAs[Long]("dof") == (tl - 1) * (dl - 1))
    assert(r.getAs[Double]("chi2") >= 0.0)
    val v = r.getAs[Double]("cramers_v")
    assert(v >= 0.0 && v <= 1.0)
  }

  test("rater kappa: perfect agreement 1, perfect disagreement -1, degenerate table 0, ALL pools") {
    import spark.implicits._
    def txt(n: Int) = Seq.fill(n)("t").mkString(" ")
    val docs = Seq(
      // source a: every doc lands in the SAME band under both raters
      ("a", 100L, txt(10)), ("a", 500L, txt(50)), ("a", 2000L, txt(250)),
      // source b: systematic short<->mid swap — kappa's floor, -1
      ("b", 100L, txt(50)), ("b", 500L, txt(10)),
      // source c: all mass in one cell — chance agreement is already 1,
      // the cross-multiplied denominator is 0, zero-signal kappa 0
      ("c", 100L, txt(10)), ("c", 100L, txt(10)))
      .toDF("source", "n_chars", "text")
    val got = Hypothesis.raterKappa(docs)
      .as[(String, Long, Long, Double, Double)].collect().toList
    // ALL row: n=7, agree=5, pe_num=4*4+2*2+1=21 -> kappa=(35-21)/(49-21)=0.5
    assert(got == List(
      ("ALL", 7L, 5L, 0.7142, 0.5),
      ("a", 3L, 3L, 1.0, 1.0),
      ("b", 2L, 0L, 0.0, -1.0),
      ("c", 2L, 2L, 1.0, 0.0)), s"got $got")
  }

  test("rater kappa: empty corpus emits zero rows (matches oracle's n_docs>0)") {
    import spark.implicits._
    // Spark's rollup emits no rows on empty input; DuckDB's ROLLUP emits a
    // 0-count grand total that the oracle drops — both lanes agree on 0
    val empty = Seq.empty[(String, Long, String)].toDF("source", "n_chars", "text")
    assert(Hypothesis.raterKappa(empty).count() == 0)
  }
}
