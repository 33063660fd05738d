package graft

import org.apache.spark.sql.functions._

import graft.operators.HeavyHitters
import graft.plans.FrequentItemsAggregate
import graft.sources.Tables

/** Misra–Gries sketch: the no-false-dismissal guarantee and the verified
  * census contract. */
class HeavyHittersSpec extends SparkSpec {

  import spark.implicits._

  test("every key above n/(capacity+1) is in the candidate set, any partitioning") {
    // skewed synthetic stream: key 1 at 40%, key 2 at 20%, tail uniform
    val rows = (Seq.fill(4000)(1L) ++ Seq.fill(2000)(2L)
      ++ (0 until 4000).map(i => 100L + i % 500))
    for (parts <- Seq(1, 7, 32)) {
      val cands = rows.toDF("k").repartition(parts)
        .agg(FrequentItemsAggregate.candidates(col("k"), 9).as("c"))
        .select(explode(col("c")).as("k")).as[Long].collect().toSet
      // threshold n/10 = 1000: keys 1 and 2 must always survive
      assert(cands.contains(1L) && cands.contains(2L), s"parts=$parts: $cands")
      assert(cands.size <= 9, s"capacity overflow: ${cands.size}")
    }
  }

  test("KMV sketch: exact under k, bounded error above k, partitioning-invariant") {
    // high-cardinality group (5000 distinct users) + tiny group (10)
    val rows = (1 to 5000).map(u => ("big", u.toLong)) ++
      (1 to 10).map(u => ("small", u.toLong))
    val events = rows.toDF("event_type", "user_id")
    def run(parts: Int) = HeavyHitters.kmvDistinct(events.repartition(parts), k = 64)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val r32 = run(32)
    val m = r32.map(t => t._1 -> t).toMap
    assert(m("small") == (("small", 10L, 10L)), "under-k group must report exactly")
    val (_, exact, est) = m("big")
    assert(exact == 5000L)
    // KMV standard error ~ 1/sqrt(k) ≈ 12.5%; allow 4 sigma on one draw
    assert(math.abs(est - 5000L) < 2500, s"KMV estimate $est implausibly far from 5000")
    // the sketch is a pure function of the hash SET → partitioning-invariant
    assert(run(3) == r32 && run(1) == r32)
  }

  test("sliding KMV DAU: merged day sketches == from-scratch window sketch; under-k windows exact") {
    // two overlapping days, each over k distinct: day1's trailing window is
    // users 1..3000. The KMV merge property says the merged per-day
    // sketches must reproduce EXACTLY what a from-scratch sketch of the
    // union reports — kmvDistinct over the same rows IS that sketch.
    val rows = (1 to 2000).map(u => ("view", u.toLong, 0L)) ++
      (1001 to 3000).map(u => ("view", u.toLong, 86400L))
    val ev = rows.toDF("event_type", "user_id", "ts_sec")
    val slide = HeavyHitters.slidingDauKmv(ev).collect()
      .map(r => r.getAs[Long]("day_sec") ->
        ((r.getAs[Long]("exact_dau"), r.getAs[Long]("kmv_estimate")))).toMap
    val full = HeavyHitters.kmvDistinct(ev).collect()(0)
    assert(full.getAs[Long]("exact_distinct") == 3000L)
    assert(slide(86400L) == ((3000L, full.getAs[Long]("kmv_estimate"))),
      s"merged sketch must equal the from-scratch union sketch: ${slide(86400L)} vs $full")
    val d0 = HeavyHitters.kmvDistinct(ev.where(col("ts_sec") === 0L)).collect()(0)
    assert(slide(0L) == ((2000L, d0.getAs[Long]("kmv_estimate"))))
    // under-k regime: three tiny overlapping days report exactly
    val small = ((1 to 10).map(u => (u.toLong, 0L)) ++ (6 to 15).map(u => (u.toLong, 86400L))
      ++ (11 to 20).map(u => (u.toLong, 2 * 86400L)))
      .toDF("user_id", "ts_sec")
    val got = HeavyHitters.slidingDauKmv(small).collect()
      .map(r => (r.getAs[Long]("day_sec") / 86400L, r.getAs[Long]("exact_dau"),
        r.getAs[Long]("kmv_estimate"), r.getAs[Double]("err_pct")))
    assert(got.toSeq == Seq((0L, 10L, 10L, 0.0), (1L, 15L, 15L, 0.0), (2L, 20L, 20L, 0.0)),
      s"under-k trailing windows must be exact: ${got.toSeq}")
  }

  test("kmvDistinct: null user_ids are excluded before sketching, matching the oracle's filter") {
    // a null user_id hashes to null; unfiltered it would read through the
    // heap struct as a phantom minimum hash and corrupt the k-th order
    // statistic. Both engine and the q_kmv_distinct oracle exclude it.
    val rows: Seq[(String, java.lang.Long)] =
      (1 to 3).map(u => ("view", java.lang.Long.valueOf(u.toLong))) ++
        Seq.fill(5)(("view", null.asInstanceOf[java.lang.Long])) ++
        Seq(("purchase", java.lang.Long.valueOf(9L)))
    val events = rows.toDF("event_type", "user_id")
    val got = HeavyHitters.kmvDistinct(events, k = 64)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set(("view", 3L, 3L), ("purchase", 1L, 1L)),
      s"nulls must not count or corrupt the sketch: $got")
  }

  test("null keys are skipped by the sketch") {
    val withNulls = (Seq.fill(50)(java.lang.Long.valueOf(7L))
      ++ Seq.fill(50)(null.asInstanceOf[java.lang.Long])).toDF("k")
    val cands = withNulls
      .agg(FrequentItemsAggregate.candidates(col("k"), 4).as("c"))
      .select(explode(col("c")).as("k")).as[Long].collect().toSet
    assert(cands == Set(7L))
  }

  test("KMV set ops: exact regime is exact, sketch regime bounded, partitioning-invariant") {
    // exact regime (union < k = 64): 30 viewers, 20 purchasers, 10 overlap;
    // nulls and foreign event types must not perturb any lane
    val small = ((1 to 30).map(u => ("view", java.lang.Long.valueOf(u.toLong))) ++
      (21 to 40).map(u => ("purchase", java.lang.Long.valueOf(u.toLong))) ++
      Seq(("view", null.asInstanceOf[java.lang.Long]),
        ("purchase", null.asInstanceOf[java.lang.Long]),
        ("click", java.lang.Long.valueOf(1L))))
      .toDF("event_type", "user_id")
    val r = HeavyHitters.kmvSetOps(small).head()
    assert(r.getAs[Long]("exact_a") == 30L && r.getAs[Long]("exact_b") == 20L)
    assert(r.getAs[Long]("exact_union") == 40L && r.getAs[Long]("exact_intersect") == 10L)
    assert(r.getAs[Long]("kmv_union_est") == 40L, "under-k: union sketch degenerates to exact")
    assert(r.getAs[Long]("kmv_intersect_est") == 10L, "under-k: intersection is exact")
    // sketch regime: 3000 viewers, 2000 purchasers, 1000 overlap. The
    // estimates are deterministic (pure functions of the hash sets); the
    // bounds are ~4 sigma of the k=64 estimator, pinned as regression rails
    val big = ((1 to 3000).map(u => ("view", u.toLong)) ++
      (2001 to 4000).map(u => ("purchase", u.toLong))).toDF("event_type", "user_id")
    val rb = HeavyHitters.kmvSetOps(big).head()
    assert(rb.getAs[Long]("exact_union") == 4000L && rb.getAs[Long]("exact_intersect") == 1000L)
    assert(math.abs(rb.getAs[Long]("kmv_union_est") - 4000L) < 2000L, rb.toString)
    assert(math.abs(rb.getAs[Long]("kmv_intersect_est") - 1000L) < 900L, rb.toString)
    assert(HeavyHitters.kmvSetOps(big.repartition(7)).head().toSeq == rb.toSeq,
      "set-op sketch must be partitioning-invariant")
  }

  test("verified heavy-entity census equals the exact GROUP BY ... HAVING") {
    val events = Tables.events(spark, sf)
    val keyed = events
      .select(get_json_object(col("props"), "$.k").cast("long").as("entity"))
      .where(col("entity").isNotNull)
    val exact = keyed.groupBy(col("entity")).agg(count(lit(1)).as("n_events"))
      .crossJoin(broadcast(keyed.agg(count(lit(1)).as("n_total"))))
      .where(col("n_events") * 128 > col("n_total"))
      .select(col("entity"), col("n_events"))
    val sketched = HeavyHitters.heavyEntities(events, 127)
      .select(col("entity"), col("n_events"))
    assert(sketched.exceptAll(exact).isEmpty && exact.exceptAll(sketched).isEmpty)
  }

  test("sketch aggregation does not shuffle per-key rows (partial aggregation)") {
    val events = Tables.events(spark, sf)
    val keyed = events
      .select(get_json_object(col("props"), "$.k").cast("long").as("entity"))
      .where(col("entity").isNotNull)
    val sk = keyed.agg(FrequentItemsAggregate.candidates(col("entity"), 127))
    val plan = sk.queryExecution.sparkPlan.toString
    // global agg: partial ObjectHashAggregate per partition, single-row final
    assert(plan.contains("mg_frequent"), plan)
    assert(!plan.contains("Exchange hashpartitioning"),
      "sketch must reduce via partial aggregation, not a per-key shuffle:\n" + plan)
  }

  test("count-min: estimates are one-sided (never undercount)") {
    import spark.implicits._
    val rows = HeavyHitters.countMinFrequencies(Tables.events(spark, sf))
      .as[(Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty && rows.forall { case (_, exact, est, over) =>
      est >= exact && over == est - exact
    }, "CMS one-sided error violated")
  }
}
