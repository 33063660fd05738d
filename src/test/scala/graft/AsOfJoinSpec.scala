package graft

import org.apache.spark.sql.functions._

import graft.operators.{AsOfJoin, Similarity}
import graft.sources.Tables

/** Semantics of the as-of join composition and the k-means-refined IVF. */
class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  test("asOfBackward: latest prior row wins, equal ts matches, no-match yields nulls") {
    val left = Seq(
      (1L, 100L, 10L), // has a view at the same second → matches (<=)
      (1L, 50L, 11L),  // matches the view at 40
      (2L, 70L, 12L),  // user 2's only view is later → null
      (3L, 10L, 13L)   // user 3 has no views at all → null
    ).toDF("user_id", "ts_sec", "event_id")
    val right = Seq(
      (1L, 100L, 5L), (1L, 40L, 4L), (1L, 40L, 3L), // dup ts 40: max id 4 wins
      (2L, 80L, 6L)
    ).toDF("user_id", "ts_sec", "view_id")

    val out = AsOfJoin.asOfBackward(left, right, Seq("user_id"), "ts_sec", Seq("view_id"))
      .select("event_id", "asof_ts_sec", "asof_view_id").as[(Long, Option[Long], Option[Long])]
      .collect().map(r => r._1 -> (r._2, r._3)).toMap

    assert(out(10L) == (Some(100L), Some(5L)))
    assert(out(11L) == (Some(40L), Some(4L))) // deterministic tie-break on dup ts
    assert(out(12L) == (None, None))
    assert(out(13L) == (None, None))
  }

  test("purchase attribution: every attributed view precedes (or ties) its purchase") {
    val out = AsOfJoin.purchaseAttribution(Tables.events(spark, sf))
    assert(out.count() > 0)
    assert(out.where(col("lag_sec") < 0).count() == 0) // never attributes the future
    // attributed view ids must be real view events of the same user
    val views = Tables.events(spark, sf).where(col("event_type") === "view")
      .select(col("user_id"), col("event_id").as("attributed_view_id"))
    val bogus = out.where(col("attributed_view_id").isNotNull)
      .join(views, Seq("user_id", "attributed_view_id"), "left_anti")
    assert(bogus.count() == 0)
  }

  test("asOfForward: earliest following row wins, equal ts matches, none after yields nulls") {
    val left = Seq((1L, 100L, 10L), (1L, 50L, 11L), (2L, 90L, 12L))
      .toDF("user_id", "ts_sec", "event_id")
    val right = Seq((1L, 100L, 5L), (1L, 60L, 4L), (2L, 80L, 6L))
      .toDF("user_id", "ts_sec", "view_id")
    val out = AsOfJoin.asOfForward(left, right, Seq("user_id"), "ts_sec", Seq("view_id"))
      .select("event_id", "asof_ts_sec", "asof_view_id").as[(Long, Option[Long], Option[Long])]
      .collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(out(10L) == (Some(100L), Some(5L))) // equal ts matches forward too
    assert(out(11L) == (Some(60L), Some(4L)))  // earliest at-or-after 50
    assert(out(12L) == (None, None))           // nothing at-or-after 90 for user 2
  }

  test("native as-of exec: same crafted-edge-case results as the composition") {
    val left = Seq((1L, 100L, 10L), (1L, 50L, 11L), (2L, 70L, 12L), (3L, 10L, 13L))
      .toDF("user_id", "ts_sec", "event_id")
    val right = Seq((1L, 100L, 5L), (1L, 40L, 4L), (1L, 40L, 3L), (2L, 80L, 6L))
      .toDF("user_id", "ts_sec", "view_id")
    val out = AsOfJoin.asOfBackwardNative(left, right, Seq("user_id"), "ts_sec", Seq("view_id"))
      .select("event_id", "asof_ts_sec", "asof_view_id").as[(Long, Option[Long], Option[Long])]
      .collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(out(10L) == (Some(100L), Some(5L)))
    assert(out(11L) == (Some(40L), Some(4L))) // dup-ts tie: largest payload wins
    assert(out(12L) == (None, None))
    assert(out(13L) == (None, None))
  }

  test("native as-of exec ignores null ordering values on both sides") {
    val left = Seq(
      (1L, Some(100L), 10L), // real candidate below → matches
      (1L, None, 11L),       // null left ts: can never satisfy right<=left
      (2L, Some(50L), 12L)   // user 2's only view has null ts → no match
    ).toDF("user_id", "ts_sec", "event_id")
    val right = Seq(
      (1L, Some(90L), 5L), (1L, None, 4L), // null right ts: never held
      (2L, Option.empty[Long], 6L)
    ).toDF("user_id", "ts_sec", "view_id")
    val out = AsOfJoin.asOfBackwardNative(left, right, Seq("user_id"), "ts_sec", Seq("view_id"))
      .select("event_id", "asof_ts_sec", "asof_view_id").as[(Long, Option[Long], Option[Long])]
      .collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(out(10L) == (Some(90L), Some(5L))) // null candidate skipped, real one held
    assert(out(11L) == (None, None))
    assert(out(12L) == (None, None))
    // parity with the composed variant on the same data
    val comp = AsOfJoin.asOfBackward(left, right, Seq("user_id"), "ts_sec", Seq("view_id"))
      .select("event_id", "asof_ts_sec", "asof_view_id").as[(Long, Option[Long], Option[Long])]
      .collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(comp == out, s"composed $comp != native $out")
  }

  test("native as-of output honors the UnsafeRow contract (raw collect/sort, no projection)") {
    val left = Seq((1L, 100L, 10L), (2L, 70L, 12L)).toDF("user_id", "ts_sec", "event_id")
    val right = Seq((1L, 90L, 5L)).toDF("user_id", "ts_sec", "view_id")
    val raw = AsOfJoin.asOfBackwardNative(left, right, Seq("user_id"), "ts_sec", Seq("view_id"))
    // no select() on top: collect and sort consume the exec's rows directly
    assert(raw.collect().length == 2)
    assert(raw.orderBy(col("event_id")).collect().map(_.getLong(2)).toSeq == Seq(10L, 12L))
  }

  test("native as-of exec equals the union+window composition on real data") {
    val events = Tables.events(spark, sf)
    val a = AsOfJoin.purchaseAttribution(events).collect().toSeq
    val b = AsOfJoin.purchaseAttributionNative(events).collect().toSeq
    assert(a == b)
  }

  test("native as-of plans the custom operator with one exchange per side") {
    val events = Tables.events(spark, sf)
    val df = AsOfJoin.purchaseAttributionNative(events)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("AsOfJoin"), p)
    assert(!p.contains("Window") && !p.contains("Union"), p)
  }

  test("kmeans centroids: at most numCells cells, iteration is repartition-invariant") {
    val emb = Tables.embeddings(spark, sf)
    val cents = Similarity.kmeansCentroids(emb, numCells = 16, iters = 2)
    val n = cents.count()
    assert(n > 0 && n <= 16)
    // bit-determinism across physical layouts: same centroids from a skewed
    // repartition (the whole point of the integer-unit mean)
    val centsRepart = Similarity.kmeansCentroids(emb.repartition(7), numCells = 16, iters = 2)
    val a = cents.select(col("cell_id"), col("c_emb")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val b = centsRepart.select(col("cell_id"), col("c_emb")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(a == b)
  }

  test("kmeans IVF recall: refined index finds most of the exact top-5") {
    val emb = Tables.embeddings(spark, sf)
    val queries = emb.where(col("vec_id") < 5)
    val exact = Similarity.topKCosine(emb, queries, 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val ivf = Similarity.ivfKmeansTopK(emb, queries, 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    assert(ivf.size == exact.size)
    val recall = (exact intersect ivf).size.toDouble / exact.size
    assert(recall >= 0.6, s"recall $recall") // nprobe=4/16 cells; sanity floor
  }

  test("multi-probe LSH: probing 1-bit flips never hurts recall vs the exact top-k") {
    val emb = Tables.embeddings(spark, sf)
    val queries = emb.where(col("vec_id") < 5)
    val exact = Similarity.topKCosine(emb, queries, 5)
      .select(col("query_id"), col("neighbor_id"))
    val multi = Similarity.annMultiProbe(emb, queries, 5)
      .select(col("query_id"), col("neighbor_id"))
    // at sf0.001 the probe set covers ~9/256 buckets of a ~600-vector
    // corpus, so absolute recall is structurally small; the floor only
    // guards against a broken bucket/flip computation (recall ≈ 0)
    val total = exact.count().toDouble
    val recall = multi.intersect(exact).count() / total
    assert(recall >= 0.08, s"multi-probe recall $recall below floor")
    // candidate-superset property: every own-bucket candidate is probed,
    // so the single-bucket ANN's result pairs must appear in the probe set
    val single = emb.select(col("vec_id"),
        Similarity.bucketCode(col("embedding"), 8).as("b"))
    val qb = single.where(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("b").as("qb"))
    val ownBucketPairs = single.join(qb, col("b") === col("qb")
        && col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"))
    val multiAll = Similarity.annMultiProbe(emb, queries, 1000000)
      .select(col("query_id"), col("neighbor_id"))
    assert(ownBucketPairs.exceptAll(multiAll).count() == 0,
      "own-bucket candidates must survive into the probe set")
  }

  test("nearest-event join equals the naive window 1-NN; bucket width invariant") {
    import org.apache.spark.sql.expressions.Window
    val events = Tables.events(spark, sf)
    val got = AsOfJoin.nearestViewPerPurchase(events)
    // naive: full same-user pair join + ranking window
    val p = events.where(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("purchase_id"), col("ts_sec").as("p_sec"))
    val v = events.where(col("event_type") === "view")
      .select(col("user_id"), col("event_id").as("view_id"), col("ts_sec").as("v_sec"))
    val w = Window.partitionBy(col("purchase_id"))
      .orderBy(abs(col("p_sec") - col("v_sec")), col("v_sec"), col("view_id"))
    val naive = p.join(v, Seq("user_id"))
      .where(abs(col("p_sec") - col("v_sec")) <= 3600)
      .withColumn("rn", row_number().over(w)).where(col("rn") === 1)
      .select(col("user_id"), col("purchase_id"), col("p_sec"),
        col("view_id").as("nearest_view_id"),
        abs(col("p_sec") - col("v_sec")).as("abs_lag"))
    assert(got.exceptAll(naive).count() == 0 && naive.exceptAll(got).count() == 0)
    // grid width must be invisible in the result
    val alt = AsOfJoin.nearestViewPerPurchase(events, bucketWidth = 700)
    assert(alt.exceptAll(got).count() == 0 && got.exceptAll(alt).count() == 0)
  }

  test("nearest-event grid uses floor division: pairs straddling t=0 survive") {
    // purchase at -10s, view at +20s: lag 30 ≤ window. Truncate-toward-zero
    // division would place the view's lowest probe cell at cell 0 while the
    // purchase sits in cell -1, dropping the pair; floor division keeps it.
    val events = Seq(
      (1L, 100L, "purchase", -10L),
      (1L, 101L, "view", 20L),
      (2L, 200L, "purchase", -7300L), // isolated: no view within ±3600
      (2L, 201L, "view", 0L)
    ).toDF("user_id", "event_id", "event_type", "ts_sec")
    val got = AsOfJoin.nearestViewPerPurchase(events)
      .select("purchase_id", "nearest_view_id", "abs_lag")
      .as[(Long, Long, Long)].collect().toSet
    assert(got == Set((100L, 101L, 30L)), s"got $got")
  }
}
