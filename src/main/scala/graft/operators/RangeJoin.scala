package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bucketized range (band) join — point-in-interval joins without a
  * cartesian product.
  *
  * Spark has no native range-join operator: a join whose only predicate is
  * `pt >= lo AND pt < hi` plans as BroadcastNestedLoopJoin (small side) or a
  * full CartesianProduct (both sides large) — O(|points|·|intervals|)
  * comparisons, the classic 100-TB scale killer. The public fix (the same
  * shape as Databricks' range-join "bin" hints and the standard interval-
  * index trick) is to overlay a fixed integer grid of width `w` on the
  * value domain:
  *
  *   - every point falls in exactly ONE grid cell: `pt div w`;
  *   - every interval [lo, hi) is exploded to the cells it overlaps:
  *     `sequence(lo div w, (hi-1) div w)` — ceil((hi-lo)/w) rows;
  *   - cell id becomes an EQUI-join key (hash-partitionable, AQE-skew-
  *     splittable), and the exact predicate re-checks the candidates.
  *
  * Each (point, interval) match is produced exactly once — the point's
  * single cell appears once in the interval's cell list — so no distinct
  * pass is needed. Cost: |points| + Σ ceil(len/w) exploded interval rows
  * through one shuffle, instead of the cross product. `w` trades
  * replication of the interval side (long intervals / small w) against
  * candidate false positives within a cell (short intervals / large w);
  * both ends stay linear.
  *
  * Domain contract: integer (long) point and bound columns — callers
  * quantize doubles first (e.g. `floor(value·100)` cents — exact IEEE ops
  * that any engine reproduces bit-identically). Intervals are half-open
  * [lo, hi) with hi > lo; degenerate rows are dropped.
  *
  * Reference scope: the reference engine exposes only equi joins
  * (/root/reference/processor/streaming_processor.py:176-199 — stream-static
  * product enrichment); band classification beyond it is declared SURVEY
  * surface, same family as the as-of join (`plans/AsOfJoinPlan.scala`).
  */
object RangeJoin {

  /** Join `points` to the intervals of `intervals` containing them.
    *
    * @param points    left side; `ptCol` must be a LongType column
    * @param intervals right side; `[loCol, hiCol)` LongType half-open bounds
    * @param bucketWidth grid width `w` (> 0) in the shared integer domain
    * @return one row per (point, containing interval), carrying all columns
    *         of both inputs (names must not collide; `__bkt` is internal)
    */
  def pointInInterval(points: DataFrame, ptCol: String,
                      intervals: DataFrame, loCol: String, hiCol: String,
                      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val pts = points.withColumn("__bkt", expr(s"$ptCol div ${bucketWidth}L"))
    val ivs = intervals
      .where(col(hiCol) > col(loCol))
      .withColumn("__bkt",
        explode(expr(s"sequence($loCol div ${bucketWidth}L, ($hiCol - 1L) div ${bucketWidth}L)")))
    pts.join(ivs, Seq("__bkt"))
      .where(col(ptCol) >= col(loCol) && col(ptCol) < col(hiCol))
      .drop("__bkt")
  }

  /** Interval × interval OVERLAP join on the same integer grid — two
    * interval sets, emit every pair with `max(lo) < min(hi)` (half-open
    * overlap), never through a cartesian.
    *
    * Both sides explode to their covering grid cells and equi-join on the
    * cell; a pair that overlaps for several cells would duplicate, so each
    * pair is emitted ONLY from its first shared cell — the cell containing
    * `greatest(loL, loR)`, a condition both sides can check locally. This
    * is the standard dedup-free grid interval join: no `distinct` pass, no
    * pair-wide shuffle beyond the one equi-join.
    *
    * Replication per interval is ceil(len/w) rows, so `w` should sit near
    * the typical interval length; correctness holds for any `w > 0`. */
  def intervalOverlap(left: DataFrame, loL: String, hiL: String,
                      right: DataFrame, loR: String, hiR: String,
                      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val w = bucketWidth
    val l = left.where(col(hiL) > col(loL))
      .withColumn("__bkt", explode(expr(s"sequence($loL div ${w}L, ($hiL - 1L) div ${w}L)")))
    val r = right.where(col(hiR) > col(loR))
      .withColumn("__bkt", explode(expr(s"sequence($loR div ${w}L, ($hiR - 1L) div ${w}L)")))
    l.join(r, Seq("__bkt"))
      .where(greatest(col(loL), col(loR)) < least(col(hiL), col(hiR)))
      .where(col("__bkt") === expr(s"greatest($loL, $loR) div ${w}L"))
      .drop("__bkt")
  }

  /** `n` deterministic irregular bands covering [0, maxc] of `centsCol`:
    * band i spans [cap·i·(i+1)/(n·(n+1)), cap·(i+1)·(i+2)/(n·(n+1))) with
    * cap = max+1 — widths grow linearly (quadratic cumulative), so unlike
    * equal-width bands the band-to-grid-cell mapping is genuinely
    * many-to-many and the join exercises interval explosion. All bounds are
    * pure integer arithmetic on the data's max — reproducible on any
    * engine, no percentile pass needed. Band 0 starts at 0; the last band's
    * hi is max+1, so every non-negative value is covered. The band table is
    * built from `spark.range(n)` + the broadcast 1-row max — bounded
    * driver-free metadata, never a collected list. */
  def quadraticBands(df: DataFrame, centsCol: String, n: Int): DataFrame = {
    require(n > 0)
    val den = n.toLong * (n + 1)
    val mx = df.agg(max(col(centsCol)).as("__maxc"))
    df.sparkSession.range(n).toDF("band_id")
      .crossJoin(broadcast(mx))
      .select(
        col("band_id"),
        expr(s"(__maxc + 1L) * (band_id * (band_id + 1L)) div ${den}L").as("lo_cents"),
        expr(s"(__maxc + 1L) * ((band_id + 1L) * (band_id + 2L)) div ${den}L").as("hi_cents"))
  }

  /** Registered face of [[intervalOverlap]]: which user sessions were live
    * during the busiest hours? The top-`k` hours by event count (a bounded
    * TakeOrdered, deterministic ties on hour) become [hour, hour+3600)
    * intervals; sessions span [start_sec, end_sec + 1) (the +1 closes the
    * half-open form so single-event sessions keep a non-empty interval);
    * both sides meet on the hour-wide grid. Output per busy hour: its event
    * count, overlapping-session count, distinct users. */
  def busyHourSessionOverlap(events: DataFrame, sessions: DataFrame,
                             k: Int = 16): DataFrame = {
    val busy = events
      .groupBy(graft.functions.Cols.hourSec(col("ts_sec")).as("hour_sec"))
      .agg(count(lit(1)).as("hour_events"))
      .orderBy(col("hour_events").desc, col("hour_sec").asc)
      .limit(k)
      .withColumn("hour_end", col("hour_sec") + 3600L)
    val sess = sessions.select(col("user_id"), col("session_id"),
      col("start_sec"), (col("end_sec") + 1L).as("sess_end"))
    intervalOverlap(busy, "hour_sec", "hour_end", sess, "start_sec", "sess_end",
        bucketWidth = 3600L)
      .groupBy(col("hour_sec"), col("hour_events"))
      .agg(count(lit(1)).as("n_sessions"),
        countDistinct(col("user_id")).as("n_users"))
      .orderBy(col("hour_sec"))
  }

  /** Registered face: classify purchase events into [[quadraticBands]] of
    * their cent value via the bucketized join, then profile each band.
    * Output: band_id, lo_cents, hi_cents, n_events, n_users, cents_total —
    * a price-band revenue report whose join is PlanSpec-pinned to the
    * equi-join shape (no nested-loop, no cartesian). */
  def purchaseBandProfile(events: DataFrame, n: Int = 24,
                          bucketWidth: Long = 1024L): DataFrame = {
    val pts = events
      .where(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"),
        floor(col("value") * lit(100.0)).cast("long").as("cents"))
    val bands = quadraticBands(pts, "cents", n)
    pointInInterval(pts, "cents", bands, "lo_cents", "hi_cents", bucketWidth)
      .groupBy(col("band_id"), col("lo_cents"), col("hi_cents"))
      .agg(
        count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"),
        sum(col("cents")).as("cents_total"))
      .orderBy(col("band_id"))
  }
}
