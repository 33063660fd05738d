package graft

import org.apache.spark.sql.functions._

import graft.operators._
import graft.sources.Tables

/** Bucketized range join: equivalence to the naive range-predicate join,
  * boundary semantics, and band-table invariants. */
class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  // irregular intervals (width 1 .. 700, some crossing many grid cells, one
  // degenerate) and points placed on/off every boundary
  private lazy val intervals = Seq(
    (0L, 0L, 5L), (1L, 5L, 6L), (2L, 6L, 50L), (3L, 10L, 710L),
    (4L, 700L, 701L), (5L, 300L, 300L) // degenerate: hi == lo, must vanish
  ).toDF("iv_id", "lo", "hi")
  private lazy val points =
    (Seq(0L, 4L, 5L, 6L, 9L, 10L, 49L, 50L, 299L, 300L, 301L, 699L, 700L, 701L, 709L, 710L)
      ++ (0L to 1000L by 97L)).distinct.map(Tuple1(_)).toDF("pt")

  private def naive = points.crossJoin(intervals)
    .where(col("pt") >= col("lo") && col("pt") < col("hi"))
    .select(col("pt"), col("iv_id"))

  test("bucketized join equals the naive range-predicate join at several grid widths") {
    val expect = naive.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(expect.nonEmpty)
    for (w <- Seq(1L, 7L, 64L, 1024L, 100000L)) {
      val got = RangeJoin.pointInInterval(points, "pt", intervals, "lo", "hi", w)
        .select(col("pt"), col("iv_id"))
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      assert(got.length == got.toSet.size, s"w=$w produced duplicate pairs")
      assert(got.toSet == expect, s"w=$w mismatch")
    }
  }

  test("half-open semantics: lo is in, hi is out; degenerate intervals match nothing") {
    val got = RangeJoin.pointInInterval(points, "pt", intervals, "lo", "hi", 16L)
      .select(col("pt"), col("iv_id")).as[(Long, Long)].collect().toSet
    assert(got.contains((5L, 1L)) && !got.contains((6L, 1L)), "boundary must be half-open")
    assert(!got.exists(_._2 == 5L), "degenerate interval matched a point")
  }

  test("quadratic bands partition [0, max]: contiguous, in-order, every cent in exactly one band") {
    val pts = Tables.events(spark, sf).where(col("event_type") === "purchase")
      .select(floor(col("value") * 100.0).cast("long").as("cents"))
    val bands = RangeJoin.quadraticBands(pts, "cents", 24).orderBy("band_id").collect()
    assert(bands.length == 24)
    assert(bands.head.getLong(1) == 0L)
    bands.sliding(2).foreach { case Array(a, b) =>
      assert(a.getLong(2) == b.getLong(1), "bands must be contiguous") }
    val maxc = pts.agg(max("cents")).head.getLong(0)
    assert(bands.last.getLong(2) == maxc + 1, "last band must close at max+1")
    // containment join back: every purchase falls in exactly one band
    val matched = RangeJoin.pointInInterval(
      pts, "cents", RangeJoin.quadraticBands(pts, "cents", 24),
      "lo_cents", "hi_cents", 1024L).count()
    assert(matched == pts.count())
  }

  test("interval overlap equals the naive overlap join, exactly once per pair, at several widths") {
    // second interval set shifted/scaled against `intervals`, incl. nested,
    // identical, touching (no overlap in half-open semantics) and disjoint
    val right = Seq(
      (10L, 0L, 3L), (11L, 3L, 5L), (12L, 5L, 10L), (13L, 40L, 800L),
      (14L, 700L, 702L), (15L, 710L, 711L), (16L, 1000L, 1001L)
    ).toDF("rv_id", "rlo", "rhi")
    val expect = intervals.crossJoin(right)
      .where(greatest(col("lo"), col("rlo")) < least(col("hi"), col("rhi")))
      .select(col("iv_id"), col("rv_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(expect.nonEmpty)
    for (w <- Seq(1L, 7L, 64L, 1024L)) {
      val got = RangeJoin.intervalOverlap(intervals, "lo", "hi", right, "rlo", "rhi", w)
        .select(col("iv_id"), col("rv_id"))
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      assert(got.length == got.toSet.size,
        s"w=$w: a pair must be emitted from its first shared cell only")
      assert(got.toSet == expect, s"w=$w mismatch")
    }
  }

  test("busy-hour overlap: hours bounded by k, sessions counted once per hour they span") {
    val ev = Tables.events(spark, sf)
    val out = RangeJoin.busyHourSessionOverlap(ev, Sessionize.sessionMetrics(ev), 16)
      .collect()
    assert(out.length > 0 && out.length <= 16)
    out.foreach { r =>
      assert(r.getLong(3) <= r.getLong(2), "distinct users cannot exceed sessions") }
  }

  test("purchase band profile: events conserved, users bounded, cents within band bounds") {
    val prof = RangeJoin.purchaseBandProfile(Tables.events(spark, sf))
    val purchases = Tables.events(spark, sf)
      .where(col("event_type") === "purchase").count()
    val agg = prof.agg(sum("n_events"), max("n_users")).head
    assert(agg.getLong(0) == purchases, "every purchase lands in exactly one band")
    val bad = prof.where(col("cents_total") < col("n_events") * col("lo_cents")
      || col("cents_total") >= col("n_events") * col("hi_cents"))
    assert(bad.count() == 0, "band totals must respect band bounds")
  }
}
