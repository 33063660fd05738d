package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) multi-dimensional layout — the file-clustering trick
  * that makes BOTH `WHERE x BETWEEN …` and `WHERE y BETWEEN …` prune at
  * 100 TB. A single-column sort clusters one dimension and scatters the
  * other; interleaving the bits of both keys (x's bits on even positions,
  * y's on odd) gives a 1-D key whose contiguous ranges are small aligned
  * RECTANGLES in (x, y) space. Laid out on that key (e.g.
  * `repartitionByRange(zCol).sortWithinPartitions(zCol)` before a parquet
  * write), every file's min/max footer stats are tight in both dimensions,
  * so either predicate skips most files — same mechanism the IVF cell
  * layout uses for vectors (`sources/Bucketing.scala`), applied to plain
  * relational keys.
  *
  * Everything is integer bit arithmetic (shift / and / add) — codegen'd,
  * no UDF, reproducible on any engine; the oracle mirrors it with
  * `// 2^i % 2` terms.
  */
object ZOrder {

  /** Morton-interleave the low `bits` bits of two non-negative longs:
    * result bit 2i = x's bit i, bit 2i+1 = y's bit i. Inputs are masked to
    * `bits` via pmod so arbitrary key domains fold deterministically. */
  def zValue(x: Column, y: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31, "bits must be in [1, 31]")
    val mask = 1L << bits
    val xm = pmod(x.cast("long"), lit(mask))
    val ym = pmod(y.cast("long"), lit(mask))
    (0 until bits).map { i =>
      shiftleft(shiftrightunsigned(xm, i).bitwiseAND(lit(1L)), 2 * i) +
        shiftleft(shiftrightunsigned(ym, i).bitwiseAND(lit(1L)), 2 * i + 1)
    }.reduce(_ + _)
  }

  /** Hilbert-curve index — the space-filling sibling of [[zValue]] with
    * strictly better locality: consecutive Hilbert indices are ALWAYS
    * 4-adjacent cells (the curve never jumps, unlike Morton's quadrant
    * seams), so equal-size index ranges have smaller (x, y) extents on
    * average — tighter footer stats at the same file count. Computed by
    * the classic top-down quadrant walk (the public xy2d recurrence: per
    * bit level the quadrant id (3·rx) ⊕ ry advances d by s², then the
    * frame reflects and swaps; every intermediate stays in [0, 2^bits),
    * so no negative bit-twiddling crosses engines). Integer
    * shift/and/xor/add only — codegen'd, no UDF; the SQL oracle unrolls
    * the identical per-level chain.
    *
    * `bits` defaults lower than [[zValue]]'s 16: each unrolled level feeds
    * x AND y into both successors, and 8 levels (a 256×256 grid, 65 536
    * cells) keeps codegen compact while being plenty for a layout audit. */
  def withHilbert(df: DataFrame, xCol: String, yCol: String, bits: Int = 8,
                  as: String = "h"): DataFrame = {
    require(bits >= 1 && bits <= 15, "bits must be in [1, 15]")
    val n = 1L << bits
    var cur = df
      .withColumn("__hx", pmod(col(xCol).cast("long"), lit(n)))
      .withColumn("__hy", pmod(col(yCol).cast("long"), lit(n)))
      .withColumn(as, lit(0L))
    var s = n >> 1
    while (s > 0) {
      val rx = when(col("__hx").bitwiseAND(lit(s)) > lit(0L), lit(1L)).otherwise(lit(0L))
      val ry = when(col("__hy").bitwiseAND(lit(s)) > lit(0L), lit(1L)).otherwise(lit(0L))
      cur = cur
        .withColumn("__d2", col(as) + lit(s * s) * (lit(3L) * rx).bitwiseXOR(ry))
        .withColumn("__nx", when(ry === lit(0L),
            when(rx === lit(1L), lit(n - 1) - col("__hy")).otherwise(col("__hy")))
          .otherwise(col("__hx")))
        .withColumn("__ny", when(ry === lit(0L),
            when(rx === lit(1L), lit(n - 1) - col("__hx")).otherwise(col("__hx")))
          .otherwise(col("__hy")))
        .withColumn(as, col("__d2"))
        .withColumn("__hx", col("__nx")).withColumn("__hy", col("__ny"))
        .drop("__d2", "__nx", "__ny")
      s >>= 1
    }
    cur.drop("__hx", "__hy")
  }

  /** [[zOrderProfile]]'s Hilbert sibling: per-bucket row counts and (x, y)
    * extents under the Hilbert layout. Same audit contract — the curve's
    * locality shows up as extents no larger (and on seam buckets smaller)
    * than Morton's at the same bucket count. */
  def hilbertProfile(df: DataFrame, xCol: String, yCol: String,
                     bits: Int = 8, buckets: Int = 256): DataFrame = {
    // buckets beyond the cell count would make `cell` 0 and h div 0 NULL-
    // bucket every row; more buckets than curve cells is meaningless anyway
    require(buckets >= 1 && buckets <= (1L << (2 * bits)),
      s"buckets must be in [1, 4^bits]; got $buckets for bits=$bits")
    val cell = (1L << (2 * bits)) / buckets
    withHilbert(df.select(col(xCol).cast("long").as("__x"),
        col(yCol).cast("long").as("__y")), "__x", "__y", bits, "h")
      .groupBy(expr(s"h div ${cell}L").as("h_bucket"))
      .agg(count(lit(1)).as("n_rows"),
        min(col("__x")).as("x_min"), max(col("__x")).as("x_max"),
        min(col("__y")).as("y_min"), max(col("__y")).as("y_max"))
      .orderBy(col("h_bucket"))
  }

  /** The actual write path the audits model: lay `df` out on its Hilbert
    * index — range-partition into `files` index ranges (each becomes one
    * parquet file whose (x, y) footer stats are a tight rectangle) and
    * sort within partitions so row-group stats are tight too. After this
    * write, a predicate on EITHER dimension skips most files from the
    * footers alone; BucketingSpec measures the extent shrink vs a
    * naturally-partitioned write of the same rows. */
  def writeHilbertLayout(df: DataFrame, dir: String, xCol: String, yCol: String,
                         bits: Int = 8, files: Int = 16): Unit =
    withHilbert(df, xCol, yCol, bits)
      .repartitionByRange(files, col("h"))
      .sortWithinPartitions(col("h"))
      .drop("h")
      .write.mode("overwrite").parquet(dir)

  /** Zone-map skip audit — the question the layout family exists to
    * answer, asked directly: for a rectangle predicate
    * `x ∈ [xLo, xHi] ∧ y ∈ [yLo, yHi]` (in the folded 2^bits domain), how
    * many of the `buckets` files would footer min/max stats let a scan
    * SKIP under each layout? Three layouts are audited side by side:
    * `hilbert` and `zorder` (curve-key range buckets — the write shapes of
    * [[writeHilbertLayout]]) and `xsort` (single-dimension sort — perfect
    * pruning on x, none on y), so the record shows the multi-dimensional
    * curves beating the single-column sort on a two-sided predicate.
    *
    * A bucket is touched iff its zone map intersects the rectangle
    * (`x_min ≤ xHi ∧ x_max ≥ xLo ∧ …` — exactly the parquet footer test).
    * `rows_scanned` = rows in touched buckets; `rows_matching` is the
    * exact predicate count (identical across layouts — layout moves rows,
    * it never changes the answer); `scan_pct` is the fraction of the table
    * a pruned scan still reads. Everything is one scan per layout over
    * bounded bucket frames — integer arithmetic end to end. */
  def zonemapSkipAudit(df: DataFrame, xCol: String, yCol: String,
                       bits: Int = 8, buckets: Int = 64,
                       xLo: Long = 64, xHi: Long = 191,
                       yLo: Long = 8, yHi: Long = 23): DataFrame = {
    require(buckets >= 1 && buckets <= (1L << bits),
      s"buckets must divide every layout's domain: [1, 2^bits]; got $buckets")
    val n = 1L << bits
    val base = df.select(pmod(col(xCol).cast("long"), lit(n)).as("__x"),
      pmod(col(yCol).cast("long"), lit(n)).as("__y"))
    val layouts: Seq[(String, DataFrame, Long)] = Seq(
      ("hilbert", withHilbert(base, "__x", "__y", bits, "__k"), (n * n) / buckets),
      ("xsort", base.withColumn("__k", col("__x")), n / buckets),
      ("zorder", base.withColumn("__k", zValue(col("__x"), col("__y"), bits)),
        (n * n) / buckets))
    val audits = layouts.map { case (name, frame, cell) =>
      val zones = frame
        .groupBy(expr(s"__k div ${cell}L").as("__b"))
        .agg(count(lit(1)).as("n_rows"),
          min(col("__x")).as("x_min"), max(col("__x")).as("x_max"),
          min(col("__y")).as("y_min"), max(col("__y")).as("y_max"))
      val touched = col("x_min") <= xHi && col("x_max") >= xLo &&
        col("y_min") <= yHi && col("y_max") >= yLo
      zones.agg(
        lit(name).as("layout"),
        count(lit(1)).as("buckets_used"),
        graft.functions.Cols.countWhen(touched).as("buckets_touched"),
        sum(col("n_rows")).as("rows_total"),
        sum(when(touched, col("n_rows")).otherwise(0L)).as("rows_scanned"))
    }
    val matching = base
      .agg(graft.functions.Cols.countWhen(
        col("__x").between(xLo, xHi) && col("__y").between(yLo, yHi))
        .as("rows_matching"))
    audits.reduce(_.unionAll(_))
      .crossJoin(broadcast(matching))
      .select(col("layout"), col("buckets_used"), col("buckets_touched"),
        col("rows_total"), col("rows_scanned"), col("rows_matching"),
        graft.functions.Cols.pct4(col("rows_scanned"), col("rows_total")).as("scan_pct"))
      .orderBy(col("layout"))
  }

  /** Layout audit: bucket rows by the top bits of their z-value (`buckets`
    * contiguous z-ranges — the "files" of a z-ordered write) and report
    * each bucket's row count and per-dimension min/max. The z-curve
    * guarantee under audit: with `buckets` = 4^b cells over a 2·`bits`-bit
    * key, every bucket's (x, y) extent is an aligned
    * 2^(bits−b) × 2^(bits−b) rectangle — tight footer stats in BOTH
    * dimensions, which is exactly what file skipping needs. One hash
    * aggregation over the bounded bucket domain; the z computation rides
    * the scan. */
  def zOrderProfile(df: DataFrame, xCol: String, yCol: String,
                    bits: Int = 16, buckets: Int = 256): DataFrame = {
    require(buckets >= 1 && buckets <= (1L << (2 * bits)),
      s"buckets must be in [1, 4^bits]; got $buckets for bits=$bits")
    val cell = (1L << (2 * bits)) / buckets
    val x = col(xCol).cast("long")
    val y = col(yCol).cast("long")
    df.select(zValue(x, y, bits).as("z"), x.as("__x"), y.as("__y"))
      .groupBy(expr(s"z div ${cell}L").as("z_bucket"))
      .agg(count(lit(1)).as("n_rows"),
        min(col("__x")).as("x_min"), max(col("__x")).as("x_max"),
        min(col("__y")).as("y_min"), max(col("__y")).as("y_max"))
      .orderBy(col("z_bucket"))
  }
}
