package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Cols
import graft.sources.Tables

/** Skyline (pareto-front) operator: the rows not dominated under
  * (minimize x, maximize y). `q` dominates `p` iff `q.x ≤ p.x ∧ q.y ≥ p.y`
  * with at least one strict inequality; coordinate ties survive together
  * (neither edge is strict). The product-catalog shape — "cheapest part at
  * every size level" — but the operator is the general 2-D skyline any
  * price/quality, cost/latency, or size/compression frontier needs.
  *
  * Scale shape — threshold joins, never the quadratic NOT-EXISTS the
  * oracle runs:
  *  1. collapse to the distinct-x frame with per-x max y (one map-side
  *     combined hash aggregation: |distinct x| rows out, bounded by the
  *     value domain, not the row count);
  *  2. the strictly-smaller-x prefix max over that frame uses the bucketed
  *     two-stage pattern of [[Sampling.systematicWeighted]]: per-bucket
  *     maxes (`x >> bucketBits`), a running max over the 2^bucketBits-times
  *     smaller bucket table (the ONLY single-partition window — recurse the
  *     trick if even that outgrows a partition), then an intra-bucket
  *     prefix max partitioned by bucket (parallel);
  *  3. join both thresholds back on x: a row survives iff it carries its
  *     x's max y AND beats every strictly-cheaper x's best y.
  * Per-row work is two hash joins on x; the windows touch only the
  * distinct-x frame. At 100 TB with a catalog-bounded price domain the
  * threshold frame broadcasts.
  */
object Skyline {

  /** Dominance thresholds for a distinct-x frame `perX(__x: long, __mx:
    * long)`: per x, the max y over all strictly smaller x (`__pm`, null
    * when x is the global minimum). */
  private def strictPrefixMax(perX: DataFrame, bucketBits: Int): DataFrame = {
    val b  = perX.withColumn("__b", shiftright(col("__x"), bucketBits))
    val wb = Window.orderBy(col("__b")).rowsBetween(Window.unboundedPreceding, -1)
    // running max over the bounded bucket table: max y of all strictly
    // SMALLER buckets (every x there is strictly smaller than any x here)
    val off = b.groupBy(col("__b")).agg(max(col("__mx")).as("__bm"))
      .withColumn("__boff", max(col("__bm")).over(wb))
      .select(col("__b"), col("__boff"))
    val wi = Window.partitionBy(col("__b")).orderBy(col("__x"))
      .rowsBetween(Window.unboundedPreceding, -1)
    // greatest() skips nulls, so the global-min x (null intra-prefix, null
    // bucket offset) keeps __pm null — "nothing is cheaper"
    b.join(off, Seq("__b"))
      .withColumn("__pm", greatest(max(col("__mx")).over(wi), col("__boff")))
      .select(col("__x"), col("__mx"), col("__pm"))
  }

  /** General 2-D skyline: `df` with integer columns named by `xName`
    * (minimize) and `yName` (maximize); returns the surviving rows of `df`
    * unchanged. */
  def paretoFront(df: DataFrame, xName: String, yName: String,
                  bucketBits: Int = 8): DataFrame = {
    val perX = df.groupBy(col(xName).as("__x")).agg(max(col(yName)).as("__mx"))
    val thr  = strictPrefixMax(perX, bucketBits)
    df.join(thr, df(xName) === thr("__x"))
      .where(col(yName) === col("__mx") &&
        (col("__pm").isNull || col(yName) > col("__pm")))
      .drop("__x", "__mx", "__pm")
  }

  /** The registered frontier: parts pareto-optimal on (minimize
    * p_retailprice, maximize p_size) — "no cheaper part is at least as
    * big". Money goes through exact cents ([[Cols.cents]]) so x is integer
    * end-to-end; the /100.0 render is one shared IEEE divide. */
  def partParetoFront(spark: SparkSession, dir: String): DataFrame = {
    val p = Tables.part(spark, dir).select(
      col("p_partkey"),
      Cols.cents(col("p_retailprice")).as("price_cents"),
      col("p_size").cast("long").as("size"))
    paretoFront(p, "price_cents", "size")
      .select(col("p_partkey"),
        (col("price_cents").cast("double") / 100.0).as("price"),
        col("size"))
      .orderBy(col("price"), col("p_partkey"))
  }
}
