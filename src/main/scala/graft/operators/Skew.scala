package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-aware two-stage aggregation (SURVEY.md §4 north-star: "salted /
  * skew-aware aggregation").
  *
  * A plain groupBy on a skewed key sends the hot key's every row to one
  * reducer. Salting splits each key into `salts` sub-groups for a partial
  * aggregate, then merges the partials — the hot key's work spreads over
  * `salts` tasks and the second shuffle carries only |keys|×salts rows.
  *
  * AQE's skew-join handling covers *joins*; aggregation skew still needs
  * this pattern (or enough partial-aggregation memory map-side — salting is
  * the guarantee when the map-side hash table overflows and starts
  * spill-merging a hot key).
  *
  * Only algebraic aggregates (sum/count/min/max) can be salted this way;
  * the API takes (column → partial) and (partial → merge) pairs to keep
  * that contract explicit.
  */
object Skew {

  /** Salted equi-join: `big ⋈ small` on `keys`, with the big side's hot
    * keys spread over `salts` shuffle partitions and the small side
    * replicated `salts`× to meet them. Result ≡ the plain equi-join.
    *
    * The regime: BOTH sides too big (or the small side too hot) to
    * broadcast, and the big side's key distribution skewed enough that one
    * reducer would take the whole hot key. AQE's skew-join split handles
    * sort-merge spills after the fact; salting guarantees the spread
    * structurally — each (key, salt) sub-join carries ~1/salts of the hot
    * key's rows. Replication multiplies the small side's shuffle volume by
    * `salts`, which is the explicit price (choose salts ≈ hot-key factor).
    * The shuffle_hash hint keeps the planner from broadcasting the
    * replicated side, which would defeat the demonstration (broadcast is
    * the right plan when it FITS — salting is for when it doesn't).
    *
    * The salt must be a deterministic hash of a roughly-unique column —
    * NOT rand(), which breaks retry determinism. */
  def saltedJoin(big: DataFrame, small: DataFrame, keys: Seq[String],
                 saltSource: Column, salts: Int = 16): DataFrame = {
    val salted = big.withColumn("_salt", pmod(xxhash64(saltSource), lit(salts.toLong)))
    val replicated = small.withColumn("_salt",
      explode(sequence(lit(0L), lit(salts.toLong - 1))))
    salted.join(replicated.hint("shuffle_hash"), keys :+ "_salt").drop("_salt")
  }

  /** Salted sum+count per key; equivalent to
    * `df.groupBy(keys).agg(sum(value), count(*))` with skew resistance.
    * The salt is a deterministic hash of `saltSource` (any roughly-unique
    * column — an id; NOT rand(), which would break retry determinism). */
  def saltedSumCount(df: DataFrame, keys: Seq[String], value: Column,
                     saltSource: Column, salts: Int = 16): DataFrame = {
    val keyCols = keys.map(col)
    val partial = df
      .withColumn("_salt", pmod(xxhash64(saltSource), lit(salts.toLong)))
      .groupBy(keyCols :+ col("_salt"): _*)
      .agg(sum(value).as("_psum"), count(lit(1)).as("_pcnt"))
    partial
      .groupBy(keyCols: _*)
      .agg(sum(col("_psum")).as("total"), sum(col("_pcnt")).as("rows"))
  }

  /** Key-skew histogram: the count-of-counts profile that DECIDES whether a
    * key needs salting before you pay for a bad shuffle. Rows are counted
    * per key, then keys are bucketed by ⌊log₂(count)⌋ — each output row
    * says "n_keys keys carry between 2^b and 2^(b+1)−1 rows each, n_rows
    * rows in total". A heavy-tailed histogram (few keys in a high bucket
    * holding most rows) is the signature that [[saltedSumCount]] /
    * [[saltedJoin]] are needed; a tight histogram says plain hash
    * partitioning is safe.
    *
    * The log₂ bucket is computed INTEGER-exactly as `length(bin(cnt)) − 1`
    * (bit length of the count, identical in any engine) — never via a
    * floating log whose last-ulp could flip a boundary key.
    *
    * Shape: two hash aggregations (key → count, bucket → stats); the first
    * is exactly the shuffle being diagnosed, the second is over the bounded
    * bucket domain (≤ 64 rows out). Linear, no window, no join. */
  def keySkewHistogram(df: DataFrame, keys: Seq[String]): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("__cnt"))
      .groupBy((length(bin(col("__cnt"))) - 1).cast("long").as("log2_bucket"))
      .agg(
        count(lit(1)).as("n_keys"),
        sum(col("__cnt")).as("n_rows"),
        min(col("__cnt")).as("min_cnt"),
        max(col("__cnt")).as("max_cnt"))
      .orderBy(col("log2_bucket"))
}
