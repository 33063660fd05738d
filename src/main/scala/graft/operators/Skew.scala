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
}
