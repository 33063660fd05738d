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
