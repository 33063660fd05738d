package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic content-addressed sampling — the training-data way to cut
  * a corpus down: membership is a pure function of a stable key, never of
  * `rand()`, so the sample is identical across runs, retries, partitionings
  * and engines (reproducible experiments, joinable across tables, and
  * oracle-checkable). Rates are rational num/den so the membership test is
  * pure integer arithmetic.
  *
  * Scale shape: a per-row filter — no shuffle, no state; pushes through any
  * downstream plan. The `tag` salts the hash so different samples drawn on
  * the same key column are independent.
  */
object Sampling {

  /** Keep a row iff md5₄₈(tag:key) mod den < num (rate num/den). */
  def hashSample(df: DataFrame, keyCol: Column, num: Int, den: Int,
                 tag: String = "sample"): DataFrame = {
    require(num >= 0 && den > 0 && num <= den, "rate num/den must be in [0, 1]")
    df.where(Dedup.PortableHash(concat(lit(tag + ":"), keyCol.cast("string")))
      % den < num)
  }

  /** Per-source profile of a 1/`den` document sample — what a corpus-budget
    * dashboard reads after sampling. */
  def sampleProfile(docs: DataFrame, num: Int = 1, den: Int = 5): DataFrame =
    hashSample(docs, col("doc_id"), num, den)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("sampled_docs"), sum(col("n_chars")).as("sampled_chars"))
      .orderBy(col("source"))
}
