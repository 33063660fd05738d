package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Cols

/** Data-selection importance weighting in the style of DSIR (Xie et al.
  * 2023, "Data Selection for Language Models via Importance Resampling"):
  * score every raw document by how much its token distribution resembles a
  * TARGET slice of the corpus, using hashed-unigram bucket statistics so the
  * feature space is fixed-size no matter how large the vocabulary grows.
  *
  * Differences from the paper, chosen for engine portability: the per-bucket
  * statistic is the exact integer ratio floor(target_count·10⁴ /
  * raw_count) instead of a log-likelihood ratio (float logs are not
  * bit-reproducible across engines; the monotone integer ratio preserves
  * the ranking DSIR's resampling step consumes), and buckets come from the
  * portable 48-bit md5 hash ([[Dedup.PortableHash]]) so any engine computes
  * identical bucket ids.
  *
  * Scale shape: one explode of the corpus into tokens, immediately
  * collapsed to (doc, bucket, count) rows by a map-side-combinable
  * aggregation — the frame both downstream stages consume (identical
  * subtree, so the shuffle is planned once and reused). Bucket stats are
  * ONE tiny aggregation over it computing raw and target counts together
  * (the target count is a conditional sum — no second scan); the
  * ≤`buckets`-row stats table broadcasts back onto the doc-bucket frame
  * (≤ min(n_tok, buckets) rows per doc, far smaller than the token
  * stream), and one per-doc aggregation finishes. Nothing is quadratic.
  */
object Importance {

  /** Per-document importance scores against `targetPred` (a predicate over
    * the document's columns marking the target slice, e.g. `lang = 'en'`).
    * Emits per doc: token count, the summed 1e-4-unit bucket-ratio units,
    * and their floor-quantized mean — the importance weight a resampling
    * pass (e.g. [[Sampling.weightedSample]]) would consume. Documents with
    * no non-empty tokens carry no distribution signal and are absent, on
    * both sides of the oracle. */
  def importanceProfile(docs: DataFrame, targetPred: Column,
                        buckets: Int = 256, tag: String = "dsir"): DataFrame = {
    require(buckets > 0, "bucket count must be positive")
    val docBuckets = Spread.byKey(docs, col("doc_id")) // explode+md5 fan-out
      .select(col("doc_id"), col("source"), col("lang"),
        explode(filter(split(col("text"), " "), t => length(t) > 0)).as("tok"))
      .withColumn("bkt",
        Dedup.PortableHash(concat(lit(tag + ":"), col("tok"))) % buckets)
      .groupBy(col("doc_id"), col("source"), col("lang"), col("bkt"))
      .agg(count(lit(1)).as("cnt"))
    val stats = docBuckets.groupBy(col("bkt")).agg(
      sum(col("cnt")).as("raw_n"),
      sum(when(targetPred, col("cnt")).otherwise(0L)).as("tgt_n"))
    // integer division (DIV), not floor(a/b): the double path loses exactness
    // once a·10⁴ passes 2^53 — real at corpus-scale counts. Summing
    // cnt·score_u over doc-buckets ≡ summing score_u over tokens.
    docBuckets.join(broadcast(stats), Seq("bkt"))
      .withColumn("score_u", expr("tgt_n * 10000 DIV raw_n"))
      .groupBy(col("doc_id"), col("source"))
      .agg(sum(col("cnt")).as("n_tok"),
        sum(col("cnt") * col("score_u")).as("dsir_units"))
      .select(col("doc_id"), col("source"), col("n_tok"), col("dsir_units"),
        Cols.avg4(col("dsir_units").cast("double") / 10000.0, col("n_tok"))
          .as("dsir_score"))
      .orderBy(col("doc_id"))
  }
}
