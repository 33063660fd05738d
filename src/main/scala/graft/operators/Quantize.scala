package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.plans.VectorExpressions.ivecDot

/** Scalar int8 quantization of embedding vectors — the standard 4× memory /
  * bandwidth cut before large-scale similarity search (float32 → int8 with
  * a per-vector scale; FAISS's `SQ8`, public quantization literature).
  *
  * At 100 TB the embedding column dominates scan and shuffle cost, and the
  * ANN candidate stage only needs approximate scores: quantized vectors
  * shrink every downstream exchange 4×, and candidate scoring becomes pure
  * 64-bit INTEGER dot products ([[graft.plans.VectorExpressions.IntVectorDot]])
  * — deterministic across engines and accumulation orders by construction
  * (integer addition commutes exactly; no IEEE rounding anywhere), which is
  * also what makes every query here oracle-checkable bit-for-bit.
  *
  * Quantization rule (all IEEE-exact ops, mirrored verbatim in the oracle
  * SQL): scale = 127 / max|v| (0 for a zero vector), qᵢ = ⌊vᵢ·scale + ½⌋ —
  * floor(x+0.5) rather than round() because half-up float rounding is
  * specified identically everywhere, while round() half-even/half-away
  * conventions differ across engines.
  */
object Quantize {

  /** max|vᵢ| as double: float abs is exact, widening is exact. */
  private def vmax(emb: Column): Column =
    array_max(transform(emb, x => abs(x))).cast("double")

  private def scaleOf(emb: Column): Column = {
    val m = vmax(emb)
    when(m > 0.0, lit(127.0) / m).otherwise(lit(0.0))
  }

  /** int8 code array (as array<long> in-plan; at rest this packs to 1
    * byte/element — see scaladoc). */
  private def codes(emb: Column, scale: Column): Column =
    transform(emb, x => floor(x.cast("double") * scale + 0.5).cast("long"))

  /** Per-vector quantization profile: the scale, the integer L1 mass of the
    * codes, and the worst per-element reconstruction error — what a
    * quantization-quality gate reads before switching the ANN fleet to
    * int8. One narrow pass, no shuffle. */
  def quantStats(embeddings: DataFrame): DataFrame = {
    val scale = col("__scale")
    embeddings
      .select(col("vec_id"), col("label"), col("embedding"),
        scaleOf(col("embedding")).as("__scale"))
      .select(col("vec_id"), col("label"), scale.as("scale"),
        aggregate(transform(codes(col("embedding"), scale), q => abs(q)),
          lit(0L), (acc, v) => acc + v).as("q_l1"),
        // err must pair each element with ITS code, so the code expression
        // is re-stated inside the per-element lambda (codes() returns the
        // whole array; zip-free form keeps one pass)
        when(scale > 0.0,
          array_max(transform(col("embedding"),
            x => abs(x.cast("double") - floor(x.cast("double") * scale + 0.5) / scale))))
          .otherwise(lit(0.0)).as("max_err"))
      .orderBy(col("vec_id"))
  }

  /** Quantized top-k: rank corpus vectors per query by the INTEGER dot of
    * their int8 codes (descending, neighbor id ascending on ties). This is
    * the candidate stage of a quantized ANN pipeline — a float rescore of
    * the top candidates follows in production; the registered query pins
    * the quantized stage itself, which is exactly portable. Queries
    * broadcast; the corpus side streams with one codegen'd integer dot per
    * pair, and ranking runs on the engine's bounded heap aggregate
    * ([[graft.plans.TopKAggregate]], same shape as
    * [[Similarity.topKCosineAgg]]): each partition keeps an O(k) heap per
    * query and ships k pairs — no per-query corpus-sized sort, no ranking
    * window. The heap scores are doubles; an int8 dot is bounded by
    * dim·127² (≈ 1.03e6 at dim 64, and < 2⁵³ for any dim < ~5e8), so the
    * long→double→long round-trip is exact and the ordering identical. */
  def quantizedTopK(corpus: DataFrame, queries: DataFrame, k: Int = 5): DataFrame = {
    def coded(df: DataFrame, idAs: String, qAs: String): DataFrame =
      df.select(col("vec_id").as(idAs),
        codes(col("embedding"), scaleOf(col("embedding"))).as(qAs))
    val c = coded(corpus, "neighbor_id", "q_c")
    val q = broadcast(coded(queries, "query_id", "q_q"))
    val scored = c.join(q, col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        ivecDot(col("q_c"), col("q_q")).as("q_dot"))
    scored.groupBy(col("query_id"))
      .agg(graft.plans.TopKAggregate.topk(
        struct(col("q_dot").cast("double"), col("neighbor_id")), k).as("top"))
      .select(col("query_id"), posexplode(col("top")).as(Seq("pos", "p")))
      .select(col("query_id"), (col("pos") + 1).cast("long").as("rank"),
        col("p.id").as("neighbor_id"), col("p.score").cast("long").as("q_dot"))
      .orderBy(col("query_id"), col("rank"))
  }
}
