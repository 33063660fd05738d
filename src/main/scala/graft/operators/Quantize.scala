package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.plans.VectorExpressions.{fvecDot, ivecDot}

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

  /** Product quantization (PQ) top-k — the other half of the FAISS-style
    * compression toolbox beside [[quantizedTopK]]'s scalar SQ8 (Jégou,
    * Douze, Schmid, "Product Quantization for Nearest Neighbor Search",
    * TPAMI 2011): split each vector into `m` subspaces, learn a tiny
    * per-subspace codebook, store each vector as `m` small code ids, and
    * answer queries by Asymmetric Distance Computation — per query, a
    * lookup table of (subspace, codeword)→score built once against the
    * FULL-precision codewords, then each corpus vector scores as the sum
    * of `m` table entries without ever touching its floats again.
    *
    * This engine's deterministic rendition (inner-product flavor, matching
    * the IVF family's argmax-dot assignment): codebooks are the min-vec_id
    * subvector per md5₄₈ hash bucket (the [[Similarity.seedCentroids]]
    * doctrine, tagged per subspace); encoding picks the max-dot codeword
    * with ties to the lowest code id (an aggregation, not a window); LUT
    * entries are floored to exact 1e-4-unit longs so the ADC sum is
    * order-independent integer arithmetic — bit-identical in any engine,
    * which is what lets a SQL oracle state the whole pipeline.
    *
    * Scale shape: codebooks and LUTs are m·codebookSize rows — broadcast.
    * Encoding is one broadcast join + one map-side-combinable agg over
    * m rows/vector, paid once at index-build time (at 100 TB it lands
    * next to the corpus like [[Similarity.writeCellPartitioned]], and the
    * 512-bit-per-vector code table is what the ADC scan reads — a ~32×
    * scan-volume cut at dim 64 float32). The ADC scan itself is a
    * broadcast LUT join + integer-sum agg + the bounded
    * [[graft.plans.TopKAggregate]] heap — no ranking window, no sort, no
    * full-precision reads. */
  def pqTopK(corpus: DataFrame, queries: DataFrame, k: Int = 5,
             m: Int = 4, codebookSize: Int = 16, dim: Int = 64): DataFrame =
    pqAdcTopK(corpus, queries,
      pqSeedCodebook(corpus, m, codebookSize, dim / m), k, m, dim / m)

  /** PQ top-k over Lloyd-refined codebooks — same ADC query plan as
    * [[pqTopK]], better codebooks. `iters` rounds of assign → quantized-
    * mean recompute per subspace (the [[Similarity.kmeansCentroids]]
    * doctrine applied per (sub, code_id): component means go through exact
    * 1e-4-unit long sums, so every round is bit-deterministic across
    * partitionings and engines, and the SQL oracle unrolls the same
    * rounds). Each round is one broadcast-join pass over the m·n subvector
    * rows plus a codebook-sized aggregation; the m·codebookSize refined
    * codebook is collected per round (the standard distributed-Lloyd
    * materialization — k·dim scalars, never corpus-sized). */
  def pqKmeansTopK(corpus: DataFrame, queries: DataFrame, k: Int = 5,
                   m: Int = 4, codebookSize: Int = 16, dim: Int = 64,
                   iters: Int = 2): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val subLen = dim / m
    val sv = pqSubVecs(corpus, "vec_id", m, subLen)
    var cb = pqSeedCodebook(corpus, m, codebookSize, subLen)
    for (_ <- 1 to iters) {
      val assigned = sv.join(broadcast(cb), Seq("sub"))
        .select(col("vec_id"), col("sub"), col("sv"),
          struct(fvecDot(col("sv"), col("c_emb")).as("dot"),
            (-col("code_id")).as("neg"), col("code_id").as("code_id")).as("sc"))
        .groupBy(col("vec_id"), col("sub"))
        .agg(max(col("sc")).as("best"), first(col("sv")).as("sv"))
        .select(col("sub"), col("best.code_id").as("code_id"), col("sv"))
      val updated = assigned
        .select(col("sub"), col("code_id"), posexplode(col("sv")).as(Seq("pos", "v")))
        .groupBy(col("sub"), col("code_id"), col("pos"))
        .agg(sum(floor(col("v").cast("double") * 10000.0)).as("s_u"),
          count(lit(1)).as("n"))
        .select(col("sub"), col("code_id"), col("pos"),
          (col("s_u").cast("double") / 10000.0 / col("n").cast("double")).as("c"))
        .groupBy(col("sub"), col("code_id"))
        .agg(array_sort(collect_list(struct(col("pos"), col("c")))).as("pairs"))
        .select(col("sub"), col("code_id"),
          transform(col("pairs"), p => p.getField("c")).as("c_emb"))
      cb = updated.as[(Int, Long, Seq[Double])].collect()
        .sortBy(t => (t._1, t._2)).toSeq.toDF("sub", "code_id", "c_emb")
    }
    pqAdcTopK(corpus, queries, cb, k, m, subLen)
  }

  /** One row per (vector, subspace): the subLen-element slice. */
  private def pqSubVecs(df: DataFrame, idAs: String, m: Int, subLen: Int): DataFrame =
    df.select(col("vec_id").as(idAs),
        explode(sequence(lit(0), lit(m - 1))).as("sub"), col("embedding"))
      .select(col(idAs), col("sub"),
        slice(col("embedding"), col("sub") * subLen + 1, lit(subLen)).as("sv"))

  /** Seed codebooks: min-vec_id subvector per md5₄₈ hash bucket, tagged per
    * subspace (the [[Similarity.seedCentroids]] doctrine). */
  private def pqSeedCodebook(corpus: DataFrame, m: Int, codebookSize: Int,
                             subLen: Int): DataFrame =
    pqSubVecs(corpus, "vec_id", m, subLen)
      .groupBy(col("sub"),
        (Dedup.PortableHash(concat(lit("pq"), col("sub").cast("string"), lit(":"),
          col("vec_id").cast("string"))) % codebookSize).as("bucket"))
      .agg(min(col("vec_id")).as("code_id"), min_by(col("sv"), col("vec_id")).as("c_emb"))
      .select(col("sub"), col("code_id"), col("c_emb"))

  /** The shared ADC stage: encode the corpus against `cb`, build the
    * per-query integer LUT, sum table entries, heap top-k. */
  private def pqAdcTopK(corpus: DataFrame, queries: DataFrame, cb: DataFrame,
                        k: Int, m: Int, subLen: Int): DataFrame = {
    val codebook = broadcast(cb)

    val enc = pqSubVecs(corpus, "vec_id", m, subLen)
      .join(codebook, Seq("sub"))
      .select(col("vec_id"), col("sub"),
        struct(fvecDot(col("sv"), col("c_emb")).as("dot"),
          (-col("code_id")).as("neg"), col("code_id").as("code_id")).as("sc"))
      .groupBy(col("vec_id"), col("sub"))
      .agg(max(col("sc")).as("best"))
      .select(col("vec_id"), col("sub"), col("best.code_id").as("code_id"))

    val lut = broadcast(
      pqSubVecs(queries, "query_id", m, subLen)
        .join(codebook, Seq("sub"))
        .select(col("query_id"), col("sub"), col("code_id"),
          floor(fvecDot(col("sv"), col("c_emb")) * 10000.0).cast("long").as("du")))

    val adc = enc.join(lut, Seq("sub", "code_id"))
      .where(col("vec_id") =!= col("query_id"))
      .groupBy(col("query_id"), col("vec_id"))
      .agg(sum(col("du")).as("su"))
    // su is bounded by m·|max subspace dot|·1e4 ≪ 2^53, so the
    // long→double→long round-trip through the heap is exact
    adc.groupBy(col("query_id"))
      .agg(graft.plans.TopKAggregate.topk(
        struct(col("su").cast("double"), col("vec_id")), k).as("top"))
      .select(col("query_id"), posexplode(col("top")).as(Seq("pos", "p")))
      .select(col("query_id"), (col("pos") + 1).cast("long").as("rank"),
        col("p.id").as("neighbor_id"),
        (col("p.score").cast("long").cast("double") / 10000.0).as("approx_dot"))
      .orderBy(col("query_id"), col("rank"))
  }
}
