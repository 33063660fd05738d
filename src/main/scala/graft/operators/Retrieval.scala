package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Cols

/** Hybrid retrieval — the standard two-tower RAG candidate stage: a SPARSE
  * list (BM25 over the text corpus) and a DENSE list (cosine top-k over
  * the embedding table) fused with Reciprocal Rank Fusion
  * (Cormack/Clarke/Buettcher, SIGIR 2009): score(d) = Σ_lists 1/(k₀+rank).
  * RRF needs no score calibration between the towers — only ranks — which
  * is what makes it the default fusion in production retrieval stacks.
  *
  * Determinism: both input lists are rank-truncated with total
  * tie-breaking (score desc, id asc); the fusion term 1/(k₀+rank) is one
  * correctly-rounded IEEE division per list and the two-term sum is
  * evaluated in fixed order, so the fused ordering is bit-identical in any
  * IEEE engine and the SQL oracle reproduces it exactly. Absent ranks
  * surface as 0 in the output (the fused score simply omits that list's
  * term) so the result schema stays NULL-free.
  *
  * Scale shape: the sparse side is the [[TextAnalysis.bm25TopDocs]] plan
  * (term-pruned scan, top-k — never a corpus explode); the dense side is
  * the broadcast-query exact scorer ([[Similarity.topKCosine]]; swap in
  * the IVF/LSH ANN variants at corpus scale — same (id, rank) contract).
  * Fusion itself joins two ≤ listK-row frames — driver-free and trivially
  * broadcast. */
object Retrieval {

  def hybridTopDocs(docs: DataFrame, embeddings: DataFrame, terms: Seq[String],
                    queryVecId: Long = 0L, listK: Int = 50, k: Int = 10,
                    rrfK: Int = 60): DataFrame = {
    val wb = Window.orderBy(col("score_micro").desc, col("doc_id").asc)
    val sparse = TextAnalysis.bm25TopDocs(docs, terms, listK)
      .select(col("doc_id"), row_number().over(wb).cast("long").as("bm25_rank"))
    val dense = Similarity.topKCosine(
        embeddings, embeddings.where(col("vec_id") === queryVecId), listK)
      .select(col("neighbor_id").as("doc_id"), col("rank").as("cosine_rank"))
    val term = (r: org.apache.spark.sql.Column) =>
      coalesce(lit(1.0) / (lit(rrfK.toDouble) + r.cast("double")), lit(0.0))
    sparse.join(dense, Seq("doc_id"), "full_outer")
      .select(col("doc_id"), col("bm25_rank"), col("cosine_rank"),
        (term(col("bm25_rank")) + term(col("cosine_rank"))).as("rrf_raw"))
      .orderBy(col("rrf_raw").desc, col("doc_id").asc)
      .limit(k)
      .select(col("doc_id"),
        coalesce(col("bm25_rank"), lit(0L)).as("bm25_rank"),
        coalesce(col("cosine_rank"), lit(0L)).as("cosine_rank"),
        Cols.asDec4(col("rrf_raw") * 100.0).as("rrf_x100"))
      // selection above ranks on the RAW fused score; the displayed order
      // re-sorts on the quantized score so engine and oracle agree even if
      // quantization introduces ties
      .orderBy(col("rrf_x100").desc, col("doc_id").asc)
  }

  /** RBO depth weights p^(d−1), computed ONCE in Scala and shared with the
    * oracle generator: `math.pow` is not correctly-rounded IEEE, so the
    * cross-engine contract is "both sides use THIS double", not "both
    * sides call pow". */
  private[graft] val RboP = 0.9
  private[graft] val RboDepth = 10
  private[graft] val RboWeights: Seq[(Int, Double)] =
    (1 to RboDepth).map(d => d -> math.pow(RboP, d - 1))

  /** Rank-biased overlap (Webber, Moffat & Zobel 2010) between the two
    * retrieval towers' top-k lists — "do lexical and dense retrieval even
    * agree?", the routing/eval diagnostic a hybrid stack reads before
    * trusting fusion. RBO@k = (1−p)·Σ_{d≤k} p^(d−1)·|A_d ∩ B_d|/d with
    * the truncated-list convention (no extrapolation).
    *
    * Exactness: overlaps are exact integer counts per depth; each depth's
    * weighted term is floor-quantized to integer 1e12 units before the
    * sum (bounded k terms — the no-double-sums rule); the depth weights
    * are the SHARED [[RboWeights]] literals.
    *
    * Shape: both rank lists are ≤ k rows (the [[hybridTopDocs]] towers);
    * everything here is bounded by k² — the corpus is only touched by the
    * towers' own scans. */
  def rboLexicalDense(docs: DataFrame, embeddings: DataFrame,
                      terms: Seq[String] = Seq("join", "filter", "stream"),
                      queryVecId: Long = 0L): DataFrame = {
    val k = RboDepth
    val wb = Window.orderBy(col("score_micro").desc, col("doc_id").asc)
    val sparse = TextAnalysis.bm25TopDocs(docs, terms, k)
      .select(col("doc_id"), row_number().over(wb).cast("long").as("ra"))
    val dense = Similarity.topKCosine(
        embeddings, embeddings.where(col("vec_id") === queryVecId), k)
      .select(col("neighbor_id").as("doc_id"), col("rank").as("rb"))
    val joined = sparse.join(dense, Seq("doc_id"))
    val wCol = RboWeights.foldLeft(when(lit(false), 0.0)) {
      case (acc, (d, w)) => acc.when(col("d") === d.toLong, lit(w))
    }.otherwise(lit(0.0))
    val tq = joined
      .withColumn("d", explode(array((1 to k).map(i => lit(i.toLong)): _*)))
      .where(col("ra") <= col("d") && col("rb") <= col("d"))
      .groupBy(col("d")).agg(count(lit(1)).as("ov"))
      .select(col("d"), col("ov"),
        floor(wCol * col("ov").cast("double") / col("d").cast("double") * 1e12)
          .cast("long").as("tq"))
    tq.agg(coalesce(sum(col("tq")), lit(0L)).as("sq"),
        coalesce(max(when(col("d") === k.toLong, col("ov"))), lit(0L)).as("ovk"))
      .select(lit(k.toLong).as("depth"), col("ovk").as("overlap_at_k"),
        (floor(lit(1.0 - RboP) * col("sq").cast("double") / 1e12 * 1e6) / 1e6)
          .as("rbo"))
  }
}
