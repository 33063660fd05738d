package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.plans.GramMatrixAggregate

/** Spectral / covariance-structure operators over the embedding corpus —
  * the distributed half of PCA, whitening, and dimension-health checks a
  * training-data pipeline runs before committing to an embedding space.
  *
  * The architecture is the standard one (reference intent:
  * `/root/reference/` ships embeddings but no spectral tooling; the public
  * pattern is MLlib RowMatrix.computePrincipalComponents): the O(n·d²)
  * scatter-matrix accumulation is distributed ([[gramMatrix]], one custom
  * bounded-buffer aggregate — see [[graft.plans.GramMatrixAggregate]] for
  * why the shuffle is corpus-size-independent), and the O(d³) eigen step
  * runs on the driver over the d×d result ([[topEigenvector]], test-anchored
  * power iteration) — d is 64 here and small everywhere this engine targets.
  *
  * Determinism doctrine: PCA needs ONE scale shared by all vectors (the
  * per-vector int8 scheme in [[Quantize]] is the right call for ANN but
  * would destroy cross-vector covariance), so vectors are fixed-point
  * quantized globally: qᵢ = ⌊vᵢ·4096⌋. Every registered aggregate is then a
  * 64-bit integer sum — exact, partition-order-independent, and mirrored
  * verbatim in the DuckDB oracle.
  */
object Spectral {

  /** Global fixed-point scale: 2¹² units per 1.0. Embeddings are
    * unit-norm-ish floats, so |q| stays ≤ ~2¹² and a gram term ≤ 2²⁴. */
  val FixedPointScale = 4096.0

  /** `array<long>` fixed-point codes; float→double widening is exact and
    * `floor` is IEEE-specified, so codes are identical in any engine. */
  def fixedPoint(emb: Column): Column =
    transform(emb, x => floor(x.cast("double") * lit(FixedPointScale)).cast("long"))

  /** Upper-triangular gram matrix of the fixed-point corpus: one row per
    * (i ≤ j) dimension pair with the exact integer sum Σ qᵢ·qⱼ over all
    * vectors, plus the vector count (the pair (gram, n) is sufficient for
    * covariance: cov = gram/n − mean·meanᵀ in any downstream precision).
    *
    * Plan shape: one ObjectHashAggregate pair (partial → final) with a flat
    * d·(d+1)/2-long buffer — no explode, no join; each partition ships one
    * buffer row. The explode to (i, j, q_sum) rows happens AFTER the final
    * aggregate, on d²/2 rows total. */
  def gramMatrix(embeddings: DataFrame, dim: Int = 64): DataFrame =
    embeddings
      .agg(count(lit(1)).as("n_vecs"),
        GramMatrixAggregate.gram(fixedPoint(col("embedding")), dim).as("g"))
      .select(col("n_vecs"), explode(col("g")).as("e"))
      .select(col("e.i").as("i"), col("e.j").as("j"),
        col("e.q_sum").as("q_sum"), col("n_vecs"))
      .orderBy(col("i"), col("j"))

  /** Per-dimension health stats of the fixed-point corpus: count, exact
    * integer sum, min, max per coordinate — the "is any dimension dead,
    * saturated, or drifting" check run before trusting an embedding space.
    * Explode is 64 rows per vector straight into a partial hash aggregate
    * with d groups — the shuffle is |partitions|·d rows. */
  def dimStats(embeddings: DataFrame): DataFrame =
    embeddings
      .select(posexplode(fixedPoint(col("embedding"))).as(Seq("pos", "q")))
      .groupBy(col("pos").cast("long").as("i"))
      .agg(count(lit(1)).as("n"), sum(col("q")).as("q_sum"),
        min(col("q")).as("q_min"), max(col("q")).as("q_max"))
      .orderBy(col("i"))

  /** Driver-side power iteration on a collected gram frame (the O(d³) half
    * of the PCA split; d×d fits on any driver). Deterministic: fixed start
    * vector, fixed iteration count, double arithmetic on one thread.
    * Returns the dominant eigenvector (sign-normalized: first nonzero
    * component positive). Test-anchored, not oracle-registered — no SQL
    * engine mirrors an eigensolve. */
  def topEigenvector(gram: Array[(Int, Int, Long)], dim: Int, iters: Int = 100): Array[Double] = {
    val a = Array.ofDim[Double](dim, dim)
    gram.foreach { case (i, j, s) => a(i)(j) = s.toDouble; a(j)(i) = s.toDouble }
    var v = Array.fill(dim)(1.0 / math.sqrt(dim.toDouble))
    var it = 0
    while (it < iters) {
      val w = new Array[Double](dim)
      var i = 0
      while (i < dim) {
        var s = 0.0
        var j = 0
        while (j < dim) { s += a(i)(j) * v(j); j += 1 }
        w(i) = s
        i += 1
      }
      val n = math.sqrt(w.map(x => x * x).sum)
      v = if (n > 0.0) w.map(_ / n) else w
      it += 1
    }
    val firstNonzero = v.find(math.abs(_) > 1e-12).getOrElse(1.0)
    if (firstNonzero < 0) v.map(-_) else v
  }
}
