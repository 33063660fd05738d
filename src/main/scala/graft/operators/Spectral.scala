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

  /** Distributed fixed-point power iteration over the gram matrix — PCA
    * stage 2 as a REGISTERED, oracle-checkable query (the driver-side
    * [[topEigenvector]] stays as the test anchor; this is the shape that
    * scales when d is large enough that d² driver work matters, and it
    * keeps the whole pipeline corpus→gram→eigenvector on the cluster).
    *
    * Same doctrine as [[GraphRank.weightedPageRank]]: a FIXED number of
    * rounds of `w ← G'·v` as one broadcast equi-join + one hash
    * aggregation per round over bounded frames (d² matrix entries, d rank
    * rows), all arithmetic exact integer so a SQL oracle can unroll the
    * identical recurrence.
    *
    * Determinism mechanics:
    *  - matrix rescale: G' = sign(g)·(|g| div D) with D = max(1,
    *    max|g| div 2²⁶) — caps |G'| ≈ 2²⁷ so each round's 64-term integer
    *    dot products stay ≤ 2²⁷·scale·d ≪ 2⁶³ (no wraparound, mirrored by
    *    BIGINT lanes in the oracle);
    *  - renormalization by max-|component| (not L2): v' = sign(w)·
    *    (|w|·scale div max|w|) — exact integers end to end; the one
    *    widening (|w|·scale can pass 2⁶³) runs in DECIMAL(38,0) here and
    *    HUGEINT in DuckDB, truncating division on nonnegative operands is
    *    engine-independent;
    *  - final sign convention: the lowest-indexed nonzero component is
    *    positive (same convention as [[topEigenvector]]).
    *
    * Output: one row per dimension (i, v_unit ∈ [−scale, scale],
    * lambda_u) where lambda_u = (max|w|·D) div scale ≈ the dominant
    * eigenvalue of the gram matrix in fixed-point units — constant across
    * rows, carried so the oracle pins the eigenvalue too. */
  def powerIteration(embeddings: DataFrame, dim: Int = 64, rounds: Int = 8,
                     scale: Long = 1000000L): DataFrame = {
    require(rounds >= 1 && scale >= 1)
    // materialize the corpus-wide aggregate ONCE: sym references the gram
    // twice (the union) and gm/edges re-derive sym again — without this
    // checkpoint the one edges materialization runs the full-corpus
    // ObjectHashAggregate four times for a d²-row result
    val gram = gramMatrix(embeddings, dim).coalesce(1).localCheckpoint()
    val sym = gram.select(col("i"), col("j"), col("q_sum").as("g"))
      .union(gram.where(col("i") < col("j"))
        .select(col("j").as("i"), col("i").as("j"), col("q_sum").as("g")))
    val gm = sym.agg(greatest(lit(1L),
      expr("max(abs(g)) div 67108864")).as("d_div"))
    // d² + 1 rows; materialized once — every round re-joins this frame
    val edges = sym.crossJoin(broadcast(gm))
      .select(col("i"), col("j"),
        (when(col("g") < 0, lit(-1L)).otherwise(lit(1L)) *
          expr("abs(g) div d_div")).as("gs"), col("d_div"))
      .coalesce(1).localCheckpoint()
    var v = edges.select(col("i").as("node")).distinct()
      .select(col("node"), lit(scale).as("v"))
    var lastW = v.select(col("node").as("i"), col("v").as("w")) // replaced below
    for (r <- 1 to rounds) {
      // repartition(1, i) BEFORE the agg: it satisfies the aggregation's
      // required distribution, so the d-group agg runs as one task instead
      // of fanning a 64-row frame across the session's 32 shuffle
      // partitions every round (the shuffle machinery, not the sums, was
      // the round cost; on a big-d cluster raise the partition count with
      // the frame size)
      val w = edges
        .join(broadcast(v.select(col("node").as("j"), col("v").as("vj"))), "j")
        .repartition(1, col("i"))
        .groupBy(col("i")).agg(sum(col("gs") * col("vj")).as("w"))
      // renormalization max as an empty-frame window, not a separate agg:
      // an agg + crossJoin(broadcast) here costs one extra Spark job per
      // round (8 driver round-trips per query); the window computes the
      // identical integer max inside the same job the checkpoint runs.
      // The d-row frame sits in one partition after coalesce, so the
      // global window is a non-event at any dimension this engine targets.
      val vn = w.coalesce(1)
        .select(col("i").as("node"),
          (when(col("w") < 0, lit(-1L)).otherwise(lit(1L)) *
            expr(s"CAST(abs(w) AS DECIMAL(38,0)) * ${scale}L" +
              " div greatest(max(abs(w)) OVER (), 1L)")).as("v"))
      v = if (r % 2 == 0 || r == rounds) vn.localCheckpoint() else vn
      if (r == rounds) lastW = w
    }
    // the final round's max|w| (the eigenvalue proxy) is re-derived from
    // the last w frame — one shallow job over the round-8 checkpointed
    // inputs; the normalized v cannot recover it (its max is scale by
    // construction)
    val lambda = lastW.agg(greatest(lit(1L), max(abs(col("w")))).as("m"))
      .crossJoin(broadcast(gm))
      .select(expr(s"CAST(m AS DECIMAL(38,0)) * d_div div ${scale}L").as("lambda_u"))
    // sign convention: flip so the lowest-indexed nonzero component is
    // positive; agg-on-empty yields null → coalesce to +1 (zero vector)
    val s0 = v.where(col("v") =!= 0)
      .agg(coalesce(min_by(when(col("v") < 0, lit(-1L)).otherwise(lit(1L)),
        col("node")), lit(1L)).as("s0"))
    v.crossJoin(broadcast(s0)).crossJoin(broadcast(lambda))
      .select(col("node").as("i"), (col("v") * col("s0")).as("v_unit"),
        col("lambda_u"))
      .orderBy(col("i"))
  }

  /** Pearson correlation census of the embedding dimensions — the
    * redundancy check run before trusting (or pruning) an embedding
    * space: highly correlated coordinate pairs mean wasted dimensions.
    * corr(i,j) = (n·Σqᵢqⱼ − Σqᵢ·Σqⱼ) / √((n·Σqᵢ² − (Σqᵢ)²)(n·Σqⱼ² −
    * (Σqⱼ)²)) over the same global fixed-point codes as the gram, so
    * every moment is an exact integer: the numerator and both variance
    * terms compute in DECIMAL(38,0) lanes (HUGEINT in the oracle), and
    * the only float work is ONE divide/√/floor-quantize sequence per
    * pair, mirrored verbatim. Zero-variance dimensions report 0.
    *
    * Scale shape: two corpus passes (gram aggregate + per-dim sums — both
    * corpus-size-independent shuffles), then all joins are broadcasts of
    * d-row frames onto the d²/2-row pair frame. */
  def dimCorrelations(embeddings: DataFrame, dim: Int = 64): DataFrame = {
    val gram = gramMatrix(embeddings, dim).coalesce(1).localCheckpoint()
    val diag = gram.where(col("i") === col("j"))
      .select(col("i").as("k"), col("q_sum").as("s2"))
    val sums = dimStats(embeddings).select(col("i").as("k"), col("q_sum").as("s1"))
    gram.where(col("i") < col("j"))
      .join(broadcast(diag.select(col("k").as("i"), col("s2").as("s2i"))), Seq("i"))
      .join(broadcast(diag.select(col("k").as("j"), col("s2").as("s2j"))), Seq("j"))
      .join(broadcast(sums.select(col("k").as("i"), col("s1").as("s1i"))), Seq("i"))
      .join(broadcast(sums.select(col("k").as("j"), col("s1").as("s1j"))), Seq("j"))
      .select(col("i"), col("j"), expr(
        """CASE WHEN (CAST(n_vecs AS DECIMAL(38,0)) * s2i - CAST(s1i AS DECIMAL(38,0)) * s1i) > 0
          |       AND (CAST(n_vecs AS DECIMAL(38,0)) * s2j - CAST(s1j AS DECIMAL(38,0)) * s1j) > 0
          |  THEN CAST(floor(
          |    CAST(CAST(n_vecs AS DECIMAL(38,0)) * q_sum - CAST(s1i AS DECIMAL(38,0)) * s1j AS DOUBLE)
          |    / sqrt(CAST(CAST(n_vecs AS DECIMAL(38,0)) * s2i - CAST(s1i AS DECIMAL(38,0)) * s1i AS DOUBLE)
          |         * CAST(CAST(n_vecs AS DECIMAL(38,0)) * s2j - CAST(s1j AS DECIMAL(38,0)) * s1j AS DOUBLE))
          |    * 10000.0) AS BIGINT)
          |  ELSE 0 END""".stripMargin).as("corr_u"))
      .orderBy(col("i"), col("j"))
  }

  /** PCA "reduce" action step: project every vector onto the
    * [[powerIteration]] dominant eigenvector and report the score
    * distribution as a signed ⌊log₂⌋ histogram (≤ ~80 rows at any corpus
    * size — the same bounded-census doctrine as the key-skew and latency
    * histograms). Scores are exact integers (code units × eigenvector
    * units, ≤ 2⁶³ headroom documented at both scales), so the census is
    * bit-reproducible; bucket = sign · (length(bin(|score|)) − 1).
    *
    * Scale shape: the eigenvector is a d-row broadcast; scoring is
    * explode → map-side-combined per-vector sum (shuffle |vecs| rows) →
    * bounded bucket agg. */
  def pcaScoreHistogram(embeddings: DataFrame, dim: Int = 64, rounds: Int = 8): DataFrame = {
    val v = powerIteration(embeddings, dim, rounds).select(col("i"), col("v_unit"))
    val codes = embeddings.select(col("vec_id"),
      posexplode(fixedPoint(col("embedding"))).as(Seq("i", "q")))
    val scores = codes.join(broadcast(v), Seq("i"))
      .groupBy(col("vec_id")).agg(sum(col("q") * col("v_unit")).as("score"))
    scores
      .groupBy(when(col("score") === 0, lit(0L))
        .otherwise(when(col("score") < 0, lit(-1L)).otherwise(lit(1L)) *
          (length(bin(abs(col("score")))) - 1).cast("long"))
        .as("log2_bucket"))
      .agg(count(lit(1)).as("n_vecs"), sum(col("score")).as("score_sum"))
      .orderBy(col("log2_bucket"))
  }

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
