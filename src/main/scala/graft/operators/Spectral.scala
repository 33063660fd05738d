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
    * [[topEigenvector]] stays as the test anchor; this keeps the whole
    * pipeline corpus→gram→eigenvector on the cluster with zero driver
    * collects).
    *
    * Plan shape: the corpus-scale work is [[gramMatrix]] (one bounded-
    * buffer aggregate); the loop itself runs as ARRAY arithmetic on a
    * one-row dense-matrix frame — each round is one projection
    * (`transform`/`aggregate` higher-order functions), so the 8 rounds
    * compile to a single narrow stage with NO per-round join, shuffle, or
    * window. The r12→r13 lesson: the previous row-frame loop (a broadcast
    * join + agg + window per round over 64-row frames) spent ~2 s of pure
    * driver/stage round-trips — 37+ Spark jobs for 64 rows of data. The
    * d²-longs-in-one-cell representation introduces NO new scale bound:
    * the gram stage's own flat aggregation buffer is already d²/2 longs,
    * so any d the pipeline can aggregate, this row can hold.
    *
    * All arithmetic is exact integer (same recurrence as before, and the
    * same doctrine as [[GraphRank.weightedPageRank]]): a FIXED number of
    * rounds of `w ← G'·v` the SQL oracle unrolls identically.
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
    // twice (the union) and the dense-row build re-derives sym — without
    // this checkpoint the full-corpus ObjectHashAggregate would run
    // multiple times for a d²-row result
    val gram = gramMatrix(embeddings, dim).coalesce(1).localCheckpoint()
    val sym = gram.select(col("i"), col("j"), col("q_sum").as("g"))
      .union(gram.where(col("i") < col("j"))
        .select(col("j").as("i"), col("i").as("j"), col("q_sum").as("g")))
    // ONE row: the rescaled dense matrix, row-major. gram emits EVERY i ≤ j
    // entry (zeros included, straight from the flat buffer), so sym is all
    // d² cells and sort_array by (i, j) lays them out at g[i·d + j]. The
    // rescale G' = sign(g)·(|g| div d_div) happens in the same projection.
    val mrow = sym
      .agg(sort_array(collect_list(struct(col("i"), col("j"), col("g")))).as("es"),
        greatest(lit(1L), expr("max(abs(g)) div 67108864")).as("d_div"))
      .select(col("d_div"), expr(
        "transform(es, e -> (CASE WHEN e.g < 0 THEN -1L ELSE 1L END)" +
          " * (abs(e.g) div d_div))").as("g"))
      .localCheckpoint()
    // The ENTIRE recurrence as one `aggregate()` expression: the round
    // counter is the sequence, the accumulator is struct(v, mx), and each
    // round's vector enters the lambda as a BOUND variable. The binding is
    // the point — when rounds were chained projections, CollapseProject
    // inlined each round's array expr into the next round's per-element
    // lambdas, re-evaluating the whole history once per element (the ~4 s
    // reading r11/r12 attributed to host load). Two lambda steps per
    // round: odd = matrix·vector product into the accumulator (so the even
    // step's renorm reads w as a bound field, never re-deriving it),
    // even = exact renormalization + the max|w| the eigenvalue needs.
    val matvec =
      s"transform(sequence(0, ${dim - 1}), i -> " +
        s"aggregate(sequence(0, ${dim - 1}), 0L, " +
        s"(a, j) -> a + element_at(g, i * $dim + j + 1) * element_at(acc.v, j + 1)))"
    val mxOfV = "greatest(array_max(transform(acc.v, x -> abs(x))), 1L)"
    val cur = mrow.select(col("d_div"), expr(
      s"""aggregate(
         |  sequence(1, ${2 * rounds}),
         |  named_struct('v', array_repeat(${scale}L, $dim), 'mx', 1L),
         |  (acc, s) -> CASE WHEN s % 2 = 1
         |    THEN named_struct('v', $matvec, 'mx', acc.mx)
         |    ELSE named_struct(
         |      'v', transform(acc.v, x -> (CASE WHEN x < 0 THEN -1L ELSE 1L END)
         |             * (CAST(abs(x) AS DECIMAL(38,0)) * ${scale}L div $mxOfV)),
         |      'mx', $mxOfV) END)""".stripMargin).as("r"))
      .select(col("d_div"), col("r.v").as("v"), col("r.mx").as("mx"))
    // lambda from the final round's max|w| (carried as mx — the normalized
    // v cannot recover it, its max is `scale` by construction); sign
    // convention s0 = sign of the lowest-indexed nonzero component
    // (filter preserves array order), +1 for the zero vector
    cur
      .select(
        expr(s"CAST(mx AS DECIMAL(38,0)) * d_div div ${scale}L").as("lambda_u"),
        expr("CASE WHEN size(filter(v, x -> x != 0)) = 0 THEN 1L " +
          "WHEN element_at(filter(v, x -> x != 0), 1) < 0 THEN -1L ELSE 1L END").as("s0"),
        col("v"))
      .select(col("lambda_u"), col("s0"), posexplode(col("v")).as(Seq("pos", "vi")))
      .select(col("pos").cast("long").as("i"), (col("vi") * col("s0")).as("v_unit"),
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
