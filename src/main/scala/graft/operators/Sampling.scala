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

  /** Exactly-k-per-group sample: rank each group's rows by a salted content
    * hash (a deterministic shuffle of the group — same keys, same sample,
    * any engine) and keep the first k. The fixed-quota complement to the
    * rate-based [[hashSample]] (rates drift with group size; quotas pin the
    * per-stratum budget — few-shot pools, eval slices, per-source caps).
    *
    * Scale shape: one hash-partitioned window per group, no global
    * structure; the rank never leaves its exchange. At extreme group sizes
    * the same contract runs as groupBy + a bounded top-k heap
    * ([[graft.plans.TopKAggregate]]) instead of a full per-group sort. */
  def groupSample(docs: DataFrame, groupCol: Column, keyCol: Column, k: Int,
                  tag: String = "gs"): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy(groupCol)
      .orderBy(Dedup.PortableHash(concat(lit(tag + ":"), keyCol.cast("string"))).asc,
        keyCol.asc)
    docs.withColumn("__rn", row_number().over(w)).where(col("__rn") <= k).drop("__rn")
  }

  /** Quality-weighted Bernoulli sample: each row is admitted with
    * probability proportional to its weight — P(admit) =
    * (w_u / wDen) · (num / den), where w_u is an exact integer weight in
    * [0, wDen] (e.g. [[TextAnalysis.qualityUnits]]' 1e-4-unit quality
    * score). The membership test is pure integer arithmetic —
    * md5₄₈(tag:key) mod (wDen·den) < w_u·num — so, like [[hashSample]],
    * the sample is a deterministic function of content: identical across
    * runs, partitionings, cluster sizes, and engines. This is the standard
    * quality-proportional corpus downsampling step (keep good documents
    * preferentially, keep SOME low-quality mass for diversity) expressed
    * as a scan-side filter: no shuffle, no state, pushes to the scan. */
  def weightedSample(df: DataFrame, keyCol: Column, weightUnits: Column,
                     num: Int, den: Int, wDen: Int = 10000,
                     tag: String = "wsample"): DataFrame = {
    require(num >= 0 && den > 0 && num <= den, "rate num/den must be in [0, 1]")
    // The weight column is data, so the rate-style require can't see it:
    // a weight above wDen would silently clamp P(admit) at 1 (breaking
    // proportionality) and a negative one silently yield P = 0. Fail fast
    // row-side instead — assert_true throws on the first bad weight and
    // costs one codegen'd comparison on the scan it already rides.
    val wOk = assert_true(weightUnits >= 0 && weightUnits <= wDen,
      lit(s"weightedSample: weightUnits must be in [0, $wDen]"))
    df.where(wOk.isNull &&
      Dedup.PortableHash(concat(lit(tag + ":"), keyCol.cast("string")))
        % (wDen.toLong * den) < weightUnits.cast("long") * num)
  }

  /** Per-source budget profile of a quality-weighted document sample: what
    * survives, how many characters it keeps, and the mean quality of the
    * kept mass (which weighted sampling shifts UP relative to the corpus —
    * the number a curation dashboard watches). Takes the pre-scored
    * (doc_id, source, n_chars, qual_u) frame so the quality projection is
    * computed once in the same scan the filter rides. */
  def weightedSampleProfile(scoredDocs: DataFrame, num: Int = 1,
                            den: Int = 2): DataFrame =
    weightedSample(scoredDocs, col("doc_id"), col("qual_u"), num, den)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("sampled_docs"),
        sum(col("n_chars")).as("sampled_chars"),
        graft.functions.Cols.avg4(
          sum(col("qual_u")).cast("double") / 10000.0, count(lit(1))).as("mean_quality"))
      .orderBy(col("source"))

  /** Deterministic train/validation/test assignment: the split is a pure
    * function of the content key (md5₄₈ mod `den` against cumulative
    * thresholds), so every engine, run, and table agrees on membership —
    * the property that keeps eval sets uncontaminated when the corpus is
    * re-processed. Thresholds are rationals over one denominator
    * (train < t1 ≤ val < t2 ≤ test = den). A per-row projection: no
    * shuffle, rides the scan. */
  def withSplit(df: DataFrame, keyCol: Column, trainNum: Int, valNum: Int,
                den: Int, tag: String = "split"): DataFrame = {
    require(trainNum >= 0 && valNum >= 0 && trainNum + valNum <= den,
      "split fractions must satisfy train + val <= den")
    val bucket = Dedup.PortableHash(concat(lit(tag + ":"), keyCol.cast("string"))) % den
    df.withColumn("split",
      when(bucket < trainNum, "train")
        .when(bucket < trainNum + valNum, "val")
        .otherwise("test"))
  }

  /** Group-leakage audit of train/test splitting — the ML-hygiene check
    * behind "split by GROUP, not by row": a row-keyed (event-keyed) split
    * puts the same user's history on both sides, the classic leakage that
    * inflates eval metrics on any user-behavior model; a user-keyed split
    * structurally cannot. Quantified side by side at the same rate: per
    * method, distinct users in train, in test, and straddling BOTH.
    *
    * Shape: one distinct-collapse aggregation per method — scan-side hash
    * predicates and two map-side-combined aggs, never a self-join; output
    * is two rows. The by_user row's straddling_users is the structural
    * zero a pipeline should ASSERT before training. */
  def splitLeakageAudit(events: DataFrame, num: Int = 1, den: Int = 5): DataFrame = {
    import graft.functions.Cols
    def h(tag: String, c: Column) =
      Dedup.PortableHash(concat(lit(tag), c.cast("string")))
    def census(method: String, isTest: Column) =
      events.where(col("user_id").isNotNull) // leakage is a USER property
        .select(col("user_id"), isTest.as("t"))
        .groupBy(col("user_id"))
        .agg(max(when(col("t"), 1L).otherwise(0L)).as("in_test"),
          max(when(!col("t"), 1L).otherwise(0L)).as("in_train"))
        .agg(Cols.countWhen(col("in_train") === 1L).as("train_users"),
          Cols.countWhen(col("in_test") === 1L).as("test_users"),
          Cols.countWhen(col("in_train") === 1L && col("in_test") === 1L)
            .as("straddling_users"))
        .select(lit(method).as("method"), col("train_users"), col("test_users"),
          col("straddling_users"))
    census("by_event", h("esplit:", col("event_id")) % den < num)
      .unionAll(census("by_user", h("usplit:", col("user_id")) % den < num))
      .orderBy(col("method"))
  }

  /** Covariate-shift audit of the user-keyed split: does the feature
    * distribution (event_type) differ between train and test? The 2×K
    * χ²-homogeneity statistic, reported per category so the drifting
    * feature value is named, not just flagged. Everything is integer
    * counts until the per-cell expected-value divides — the exact op
    * sequence mirrored in the oracle. A structurally-sound hash split
    * should land χ² near zero; a biased assignment (or a feature
    * correlated with the split key) shows up as a large per-category
    * contribution. Shape: one K-key aggregation plus a broadcast totals
    * frame — rides the scan. */
  def splitDriftAudit(events: DataFrame, num: Int = 1, den: Int = 5): DataFrame = {
    import graft.functions.Cols
    val isTest = Dedup.PortableHash(
      concat(lit("usplit:"), col("user_id").cast("string"))) % den < num
    val per = events.where(col("user_id").isNotNull && col("event_type").isNotNull)
      .select(col("event_type"), isTest.as("t")) // typed covariate only (r14)
      .groupBy(col("event_type"))
      .agg(Cols.countWhen(!col("t")).as("train_n"), Cols.countWhen(col("t")).as("test_n"))
    val totals = per.agg(sum(col("train_n")).as("tr_tot"), sum(col("test_n")).as("te_tot"))
    val n = col("tr_tot") + col("te_tot")
    val kTot = col("train_n") + col("test_n")
    val eTr = (kTot * col("tr_tot")).cast("double") / n.cast("double")
    val eTe = (kTot * col("te_tot")).cast("double") / n.cast("double")
    val dTr = col("train_n").cast("double") - eTr
    val dTe = col("test_n").cast("double") - eTe
    per.crossJoin(broadcast(totals))
      .select(col("event_type"), col("train_n"), col("test_n"),
        Cols.pct4(col("train_n"), col("tr_tot")).as("train_share_pct"),
        Cols.pct4(col("test_n"), col("te_tot")).as("test_share_pct"),
        when(col("tr_tot") > 0 && col("te_tot") > 0,
          Cols.q4(dTr * dTr / eTr + dTe * dTe / eTe)).otherwise(0.0).as("chi2"))
      .orderBy(col("event_type"))
  }

  /** Split × source census — the contamination-audit view of a split. */
  def splitProfile(docs: DataFrame, trainNum: Int = 8, valNum: Int = 1,
                   den: Int = 10): DataFrame =
    withSplit(docs, col("doc_id"), trainNum, valNum, den)
      .groupBy(col("split"), col("source"))
      .agg(count(lit(1)).as("docs"), sum(col("n_chars")).as("chars"))
      .orderBy(col("split"), col("source"))

  /** Split × class-label balance over a labeled corpus — the stratification
    * check run before training: does every split carry every label at
    * roughly the corpus share? The share is ratio-to-total WITHIN the split
    * (the A11 window shape, but over the bounded (split, label) aggregate —
    * |splits|·|labels| rows — never over the corpus). */
  def splitBalance(labeled: DataFrame, trainNum: Int = 8, valNum: Int = 1,
                   den: Int = 10): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("split"))
    withSplit(labeled, col("vec_id"), trainNum, valNum, den)
      .groupBy(col("split"), col("label").cast("long").as("label"))
      .agg(count(lit(1)).as("n_vecs"))
      .withColumn("split_share",
        graft.functions.Cols.pct4(col("n_vecs"), sum(col("n_vecs")).over(w)))
      .orderBy(col("split"), col("label"))
  }

  /** Per-source profile of the exactly-k quota sample. */
  def groupSampleProfile(docs: DataFrame, k: Int = 40): DataFrame =
    groupSample(docs, col("source"), col("doc_id"), k)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("sampled_docs"), sum(col("n_chars")).as("sampled_chars"))
      .orderBy(col("source"))

  /** Systematic weight-proportional sample of ~`k` rows: lay the rows out on
    * a line in `idCol` order, each occupying a segment of length = its
    * integer weight, and pick the rows whose segment crosses one of `k`
    * equally-spaced marks — P(selected) ≈ k·wᵢ/W, at most one selection per
    * row, spread evenly through the corpus (the classic systematic /
    * "wheel" sampler). Selection is `⌊cum·k/W⌋ > ⌊(cum−w)·k/W⌋` on the
    * inclusive cumulative weight — pure INTEGER arithmetic, so unlike
    * exponential-key weighted reservoirs (whose ln/pow order can flip in
    * the last ulp between engines) the sample is bit-reproducible anywhere.
    * Fits weight-aware corpus budgeting where [[weightedSample]]'s
    * independent Bernoulli draws would leave quota variance.
    *
    * Scale shape — a distributed prefix sum, NOT a global row window:
    *  1. rows bucket by `idCol div bucketSize`; per-bucket weight sums are
    *     one hash aggregation (|rows|/bucketSize rows out);
    *  2. bucket offsets = a running sum over that bounded bucket table
    *     (the only single-partition window, 4096× smaller than the data;
    *     recurse the same trick if even that outgrows a partition);
    *  3. offsets join back on the bucket id and an intra-bucket window
    *     (partitioned by bucket — parallel) finishes the cumulative sum.
    * Overflow headroom: cum·k must stay under 2^63 — at W = 10^14 chars
    * (≈100 TB of text) and k = 10^4, cum·k ≤ 10^18 < 9.2·10^18. */
  def systematicWeighted(df: DataFrame, idCol: Column, weightCol: Column,
                         k: Int, bucketBits: Int = 12): DataFrame = {
    require(k > 0 && bucketBits > 0 && bucketBits < 63)
    // bucket = id >> bucketBits (2^bucketBits ids per bucket): an integer
    // bit shift, never a float division that could mis-bucket ids > 2^53
    val w = df.withColumn("__w", weightCol.cast("long"))
      .withColumn("__b", shiftright(idCol.cast("long"), bucketBits))
    val bucketSums = w.groupBy(col("__b")).agg(sum(col("__w")).as("__bw"))
    val bw = org.apache.spark.sql.expressions.Window.orderBy(col("__b"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val offsets = bucketSums
      .withColumn("__off", coalesce(sum(col("__bw")).over(bw), lit(0L)))
      .select(col("__b"), col("__off"))
    val iw = org.apache.spark.sql.expressions.Window.partitionBy(col("__b"))
      .orderBy(idCol)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val total = w.agg(sum(col("__w")).as("__tw"))
    w.join(offsets, "__b")
      .withColumn("__cum", col("__off") + sum(col("__w")).over(iw))
      .crossJoin(broadcast(total))
      .where(expr(s"(__cum * ${k}L) div __tw > ((__cum - __w) * ${k}L) div __tw"))
      .drop("__b", "__w", "__off", "__cum", "__tw")
  }

  /** Per-source profile of the ~k systematic weight-proportional sample
    * (weight = document length): the quota report after even-coverage
    * budgeting. */
  def systematicSampleProfile(docs: DataFrame, k: Int = 100): DataFrame =
    systematicWeighted(docs, col("doc_id"), col("n_chars"), k)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("sampled_docs"), sum(col("n_chars")).as("sampled_chars"))
      .orderBy(col("source"))

  /** Neyman-optimal stratified sample allocation (Neyman 1934): the
    * per-stratum share of a fixed sample budget proportional to N_h·σ_h —
    * variable strata earn more of the budget than uniform or
    * size-proportional allocation would give them, minimizing the
    * stratified estimator's variance. The integerization is the same
    * largest-remainder (Hamilton) rule as
    * [[CorpusFilters.tokenApportionment]], so quotas sum EXACTLY to the
    * budget.
    *
    * Exactness: per-stratum moments are exact integer dollars; the
    * variance numerator N·Σy² − (Σy)² runs in DECIMAL(38,0)/HUGEINT lanes
    * (int64 overflows at fixture scale already); σ is one IEEE sqrt; the
    * weight floors to integer N·σ units before the exact integer
    * apportionment. Bounded |strata| frame throughout — the corpus pays
    * one hash aggregation. */
  def neymanAllocation(orders: DataFrame, budget: Long = 1000L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.types.DecimalType
    import graft.functions.Cols
    val dec = DecimalType(38, 0)
    val m = orders.select(col("o_orderpriority").as("stratum"),
        expr("CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) div 100").as("y"))
      .groupBy(col("stratum"))
      .agg(count(lit(1)).as("n"), sum(col("y")).as("sy"),
        sum(col("y") * col("y")).as("syy"))
    val vnum = (col("n").cast(dec) * col("syy").cast(dec)
      - col("sy").cast(dec) * col("sy").cast(dec)).cast("double")
    val den = (col("n").cast(dec) * (col("n") - 1L).cast(dec)).cast("double")
    val sigma = when(col("n") > 1 && vnum > 0, sqrt(vnum / den)).otherwise(lit(0.0))
    val weighted = m.select(col("stratum"), col("n"), sigma.as("sigma"),
      floor(col("n").cast("double") * sigma).cast("long").as("wq"))
    val tot = Window.partitionBy()
    val wr = Window.orderBy(col("rem").desc, col("stratum").asc)
    weighted
      .withColumn("wt", sum(col("wq")).over(tot))
      .select(col("stratum"), col("n"), col("sigma"),
        expr(s"(${budget}L * wq) div wt").as("floor_quota"),
        pmod(lit(budget) * col("wq"), col("wt")).as("rem"))
      .withColumn("leftover", lit(budget) - sum(col("floor_quota")).over(tot))
      .withColumn("extra_rank", row_number().over(wr).cast("long"))
      .select(col("stratum"), col("n").as("stratum_n"),
        Cols.q4(col("sigma")).as("sigma"),
        (col("floor_quota")
          + when(col("extra_rank") <= col("leftover"), 1L).otherwise(0L)).as("quota"))
      .orderBy(col("stratum"))
  }

  /** Class-balanced downsample of the labeled embedding corpus: every
    * label keeps exactly the MINORITY class's count, selected by the
    * [[groupSample]] salted-hash rank (deterministic shuffle — same data,
    * same sample, any engine/partitioning). The classifier-training
    * preprocessing step that stops the majority class from dominating the
    * loss. The quota is data-dependent (min over per-label counts), so it
    * rides in as a broadcast 1-row frame rather than a literal.
    *
    * Output is the census (per label: kept count and the exact id-sum
    * checksum), which pins MEMBERSHIP, not just size, cross-engine.
    *
    * Shape: one bounded count agg, one hash-partitioned window per label,
    * no global structure. */
  def balancedSample(embeddings: DataFrame): DataFrame = {
    val counts = embeddings.groupBy(col("label")).agg(count(lit(1)).as("n"))
    val quota = broadcast(counts.agg(min(col("n")).as("k")))
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("label"))
      .orderBy(Dedup.PortableHash(concat(lit("bal:"), col("vec_id").cast("string"))).asc,
        col("vec_id").asc)
    embeddings.select(col("label").cast("long").as("label"), col("vec_id"))
      .crossJoin(quota)
      .withColumn("__rn", row_number().over(w))
      .where(col("__rn") <= col("k"))
      .groupBy(col("label"))
      .agg(count(lit(1)).as("sampled"), sum(col("vec_id")).as("id_checksum"))
      .orderBy(col("label"))
  }
}
