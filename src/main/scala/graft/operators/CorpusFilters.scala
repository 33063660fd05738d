package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.Cols

/** Corpus-curation operators — the filtering stages of a training-data
  * pipeline that sit between raw ingest and dedup/training: repetition
  * (boilerplate) scoring, benchmark-contamination detection, stratified
  * sampling, and the composite keep/drop quality gate. (Repetition and
  * contamination rules follow the published curation recipes of
  * Gopher/RefinedWeb-style pipelines; everything here is exact integer /
  * quantized-double arithmetic so results are engine-portable.)
  *
  * Scale shapes: repetition is the word-count pattern (explode → two
  * map-side-combined aggregations, one shuffle key = (doc, shingle) then
  * doc); contamination is a semi-join against the benchmark n-gram set
  * (small benchmark → Spark broadcasts it; a corpus-sized right side
  * degrades gracefully to a bucketed shuffle join); sampling is a pure
  * per-row filter with no shuffle at all.
  */
object CorpusFilters {

  // ------------------------------------------------------------ repetition

  /** Per-document n-gram repetition statistics: total / distinct 3-gram
    * counts, duplicate-fraction (1 − distinct/total) and the most-repeated
    * single 3-gram's share — the Gopher-style "repetitive document" signal.
    * Two aggregations, both map-side combinable; nothing is quadratic in
    * document length. */
  def repetitionStats(docs: DataFrame): DataFrame = {
    val perShingle = Dedup.shingleRows(docs)
      .groupBy(col("doc_id"), col("shingle")).agg(count(lit(1)).as("c"))
    perShingle.groupBy(col("doc_id"))
      .agg(sum(col("c")).as("n_shingles"),
        count(lit(1)).as("distinct_shingles"),
        max(col("c")).as("maxc"))
      .select(col("doc_id"),
        col("n_shingles").cast("long").as("n_shingles"),
        col("distinct_shingles").cast("long").as("distinct_shingles"),
        Cols.asDec4(lit(1.0) - col("distinct_shingles").cast("double")
          / col("n_shingles").cast("double")).as("dup_ngram_frac"),
        Cols.asDec4(col("maxc").cast("double") / col("n_shingles").cast("double"))
          .as("top_ngram_frac"))
  }

  /** Duplicate-span census — the exact-substring-dedup signal (the
    * "dedup training data by removing repeated ≥ w-token substrings"
    * recipe of the published suffix-array approach): a duplicated span of
    * ≥ w tokens exists iff some w-token WINDOW is duplicated, so counting
    * duplicated windows is an exact detector for fixed w. Reports, per
    * source: window totals, windows whose text occurs more than once in
    * the corpus (within- OR cross-document — both are training-data
    * duplication), windows shared across ≥ 2 distinct documents, and the
    * duplicated fraction.
    *
    * Spans are keyed by md5 of the window text (128 bits: collision-safe
    * in practice, engine-portable, and it shrinks the shuffle key from
    * ~w·6 bytes of text to 32 hex chars — at 100 TB this grouping is the
    * same single-shuffle word-count shape as any n-gram pass). SKEW
    * safety, same doctrine as [[boilerplateBySource]]: a span duplicated
    * across a huge document population is the object of study, so the
    * per-span stats join runs at (span, source) granularity — a hot span
    * is ≤ |sources| rows by the time any join touches it, every
    * aggregation below is map-side combinable, and the per-source sums
    * follow by linearity. */
  def duplicateSpanProfile(docs: DataFrame, w: Int = 50): DataFrame = {
    // source rides the span scan (functional on doc_id — no join onto the
    // exploded table); the (span, doc) grouping keeps within-doc repeat
    // counts, then collapses to one row per (span, source) — referenced by
    // the global stats AND the final rollup, so materialize it once
    val perDocSpan = Dedup.shingleRows(docs, w, keep = Seq("source"))
      .select(col("doc_id"), col("source"), md5(col("shingle")).as("fp"))
      .groupBy(col("fp"), col("doc_id"), col("source")).agg(count(lit(1)).as("c"))
    // after the collapse the per-span stats are windows keyed on fp, safe
    // because the hottest span is ≤ |sources| rows — one linear chain
    val fpw = org.apache.spark.sql.expressions.Window.partitionBy(col("fp"))
    val perSpanSrc = perDocSpan.groupBy(col("fp"), col("source"))
      .agg(sum(col("c")).as("c"), count(lit(1)).as("d"))
      .withColumn("occs", sum(col("c")).over(fpw))
      .withColumn("docs_with", sum(col("d")).over(fpw))
    val docsBySource = docs.groupBy(col("source")).agg(count(lit(1)).as("docs"))
    perSpanSrc
      .groupBy(col("source"))
      .agg(sum(col("c")).cast("long").as("spans"),
        sum(when(col("occs") > 1, col("c")).otherwise(0L)).cast("long").as("dup_spans"),
        sum(when(col("docs_with") > 1, col("c")).otherwise(0L)).cast("long")
          .as("cross_dup_spans"))
      .join(docsBySource, Seq("source"))
      .select(col("source"), col("docs"), col("spans"), col("dup_spans"),
        col("cross_dup_spans"),
        Cols.asDec4(col("dup_spans").cast("double") / col("spans").cast("double"))
          .as("dup_frac"))
      .orderBy(col("source"))
  }

  /** Cross-document boilerplate score — the complement of
    * [[repetitionStats]] (which sees repetition only WITHIN a doc): the
    * mean corpus-wide document frequency of each doc's distinct 3-grams.
    * Navigation chrome, license headers, and template text score high
    * (their shingles recur across many documents); original prose scores
    * ≈ 1. Reported per source: the curation signal for "which feeds are
    * template farms" that decides whole-source filtering before any
    * per-pair dedup runs.
    *
    * Shape — chosen for SKEW safety: the defining property of boilerplate
    * is a shingle occurring in a huge fraction of documents, so any
    * per-occurrence operator keyed on the shingle (a count window, an
    * unreduced join) would funnel a hot shingle's every row through one
    * task. Instead the distinct (doc, shingle) pass collapses to ONE row
    * per (shingle, source) via a map-side-combined count — the hottest
    * possible shingle is ≤ |sources| rows after that — and the corpus df
    * is a second combined aggregation joined back at (shingle, source)
    * granularity. Per-source sums then follow by linearity:
    * Σ_(doc,sh) df(sh) = Σ_(sh,src) c(sh,src)·df(sh). Exact long sums,
    * one floor-quantized division at the edge. */
  def boilerplateBySource(docs: DataFrame): DataFrame = {
    // source rides the shingle scan itself (functional on doc_id, so the
    // distinct keeps its cardinality) — joining it onto the exploded table
    // was measured ~3× slower. After the collapse the df window keyed on
    // the shingle is safe BECAUSE of the collapse: the hottest shingle is
    // ≤ |sources| rows, so the un-combinable window never sees a hot key,
    // and the whole operator is one linear chain — no join-back, no
    // rematerialization.
    val perShSrc = Dedup.shingleRows(docs, keep = Seq("source"))
      .distinct()
      .groupBy(col("shingle"), col("source")).agg(count(lit(1)).as("c"))
      .withColumn("df", sum(col("c")).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("shingle"))))
    val docsBySource = docs.groupBy(col("source")).agg(count(lit(1)).as("docs"))
    perShSrc
      .groupBy(col("source"))
      .agg(sum(col("c") * col("df")).cast("long").as("shingle_doc_hits"),
        sum(col("c")).cast("long").as("distinct_shingles"))
      .join(docsBySource, Seq("source"))
      .select(col("source"), col("docs"), col("shingle_doc_hits"),
        col("distinct_shingles"),
        Cols.asDec4(col("shingle_doc_hits").cast("double")
          / col("distinct_shingles").cast("double")).as("mean_shingle_df"))
      .orderBy(col("source"))
  }

  // ------------------------------------------------------ span remediation

  /** Per-occurrence w-token windows with offsets: (doc_id, source, n, i, e,
    * fp) where i is the 1-based start-token position, e = min(i + w − 1, n)
    * the last covered position, and fp = md5 of the window text (the same
    * key as [[duplicateSpanProfile]], so remediation acts on exactly what
    * the census detects). Docs shorter than w contribute one whole-text
    * window covering [1, n]. The window TEXT dies in this projection — only
    * the 128-bit key and integer bounds enter the materialized occurrence
    * table, which both the duplicate-stats aggregation and the removal
    * join read (one md5 pass, not two). */
  private def spanOccurrences(docs: DataFrame, w: Int): DataFrame =
    docs.select(col("doc_id"), col("source"), split(col("text"), " ").as("toks"))
      .select(col("doc_id"), col("source"), size(col("toks")).as("n"), col("toks"))
      .select(col("doc_id"), col("source"), col("n"),
        posexplode(
          when(col("n") < w, array(concat_ws(" ", col("toks"))))
            .otherwise(transform(sequence(lit(1), col("n") - (w - 1)),
              i => concat_ws(" ", slice(col("toks"), i, lit(w))))))
          .as(Seq("pos", "span")))
      .select(col("doc_id"), col("source"), col("n"),
        (col("pos") + 1).as("i"),
        least(col("pos") + w, col("n")).as("e"),
        md5(col("span")).as("fp"))
      .localCheckpoint()

  /** Merged per-doc removal intervals for ≥w-token span dedup: every window
    * whose text occurs more than once corpus-wide is dropped EXCEPT the
    * globally first occurrence in deterministic (doc_id, offset) order;
    * overlapping/touching removal ranges merge per doc (classic
    * gaps-and-islands over a per-doc window). Returns one row per
    * (doc_id, source, island): [s, e] disjoint 1-based token bounds plus
    * `wins`, the number of dropped window occurrences the island absorbed.
    *
    * Skew: the keeper stats are a map-side-combinable groupBy(fp) (count +
    * lexicographic min(struct(doc_id, i))); the removal join is then
    * occurrences ⋈ one-row-per-fp — a hot boilerplate span makes the LEFT
    * side hot, which AQE's skew-join split handles by replicating the
    * single stats row (per-occurrence output is irreducible here: each
    * dropped occurrence IS a removal range). The island windows partition
    * by doc_id, bounded by document length. */
  private def droppedIntervals(docs: DataFrame, w: Int): DataFrame = {
    val occ = spanOccurrences(docs, w)
    val firsts = occ.groupBy(col("fp"))
      .agg(count(lit(1)).as("c"), min(struct(col("doc_id"), col("i"))).as("first"))
      .where(col("c") > 1)
      .select(col("fp"), col("first.doc_id").as("d0"), col("first.i").as("i0"))
    val dropped = occ.join(firsts, Seq("fp"))
      .where(!(col("doc_id") === col("d0") && col("i") === col("i0")))
      .select(col("doc_id"), col("source"), col("i"), col("e"))
    val byDoc = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("i"))
    val prevMax = max(col("e")).over(byDoc.rowsBetween(
      org.apache.spark.sql.expressions.Window.unboundedPreceding, -1))
    dropped
      .withColumn("brk", when(prevMax.isNull || col("i") > prevMax, 1L).otherwise(0L))
      .withColumn("g", sum(col("brk")).over(byDoc.rowsBetween(
        org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
      .groupBy(col("doc_id"), col("source"), col("g"))
      .agg(min(col("i")).as("s"), max(col("e")).as("e"), count(lit(1)).as("wins"))
  }

  /** The ACTION step of the suffix-array dedup recipe whose detector is
    * [[duplicateSpanProfile]]: emit the corpus with duplicated ≥w-token
    * spans REMOVED — every token covered by a dropped window occurrence is
    * deleted; the globally first occurrence (by (doc_id, offset)) keeps its
    * text, so exactly one copy of every duplicated span survives. Returns
    * (doc_id, source, text) with surviving tokens re-joined by single
    * spaces. Token membership is evaluated per doc against its few merged
    * intervals (a higher-order filter over the token array — no second
    * explode). */
  def spanDedupDocs(docs: DataFrame, w: Int = 50): DataFrame = {
    val iv = droppedIntervals(docs, w)
      .groupBy(col("doc_id"))
      .agg(collect_list(struct(col("s"), col("e"))).as("iv"))
    val toks = split(col("text"), " ")
    val kept = filter(toks, (t, idx) => !coalesce(
      exists(col("iv"), v =>
        idx + 1 >= v.getField("s") && idx + 1 <= v.getField("e")),
      lit(false)))
    docs.join(iv, Seq("doc_id"), "left")
      .select(col("doc_id"), col("source"), concat_ws(" ", kept).as("text"))
  }

  /** Per-source accounting of span-dedup remediation, with the conservation
    * invariant built into the differential check: `kept_tokens` is
    * RECOUNTED from the actual remediated token arrays (the same
    * higher-order filter [[spanDedupDocs]] ships), while the SQL oracle
    * derives it as total − dropped — so oracle hash-equality proves
    * total_tokens = kept_tokens + dropped_tokens over the real removal,
    * not over bookkeeping that merely mirrors it. `dup_windows` counts the
    * dropped window occurrences (the census's duplicate mass minus the one
    * kept copy per span text). */
  def spanDedupProfile(docs: DataFrame, w: Int = 50): DataFrame = {
    val perDoc = droppedIntervals(docs, w)
      .groupBy(col("doc_id"))
      .agg(collect_list(struct(col("s"), col("e"))).as("iv"),
        sum(col("e") - col("s") + 1).cast("long").as("dropped_toks"),
        sum(col("wins")).cast("long").as("dup_windows"))
    val toks = split(col("text"), " ")
    val keptN = size(filter(toks, (t, idx) => !coalesce(
      exists(col("iv"), v =>
        idx + 1 >= v.getField("s") && idx + 1 <= v.getField("e")),
      lit(false))))
    docs.join(perDoc, Seq("doc_id"), "left")
      .select(col("source"), size(toks).as("n"), keptN.as("kept_n"),
        coalesce(col("dropped_toks"), lit(0L)).as("dropped_toks"),
        coalesce(col("dup_windows"), lit(0L)).as("dup_windows"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("docs"),
        sum(col("n")).cast("long").as("total_tokens"),
        sum(col("kept_n")).cast("long").as("kept_tokens"),
        sum(col("dropped_toks")).cast("long").as("dropped_tokens"),
        sum(col("dup_windows")).cast("long").as("dup_windows"))
      .select(col("source"), col("docs"), col("total_tokens"), col("kept_tokens"),
        col("dropped_tokens"), col("dup_windows"),
        Cols.asDec4(col("kept_tokens").cast("double")
          / col("total_tokens").cast("double")).as("kept_frac"))
      .orderBy(col("source"))
  }

  // --------------------------------------------------------- contamination

  /** Benchmark-contamination check: which training documents share at least
    * `minShared` distinct 3-grams with a held-out "benchmark" set? The
    * benchmark here is a deterministic 1/`den` hash-sample of the corpus
    * itself (so the check is self-contained and oracle-reproducible); in
    * production the benchmark table is the external eval set. Returns the
    * per-source contamination profile.
    *
    * Shape: benchmark n-grams are DISTINCT'd before the join — the join key
    * set scales with the benchmark, not the corpus, which is why real
    * contamination checks broadcast it. */
  def contaminationProfile(docs: DataFrame, den: Int = 20, minShared: Int = 5): DataFrame =
    contaminationChecked(docs, den)
      .select(col("source"),
        when(col("shared_grams") >= minShared, 1L).otherwise(0L).as("contaminated"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("docs_checked"),
        sum(col("contaminated")).as("contaminated_docs"))
      .select(col("source"), col("docs_checked"), col("contaminated_docs"),
        Cols.pct4(col("contaminated_docs").cast("double"), col("docs_checked").cast("double"))
          .as("contamination_rate"))
      .orderBy(col("source"))

  /** The candidate corpus (benchmark slice excluded) with each doc's
    * benchmark-shared n-gram count — the frame both the contamination
    * census and its remediation consume. */
  private def contaminationChecked(docs: DataFrame, den: Int): DataFrame = {
    val isBench = Dedup.PortableHash(concat(lit("bench:"), col("doc_id").cast("string")))
      .%(den) < 1
    val benchGrams = Dedup.shingleRows(docs.where(isBench))
      .select(col("shingle")).distinct()
    val candGrams = Dedup.shingleRows(docs.where(!isBench)).distinct()
    val shared = candGrams.join(benchGrams, Seq("shingle"))
      .groupBy(col("doc_id")).agg(count(lit(1)).as("sg"))
    docs.where(!isBench)
      .join(shared, Seq("doc_id"), "left")
      .withColumn("shared_grams", coalesce(col("sg"), lit(0L)))
      .drop("sg")
  }

  /** Fuzzy (near-duplicate) benchmark decontamination — the companion of
    * [[contaminationProfile]]'s exact shared-n-gram rule, for the
    * paraphrase/formatting-drift leaks exact n-gram matching misses (the
    * fuzzy step of published LM curation recipes: Brown et al. 2020
    * appendix C's overlap filtering; Lee et al. 2022's near-dup doctrine).
    *
    * Same deterministic benchmark split as the exact check
    * (md5₄₈("bench:"‖doc_id) % den < 1). Candidates come from a BIPARTITE
    * banded-MinHash equi-join — benchmark band keys against candidate band
    * keys, never a self-join over the union, so the join output is bounded
    * by the benchmark's bucket occupancy. Every candidate pair is verified
    * with the exact shingle-set Jaccard, and a training doc is flagged iff
    * ANY benchmark doc reaches `threshold`. One shingle pass feeds both
    * signatures and verification (the [[Dedup.nearDupVerifiedPairs]]
    * staging doctrine).
    *
    * At 100 TB: real benchmark sets are small and fixed — their banded
    * keys broadcast, making candidate generation a map-side probe of the
    * corpus band stream; verification stays candidate-only; the census is
    * one aggregation with a distinct-collapsed flag join. */
  def fuzzyDecontaminationProfile(docs: DataFrame, den: Int = 20,
                                  threshold: Double = 0.5): DataFrame = {
    val isBench = Dedup.PortableHash(concat(lit("bench:"),
      col("doc_id").cast("string"))) % den < 1
    val sh = Dedup.shingleRows(docs).localCheckpoint()
    val sigs = Dedup.signaturesOnShingles(sh, Dedup.PortableHash)
    val benchIds = docs.where(isBench).select(col("doc_id"))
    val banded = Dedup.bandRows(sigs).localCheckpoint()
    val benchBands = banded.join(benchIds, Seq("doc_id"))
      .select(col("band"), col("band_hash"), col("doc_id").as("bench_id"))
    val candBands = banded.join(benchIds, Seq("doc_id"), "left_anti")
      .select(col("band"), col("band_hash"), col("doc_id").as("cand_id"))
    val pairs = candBands.join(benchBands, Seq("band", "band_hash"))
      .select(col("cand_id").as("doc_a"), col("bench_id").as("doc_b"))
      .distinct()
    val flagged = Dedup.verifyJaccardOnShingles(sh, pairs)
      .where(col("jaccard") >= threshold)
      .select(col("doc_a").as("doc_id")).distinct()
      .withColumn("__flag", lit(1L))
    docs.where(!isBench)
      .join(flagged, Seq("doc_id"), "left")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("docs_checked"),
        Cols.countWhen(col("__flag").isNotNull).as("flagged_docs"),
        Cols.countWhen(col("__flag").isNull).as("kept_docs"))
      .select(col("source"), col("docs_checked"), col("flagged_docs"),
        col("kept_docs"),
        Cols.pct4(col("flagged_docs"), col("docs_checked")).as("flagged_pct"))
      .orderBy(col("source"))
  }

  /** The contamination census's ACTION step: the corpus that survives
    * decontamination — benchmark docs held out, candidate docs with
    * ≥ `minShared` benchmark-shared 3-grams dropped. Per-source profile of
    * what remains (docs, characters, and the drop count so censuses
    * reconcile: checked = kept + dropped). Same semi-join shape as the
    * census; the action is one more filter on the frame it already built. */
  def decontaminatedProfile(docs: DataFrame, den: Int = 20, minShared: Int = 5): DataFrame =
    contaminationChecked(docs, den)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("docs_checked"),
        Cols.countWhen(col("shared_grams") < minShared).as("kept_docs"),
        sum(when(col("shared_grams") < minShared, col("n_chars")).otherwise(0L))
          .as("kept_chars"),
        Cols.countWhen(col("shared_grams") >= minShared).as("dropped_docs"))
      .orderBy(col("source"))

  // ---------------------------------------------------- stratified sampling

  /** Stratified deterministic sample: each source stratum gets its own
    * rate num/`den` with num = 1 + md5₄₈(source) mod 3 — a stand-in for the
    * per-domain quota table a curation pipeline carries. Membership stays a
    * pure function of (doc_id, source), so the stratified sample is
    * reproducible anywhere; the whole operator is one filter + one
    * aggregation. */
  def stratifiedSampleProfile(docs: DataFrame, den: Int = 10): DataFrame = {
    val rateNum = (Dedup.PortableHash(col("source")) % 3 + 1).cast("long")
    val member  = Dedup.PortableHash(concat(lit("strat:"), col("doc_id").cast("string")))
      .%(den) < rateNum
    docs.select(col("source"), rateNum.as("rate_num"),
        when(member, 1L).otherwise(0L).as("m"))
      .groupBy(col("source"), col("rate_num"))
      .agg(count(lit(1)).as("total_docs"), sum(col("m")).as("sampled_docs"))
      .select(col("source"), col("rate_num"), col("total_docs"), col("sampled_docs"),
        Cols.pct4(col("sampled_docs").cast("double"), col("total_docs").cast("double"))
          .as("realized_rate"))
      .orderBy(col("source"))
  }

  // ---------------------------------------------------------- token packing

  /** Largest-remainder (Hamilton) apportionment of a global token budget
    * across sources — the exact-integer answer to "source i gets
    * budget·wᵢ/W tokens" when fractional quotas must land as integers
    * that SUM EXACTLY to the budget (naive per-source rounding over- or
    * under-shoots; the classic apportionment fix assigns the floor quotas
    * first, then one extra unit each to the sources with the largest
    * remainders). All integer arithmetic: quota = (budget·wᵢ) div W,
    * remainder = (budget·wᵢ) mod W, extras ranked by (remainder desc,
    * source asc) — bit-identical in any engine.
    *
    * Shape: one token-count aggregation over the corpus, then everything
    * runs on the bounded per-source frame (|sources| rows — the windows
    * here never see the corpus). `budget·wᵢ` stays far inside 2⁶³ for any
    * real budget×corpus pairing at these lanes (both ≤ ~2⁴⁰); widen to
    * DECIMAL(38,0) lanes if ever apportioning >2⁶³ token-products. */
  def tokenApportionment(docs: DataFrame, budget: Long = 100000L): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("rem").desc, col("source").asc)
    val tot = org.apache.spark.sql.expressions.Window.partitionBy()
    val bySource = docs
      .select(col("source"), size(TextAnalysis.tokens(col("text"))).cast("long").as("t"))
      .groupBy(col("source")).agg(sum(col("t")).as("tokens"))
    bySource
      .withColumn("w_total", sum(col("tokens")).over(tot))
      .select(col("source"), col("tokens"),
        expr(s"(${budget}L * tokens) div w_total").as("floor_quota"),
        pmod(lit(budget) * col("tokens"), col("w_total")).as("rem"))
      .withColumn("leftover", lit(budget) - sum(col("floor_quota")).over(tot))
      .withColumn("extra_rank", row_number().over(w).cast("long"))
      .select(col("source"), col("tokens"), col("floor_quota"),
        (col("floor_quota")
          + when(col("extra_rank") <= col("leftover"), 1L).otherwise(0L)).as("quota"))
      .orderBy(col("source"))
  }

  /** Sequence-packing plan: assign documents to fixed-token-budget training
    * bins, greedily in deterministic (source, doc_id) order — each doc's bin
    * is the budget-quotient of its START offset in the stratum's running
    * token count (docs may straddle a boundary; the packer downstream
    * handles the split). One window per source stratum — the sort is
    * per-partition, never global — then one aggregation.
    * Returns per (source, bin): packed docs and token sum. */
  def tokenPackingProfile(docs: DataFrame, budgetTokens: Int = 2000): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source")).orderBy(col("doc_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val nTok = size(TextAnalysis.tokens(col("text"))).cast("long")
    docs.select(col("source"), col("doc_id"), nTok.as("n_tokens"))
      .withColumn("cum", sum(col("n_tokens")).over(w))
      .select(col("source"), col("n_tokens"),
        floor((col("cum") - col("n_tokens")).cast("double") / budgetTokens)
          .cast("long").as("bin"))
      .groupBy(col("source"), col("bin"))
      .agg(count(lit(1)).as("docs"), sum(col("n_tokens")).as("tokens"))
      .orderBy(col("source"), col("bin"))
  }

  // -------------------------------------------------------- mixture weights

  /** Data-mixture reweighting: the per-source sampling weight that moves the
    * corpus toward a UNIFORM token share across sources (weight =
    * equal-share / actual-share) — the knob a pre-training mixture schedule
    * turns. Global totals ride a broadcast one-row aggregate; no global
    * sort, no single-partition window. */
  def mixtureWeights(docs: DataFrame): DataFrame = {
    val nTok = size(TextAnalysis.tokens(col("text"))).cast("long")
    val per = docs.select(col("source"), nTok.as("n"))
      .groupBy(col("source")).agg(sum(col("n")).as("source_tokens"))
    val global = per.agg(sum(col("source_tokens")).as("total_tokens"),
      count(lit(1)).as("n_sources"))
    per.crossJoin(broadcast(global))
      .select(col("source"), col("source_tokens"),
        Cols.pct4(col("source_tokens").cast("double"), col("total_tokens").cast("double"))
          .as("token_share"),
        Cols.asDec4(col("total_tokens").cast("double")
          / (col("n_sources") * col("source_tokens")).cast("double"))
          .as("mixture_weight"))
      .orderBy(col("source"))
  }

  /** Temperature-scaled mixture weights at τ = 2 (the multilingual
    * sampling rule of mBERT/XLM-R: sample source i with probability
    * ∝ shareᵢ^(1/τ) — up-weights tails without flattening to uniform the
    * way [[mixtureWeights]] does). τ = 2 is the one temperature whose
    * rescale is expressible under the no-pow doctrine: share^(1/2) IS the
    * IEEE-exact sqrt. The normalizer sums 1e12-quantized score units over
    * the bounded source frame; each output is one fixed expression. */
  def mixtureTemperature(docs: DataFrame): DataFrame = {
    val nTok = size(TextAnalysis.tokens(col("text"))).cast("long")
    val per = docs.select(col("source"), nTok.as("n"))
      .groupBy(col("source")).agg(sum(col("n")).as("source_tokens"))
    val global = per.agg(sum(col("source_tokens")).as("total_tokens"))
    val share = col("source_tokens").cast("double") /
      col("total_tokens").cast("double")
    val scored = per.crossJoin(broadcast(global))
      .select(col("source"), col("source_tokens"), share.as("share"),
        sqrt(share).as("s"))
    val norm = scored.agg(sum(floor(col("s") * 1e12).cast("long")).as("sq"))
    scored.crossJoin(broadcast(norm))
      .select(col("source"), col("source_tokens"),
        Cols.q4(col("share") * 100.0).as("token_share_pct"),
        Cols.q4(col("s") / (col("sq").cast("double") / 1e12) * 100.0)
          .as("sampled_share_pct"))
      .orderBy(col("source"))
  }

  // ----------------------------------------------------------- quality gate

  /** Composite keep/drop gate — the rule stack run once over the corpus
    * before expensive dedup/training stages: length band, type-token ratio,
    * stopword presence, and n-gram repetition, each a named reason so the
    * per-source profile shows WHY documents drop. Flags compare the same
    * 1e-4-quantized doubles the per-doc operators expose, so the gate is
    * exactly the composition of its published parts. */
  def qualityGateProfile(docs: DataFrame): DataFrame = {
    val perDoc = TextAnalysis.qualityScored(docs)
      .join(repetitionStats(docs).select(col("doc_id"), col("dup_ngram_frac")), Seq("doc_id"))
      .join(docs.select(col("doc_id"), col("n_chars")), Seq("doc_id"))
    val lenOk  = col("n_chars").between(100, 5000)
    val ttrOk  = col("type_token_ratio") >= 0.2
    val stopOk = col("stopword_ratio") >= 0.02
    val repOk  = col("dup_ngram_frac") <= 0.7
    perDoc
      .select(col("source"),
        when(lenOk && ttrOk && stopOk && repOk, 1L).otherwise(0L).as("kept"),
        when(!lenOk, 1L).otherwise(0L).as("len_drop"),
        when(!ttrOk, 1L).otherwise(0L).as("ttr_drop"),
        when(!stopOk, 1L).otherwise(0L).as("stopword_drop"),
        when(!repOk, 1L).otherwise(0L).as("repetition_drop"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("docs"), sum(col("kept")).as("kept"),
        sum(col("len_drop")).as("len_drop"), sum(col("ttr_drop")).as("ttr_drop"),
        sum(col("stopword_drop")).as("stopword_drop"),
        sum(col("repetition_drop")).as("repetition_drop"))
      .orderBy(col("source"))
  }

  /** End-to-end curation FUNNEL — the whole pipeline a pre-training corpus
    * runs, as one plan with a per-source census of where every document
    * went. Stages apply in the published order, each to the survivors of
    * the previous (the drop census is therefore first-failing-stage
    * attribution, and the row counts reconcile exactly):
    *
    *   1. quality gate (length band + TTR + stopword + repetition — the
    *      [[qualityGateProfile]] rule stack);
    *   2. exact dedup among gate survivors (keep lowest doc_id per
    *      md5(foldCase(text)) — [[Dedup.exactDeduped]]'s survivor rule);
    *   3. benchmark holdout (hash-designated eval split, held out rather
    *      than dropped) and contamination (≥ `minShared` 3-grams shared
    *      with the held-out set — [[decontaminatedProfile]]'s rule);
    *   4. deterministic 1/`sampleDen` budget sample ([[Sampling]] rule).
    *
    * Conservation invariant (asserted by spec and visible per source):
    * docs = drop_quality + drop_dup + held_out_bench + drop_contam +
    * drop_sample + kept.
    *
    * Scale shape: the flag derivation is the union of the member
    * operators' shapes (shingle explode + hash aggs, fingerprint agg +
    * broadcast-able keep list, bench-gram semi-join, scan-side sample
    * filter); the funnel itself adds ONE final hash agg per source — no
    * new shuffles over what the stages already cost. */
  def curationFunnel(docs: DataFrame, benchDen: Int = 20, minShared: Int = 5,
                     sampleNum: Int = 1, sampleDen: Int = 5): DataFrame = {
    val perDoc = TextAnalysis.qualityScored(docs)
      .join(repetitionStats(docs).select(col("doc_id"), col("dup_ngram_frac")),
        Seq("doc_id"))
      .join(docs.select(col("doc_id"), col("n_chars"),
        md5(Cols.foldCase(col("text"))).as("fp")), Seq("doc_id"))
    val qOk = col("n_chars").between(100, 5000) &&
      col("type_token_ratio") >= 0.2 && col("stopword_ratio") >= 0.02 &&
      col("dup_ngram_frac") <= 0.7
    val q = perDoc.withColumn("q_ok", qOk)
    val keep = q.where(col("q_ok"))
      .groupBy(col("fp")).agg(min(col("doc_id")).as("keep_id"))
    val d = q.join(keep, Seq("fp"), "left")
      .withColumn("dup_loser", col("q_ok") && col("doc_id") =!= col("keep_id"))
    val isBench = Dedup.PortableHash(
      concat(lit("bench:"), col("doc_id").cast("string"))) % benchDen < 1
    val e = d
      .withColumn("surv2", col("q_ok") && !col("dup_loser"))
      .withColumn("is_bench", col("surv2") && isBench)
    val benchDocs = e.where(col("is_bench")).select(col("doc_id"))
    val candDocs  = e.where(col("surv2") && !col("is_bench")).select(col("doc_id"))
    val benchGrams = Dedup.shingleRows(
        docs.join(benchDocs, Seq("doc_id"), "left_semi"))
      .select(col("shingle")).distinct()
    val candGrams = Dedup.shingleRows(
        docs.join(candDocs, Seq("doc_id"), "left_semi")).distinct()
    val shared = candGrams.join(benchGrams, Seq("shingle"))
      .groupBy(col("doc_id")).agg(count(lit(1)).as("sg"))
    val inSample = Dedup.PortableHash(
      concat(lit("sample:"), col("doc_id").cast("string"))) % sampleDen < sampleNum
    val g = e.join(shared, Seq("doc_id"), "left")
      .withColumn("contam",
        col("surv2") && !col("is_bench") && coalesce(col("sg"), lit(0L)) >= minShared)
      .withColumn("surv3", col("surv2") && !col("is_bench") && !col("contam"))
      .withColumn("kept", col("surv3") && inSample)
    g.groupBy(col("source"))
      .agg(
        count(lit(1)).as("docs"),
        Cols.countWhen(!col("q_ok")).as("drop_quality"),
        Cols.countWhen(col("dup_loser")).as("drop_dup"),
        Cols.countWhen(col("is_bench")).as("held_out_bench"),
        Cols.countWhen(col("contam")).as("drop_contam"),
        Cols.countWhen(col("surv3") && !col("kept")).as("drop_sample"),
        Cols.countWhen(col("kept")).as("kept"),
        sum(when(col("kept"), col("n_chars")).otherwise(0L)).as("kept_chars"))
      .orderBy(col("source"))
  }

  // ----------------------------------------------------------- token budget

  /** Global quality-ordered token-budget cut: keep documents in
    * (quality DESC, doc_id ASC) order while the EXCLUSIVE prefix sum of
    * their token counts stays under `num/den` of the corpus's total tokens —
    * "train on the best X% of token mass", the selection step every
    * budgeted pre-training run performs. The budget rule is pure integer
    * arithmetic (kept ⇔ prefix·den < total·num), so membership is exact and
    * engine-portable.
    *
    * Scale shape — the naive form is a GLOBAL ordered cumulative sum
    * (a total sort of the corpus: the classic scale killer). This runs it
    * in two bounded phases instead:
    *   1. aggregate token mass per quality bucket (`qual_u` is an integer
    *      in [0, 10000], so the bucket frame is ≤ 10001 rows — the only
    *      global window runs on THAT, not the corpus);
    *   2. buckets strictly inside / outside the budget classify their
    *      documents with a broadcast join and no per-doc ordering at all;
    *      only the ONE bucket straddling the boundary pays a per-doc
    *      prefix window, partitioned on its bucket key.
    * Equivalence to the naive rule: a doc's global exclusive prefix is
    * cum_before(bucket) + in_bucket_before(doc); for buckets with
    * (cum_before + b_tok)·den < total·num every such prefix is under
    * budget, for buckets with cum_before·den ≥ total·num none is, and the
    * boundary bucket evaluates the rule per doc verbatim. The boundary
    * window is the unavoidable exact step; if one quality value ever held
    * an unpartitionable share of the corpus, the same two-phase recursion
    * applies inside the bucket on doc_id ranges. */
  def tokenBudgetKept(docs: DataFrame, num: Int = 3, den: Int = 5): DataFrame = {
    require(num >= 0 && den > 0 && num <= den, "budget num/den must be in [0, 1]")
    val scored = TextAnalysis.budgetUnits(docs)
    val total = scored.agg(sum(col("n_tok")).as("tot"))
    val buckets = scored.groupBy(col("qual_u")).agg(sum(col("n_tok")).as("b_tok"))
    val wB = org.apache.spark.sql.expressions.Window
      .orderBy(col("qual_u").desc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val cum = buckets
      .withColumn("cum_before", coalesce(sum(col("b_tok")).over(wB), lit(0L)))
      .crossJoin(broadcast(total))
    val joined = scored.join(broadcast(cum), Seq("qual_u"))
    val budget = col("tot") * num
    // strict <: a bucket landing EXACTLY on the budget edge still routes
    // through the per-doc rule (a trailing zero-token doc there is dropped
    // by `prefix·den < budget`, which the bucket-level ≤ would keep)
    val fullyKept = joined.where((col("cum_before") + col("b_tok")) * den < budget)
    val boundary = joined.where(col("cum_before") * den < budget &&
      (col("cum_before") + col("b_tok")) * den >= budget)
    val wD = org.apache.spark.sql.expressions.Window
      .partitionBy(col("qual_u")).orderBy(col("doc_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val boundaryKept = boundary
      .withColumn("in_before", coalesce(sum(col("n_tok")).over(wD), lit(0L)))
      .where((col("cum_before") + col("in_before")) * den < budget)
      .drop("in_before")
    fullyKept.unionByName(boundaryKept)
      .select(col("doc_id"), col("source"), col("qual_u"), col("n_tok"))
  }

  /** Per-source census of the token-budget cut: corpus totals vs what the
    * budget keeps, plus the kept token fraction — the view a budget
    * dashboard reads to see which sources the quality ordering favors. */
  def tokenBudgetProfile(docs: DataFrame, num: Int = 3, den: Int = 5): DataFrame = {
    val scored = TextAnalysis.budgetUnits(docs)
    val tot = scored.groupBy(col("source"))
      .agg(count(lit(1)).as("docs"), sum(col("n_tok")).as("tokens"))
    val kept = tokenBudgetKept(docs, num, den).groupBy(col("source"))
      .agg(count(lit(1)).as("kept_docs"), sum(col("n_tok")).as("kept_tokens"))
    tot.join(kept, Seq("source"), "left")
      .select(col("source"), col("docs"), col("tokens"),
        coalesce(col("kept_docs"), lit(0L)).as("kept_docs"),
        coalesce(col("kept_tokens"), lit(0L)).as("kept_tokens"),
        when(col("tokens") > 0, Cols.q4(
          coalesce(col("kept_tokens"), lit(0L)).cast("double") / col("tokens").cast("double")))
          .otherwise(lit(0.0)).as("kept_token_frac"))
      .orderBy(col("source"))
  }

  /** Code-vs-prose census per source: a document is flagged as code-like
    * when its code-symbol density ({ } ; = < > ( )) clears 2% of its
    * characters — the cheap structural screen an LLM corpus runs before
    * routing documents to a code-specific pipeline (language-ID only
    * separates natural languages; code is orthogonal). The symbol count
    * is `length(text) − length(translate(text, symbols, ''))` — one
    * codegen'd scan-side expression, exact integers, no regex engine in
    * the hot path, identical semantics on any engine with Postgres-style
    * `translate`. */
  def codeProseCensus(docs: DataFrame): DataFrame = {
    val sym = length(col("text")) -
      length(translate(col("text"), "{};=<>()", ""))
    docs.select(col("source"), col("n_chars"), sym.as("symbols"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("docs"),
        Cols.countWhen(col("symbols") * 100L >= greatest(col("n_chars"), lit(1L)) * 2L)
          .as("code_docs"),
        sum(col("symbols")).as("symbol_chars"), sum(col("n_chars")).as("chars"))
      .select(col("source"), col("docs"), col("code_docs"),
        Cols.pct4(col("code_docs"), col("docs")).as("code_pct"),
        Cols.pct4(col("symbol_chars"), col("chars")).as("symbol_density_pct"))
      .orderBy(col("source"))
  }

}
