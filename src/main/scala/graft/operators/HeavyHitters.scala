package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.plans.FrequentItemsAggregate

/** Heavy-hitter detection: sketch → exact-verify, the traffic-census shape
  * for high-cardinality keys at 100 TB.
  *
  * Stage 1 runs one Misra–Gries aggregation over the key stream — map-side
  * combine ships ≤ capacity counters per partition, NO per-key shuffle —
  * yielding a tiny candidate superset (guaranteed to contain every key
  * above the n/(capacity+1) threshold). Stage 2 broadcasts the candidates,
  * recounts ONLY them exactly (the groupBy shuffles ≤ capacity distinct
  * keys), and applies the threshold. The final answer is therefore exactly
  * `GROUP BY key HAVING count > n/(capacity+1)` — the sketch is invisible,
  * like the Bloom prefilter — while the full-cardinality exchange of the
  * naive plan never happens.
  */
object HeavyHitters {

  /** KMV (k-minimum-values) distinct-count sketch (Bar-Yossef et al. 2002;
    * Beyer et al. 2007's unbiased (k−1)/θ estimator): keep the k smallest
    * 48-bit portable hashes of the key per group; the k-th smallest order
    * statistic h₍ₖ₎ estimates the distinct count as (k−1)·2⁴⁸ div h₍ₖ₎ —
    * pure integer arithmetic on an exactly-determined value. That makes
    * KMV THE portable distinct sketch: unlike HLL, whose register layout
    * differs per implementation (A5 ships with an error-bound test, not a
    * hash check), the sketch value AND the estimate are oracle-checkable
    * bit-for-bit.
    *
    * Plan: distinct (group, hash) collapse (one map-side-combined
    * shuffle), then the bounded [[graft.plans.TopKAggregate]] heap on
    * negated hashes — each partition ships ≤ k pairs (the KMV merge
    * property: the union of KMV sketches is the KMV of the union, exactly
    * the partial-merge contract of the aggregate). Groups under k distinct
    * keys report exactly; `exact_distinct` counts distinct hashes (a 48-bit
    * collision would undercount by one — negligible and deterministic).
    * Null keys are excluded BEFORE sketching (the [[heavyEntities]]
    * doctrine): a null user_id hashes to null, and a null h read through
    * the heap struct would rank as a phantom global-minimum hash and
    * corrupt the k-th order statistic. */
  def kmvDistinct(events: DataFrame, k: Int = 64): DataFrame = {
    val h = Dedup.PortableHash(concat(lit("kmv:"), col("user_id").cast("string")))
    // null-category doctrine (r14): known types only (the null group would
    // also hash-diverge on engine null-sort order)
    Spread.byKey(events.where(col("event_type").isNotNull), col("user_id"))
      .select(col("event_type"), h.as("h")).where(col("h").isNotNull).distinct()
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("exact_distinct"),
        graft.plans.TopKAggregate.topk(
          struct((-col("h")).cast("double").as("score"), col("h").as("id")), k).as("top"))
      .select(col("event_type"), col("exact_distinct"),
        when(col("exact_distinct") < k, col("exact_distinct"))
          .otherwise(expr(s"(${k - 1}L * 281474976710656L) div greatest(try_element_at(top, $k).id, 1L)"))
          .as("kmv_estimate"))
      .select(col("event_type"), col("exact_distinct"), col("kmv_estimate"),
        graft.functions.Cols.pct4(abs(col("kmv_estimate") - col("exact_distinct")),
          col("exact_distinct")).as("err_pct"))
      .orderBy(col("event_type"))
  }

  /** KMV SET-OPERATION estimates (the theta-sketch trick, Dasgupta et al.
    * 2016, on the KMV substrate of [[kmvDistinct]]): distinct-user overlap
    * between two event populations — |A∪B| and |A∩B| — from two bounded
    * sketches, without ever shuffling the full key sets together. The
    * union sketch is the k smallest hashes of the two sketches' union
    * (the KMV merge property); θ = its k-th value estimates
    * D̂_∪ = (k−1)·2⁴⁸ div θ; and because every union-sketch hash h ≤ θ is
    * below BOTH sides' k-th minima, membership of h in a side's full key
    * set is decidable from that side's k-min list alone — so the
    * intersection estimate D̂_∩ = |{union-k hashes in both lists}|·D̂_∪ div k
    * needs only the two ≤k-row lists. Pure integer arithmetic on
    * exactly-determined order statistics → the sketch estimates themselves
    * are oracle-checkable bit-for-bit (the KMV doctrine).
    *
    * Scale shape: one distinct-collapse of (side, hash) — the same shuffle
    * the EXACT lane pays anyway — then everything runs on ≤2k-row frames.
    * The exact lane (per-side, union, intersection counts) rides two
    * aggregations of the same collapsed frame and exists as the in-query
    * error audit; at 100 TB the sketch lane alone is the answer and the
    * exact lane is what you run on the 1% sample. Below k distinct union
    * keys the sketch degenerates to exact (both estimates = the counts —
    * the union sketch then IS the union). */
  def kmvSetOps(events: DataFrame, k: Int = 64,
                sideA: String = "view", sideB: String = "purchase"): DataFrame = {
    val h = Dedup.PortableHash(concat(lit("kmv:"), col("user_id").cast("string")))
    val dh = Spread.byKey(events.where(col("event_type").isin(sideA, sideB)),
        col("user_id")) // per-row md5 fan-out, no-op at scale
      .select(col("event_type").as("side"), h.as("h"))
      .where(col("h").isNotNull).distinct()
      .localCheckpoint() // three consumers: per-side agg, union agg, (via sketch) lists
    val perSide = dh.groupBy(col("side"))
      .agg(count(lit(1)).as("n_exact"),
        graft.plans.TopKAggregate.topk(
          struct((-col("h")).cast("double").as("score"), col("h").as("id")), k).as("top"))
    val exact = dh.groupBy(col("h")).agg(count(lit(1)).as("c"))
      .agg(count(lit(1)).as("exact_union"),
        graft.functions.Cols.countWhen(col("c") === 2).as("exact_intersect"))
    val sketchHashes = perSide
      .select(col("side"), explode(col("top")).as("t"))
      .select(col("side"), col("t.id").as("h"))
    val unionTop = sketchHashes.select(col("h")).distinct()
      .agg(graft.plans.TopKAggregate.topk(
        struct((-col("h")).cast("double").as("score"), col("h").as("id")), k).as("top"))
    val theta = unionTop
      .select(coalesce(expr(s"try_element_at(top, $k).id"), lit(0L)).as("theta"))
    val uk = unionTop.select(posexplode(col("top")))
      .select((col("pos") + 1).cast("long").as("r"), col("col.id").as("h"))
    val inA = sketchHashes.where(col("side") === sideA)
      .select(col("h"), lit(1L).as("in_a"))
    val inB = sketchHashes.where(col("side") === sideB)
      .select(col("h"), lit(1L).as("in_b"))
    val both = uk.join(inA, Seq("h"), "left").join(inB, Seq("h"), "left")
      .agg(graft.functions.Cols.countWhen(
        col("in_a") === 1L && col("in_b") === 1L).as("both_k"))
    val nA = perSide.where(col("side") === sideA).select(col("n_exact").as("exact_a"))
    val nB = perSide.where(col("side") === sideB).select(col("n_exact").as("exact_b"))
    nA.crossJoin(broadcast(nB)).crossJoin(broadcast(exact))
      .crossJoin(broadcast(theta)).crossJoin(broadcast(both))
      .select(col("exact_a"), col("exact_b"), col("exact_union"), col("exact_intersect"),
        when(col("exact_union") < k, col("exact_union"))
          .otherwise(expr(s"(${k - 1}L * 281474976710656L) div greatest(theta, 1L)"))
          .as("kmv_union_est"), col("both_k"))
      .select(col("exact_a"), col("exact_b"), col("exact_union"), col("exact_intersect"),
        col("kmv_union_est"),
        when(col("exact_union") < k, col("both_k"))
          .otherwise(expr(s"(both_k * kmv_union_est) div ${k}L")).as("kmv_intersect_est"))
      .select(col("exact_a"), col("exact_b"), col("exact_union"), col("exact_intersect"),
        col("kmv_union_est"), col("kmv_intersect_est"),
        graft.functions.Cols.pct4(abs(col("kmv_union_est") - col("exact_union")),
          col("exact_union")).as("union_err_pct"),
        graft.functions.Cols.pct4(abs(col("kmv_intersect_est") - col("exact_intersect")),
          greatest(col("exact_intersect"), lit(1L))).as("intersect_err_pct"))
  }

  /** Trailing-window distinct users per day from MERGED per-day KMV
    * sketches — the sketch-merge pattern that makes sliding distinct
    * counts cheap at 100 TB: the exact lane must re-deduplicate every
    * (user, day) pair per window position (W× coverage replication of the
    * full key set), while the sketch lane replicates only k-row day
    * sketches and re-ranks — the KMV merge property (the k smallest of a
    * union of k-min lists IS the union's KMV) makes the merged estimate
    * exactly what a from-scratch sketch of the window would report, so
    * the whole lane is oracle-checkable bit-for-bit like [[kmvDistinct]].
    * When the merged union carries under k hashes, every contributing
    * day's sketch was complete, so the union is the exact distinct count
    * and the estimate degenerates to exact (same regime split as
    * [[kmvDistinct]]).
    *
    * Output per day: the exact trailing DAU (the audit lane — at real
    * scale this is the expensive side the sketch replaces, here it rides
    * the same distinct collapse) + the merged-sketch estimate + error.
    * Null users excluded from BOTH lanes (the [[kmvDistinct]] doctrine).
    * Day/window conventions follow [[EventAnalytics.slidingActiveUsers]]:
    * a day's window covers days d−W+1..d, emitted only for days present
    * in the data. */
  def slidingDauKmv(events: DataFrame, windowDays: Int = 7, k: Int = 64): DataFrame = {
    val h = Dedup.PortableHash(concat(lit("kmv:"), col("user_id").cast("string")))
    val dayHash = Spread.byKey(events.where(col("user_id").isNotNull), col("user_id"))
      .select((col("ts_sec") - pmod(col("ts_sec"), lit(86400L))).as("day_sec"), h.as("h"))
      .distinct()
      .localCheckpoint() // feeds the day list, the sketch lane, the exact audit
    val days = dayHash.select(col("day_sec")).distinct()
    val sketchCol = graft.plans.TopKAggregate.topk(
      struct((-col("h")).cast("double").as("score"), col("h").as("id")), k)
    val daySketch = dayHash.groupBy(col("day_sec")).agg(sketchCol.as("top"))
    val merged = daySketch
      .select(col("day_sec"), explode(col("top")).as("t"))
      .select(explode(sequence(lit(0), lit(windowDays - 1))).as("w"),
        col("day_sec"), col("t.id").as("h"))
      .select((col("day_sec") + col("w") * 86400L).as("day_sec"), col("h"))
      .distinct() // two day-sketches in one window may share a hash
      .join(days, Seq("day_sec"), "left_semi")
      .groupBy(col("day_sec"))
      .agg(count(lit(1)).as("sketch_union"), sketchCol.as("top"))
    val exact = dayHash
      .select(explode(sequence(lit(0), lit(windowDays - 1))).as("w"),
        col("day_sec"), col("h"))
      .select((col("day_sec") + col("w") * 86400L).as("day_sec"), col("h"))
      .distinct()
      .join(days, Seq("day_sec"), "left_semi")
      .groupBy(col("day_sec")).agg(count(lit(1)).as("exact_dau"))
    merged.join(exact, Seq("day_sec"))
      .select(col("day_sec"), col("exact_dau"),
        when(col("sketch_union") < k, col("sketch_union"))
          .otherwise(expr(s"(${k - 1}L * 281474976710656L) div greatest(try_element_at(top, $k).id, 1L)"))
          .as("kmv_estimate"))
      .select(col("day_sec"), col("exact_dau"), col("kmv_estimate"),
        graft.functions.Cols.pct4(abs(col("kmv_estimate") - col("exact_dau")),
          col("exact_dau")).as("err_pct"))
      .orderBy(col("day_sec"))
  }

  /** Entities (parsed `props.k`, the reference's JSON entity id) receiving
    * more than 1/(capacity+1) of all tagged events, with exact counts. */
  def heavyEntities(events: DataFrame, capacity: Int = 127): DataFrame = {
    val keyed = events
      .select(get_json_object(col("props"), "$.k").cast("long").as("entity"))
      .where(col("entity").isNotNull)
    // pre-aggregation spread (Spread.byKey): the JSON parse + Misra–Gries
    // fold is the CPU here, and a one-row-group scan delivers every row to
    // ONE task; hashing the 8-byte entity column across the cores
    // parallelizes both consumers, and the two branches then share this
    // one exchange (scan+parse run once, not twice). No-op at scale.
    val spread = Spread.byKey(keyed, col("entity"))
    // one pass: total row count and the candidate sketch share the
    // aggregation; materialized once (1 row) for its two consumers
    val sk = spread
      .agg(count(lit(1)).as("n_total"),
        FrequentItemsAggregate.candidates(col("entity"), capacity).as("cands"))
      .localCheckpoint()
    val cands = sk.select(explode(col("cands")).as("entity"))
    val totals = sk.select(col("n_total"))
    spread.join(broadcast(cands), Seq("entity"))
      .groupBy(col("entity")).agg(count(lit(1)).as("n_events"))
      .crossJoin(broadcast(totals))
      .where(col("n_events") * (capacity + 1) > col("n_total"))
      .select(col("entity"), col("n_events"))
      .orderBy(col("n_events").desc, col("entity").asc)
  }

  /** Count-Min sketch point-frequency estimation (Cormode & Muthukrishnan
    * 2005) with PORTABLE hashing: row hashes are md5₄₈("cms<i>:"‖key) mod
    * `width`, so the whole sketch — and therefore every estimate — is
    * reproducible in plain SQL, which is what lets the oracle check not
    * just the exact counts but the SKETCH'S OWN answers and the one-sided
    * error guarantee (estimate ≥ true count, always).
    *
    * Scale shape: the sketch is a depth×width counter grid built by one
    * map-side-combinable aggregation over depth rows per event (shuffle
    * carries ≤ depth·width rows regardless of key cardinality — the point
    * of CMS); probes (here the exact top-`k` entities) broadcast onto the
    * grid, and the estimate is the min over `depth` counters. Output rows
    * carry estimate AND exact count so the overcount is auditable. */
  def countMinFrequencies(events: DataFrame, depth: Int = 4, width: Int = 64,
                          k: Int = 10): DataFrame = {
    val keyed = events
      .select(get_json_object(col("props"), "$.k").cast("long").as("entity"))
      .where(col("entity").isNotNull)
    // pre-explosion spread — same rationale as [[heavyEntities]]: the
    // depth-way explode + per-cell portable md5 is the query's CPU
    // (measured at sf0.1: two single-task stages were 1.7 s of the
    // query's 1.8 s wall), and the grid/probe branches share the one
    // exchange instead of scanning+parsing twice. No-op at scale.
    val spread = Spread.byKey(keyed, col("entity"))
    val grid = spread
      .select(col("entity"), explode(sequence(lit(0), lit(depth - 1))).as("row"))
      .groupBy(col("row"),
        (Dedup.PortableHash(concat(lit("cms"), col("row").cast("string"), lit(":"),
          col("entity").cast("string"))) % width).as("slot"))
      .agg(count(lit(1)).as("c"))
    val probes = spread.groupBy(col("entity")).agg(count(lit(1)).as("exact_n"))
      .orderBy(col("exact_n").desc, col("entity").asc).limit(k)
    probes
      .select(col("entity"), col("exact_n"),
        explode(sequence(lit(0), lit(depth - 1))).as("row"))
      .withColumn("slot",
        Dedup.PortableHash(concat(lit("cms"), col("row").cast("string"), lit(":"),
          col("entity").cast("string"))) % width)
      .join(broadcast(grid), Seq("row", "slot"))
      .groupBy(col("entity"), col("exact_n"))
      .agg(min(col("c")).as("cms_estimate"))
      .select(col("entity"), col("exact_n"), col("cms_estimate"),
        (col("cms_estimate") - col("exact_n")).as("overcount"))
      .orderBy(col("exact_n").desc, col("entity").asc)
  }
}
