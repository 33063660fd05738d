package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus snapshot diff — the added / removed / changed / unchanged census
  * between two states of a document collection. This is the audit step of
  * every incremental-ingest pipeline (which docs did the new crawl add,
  * which vanished, which changed content under a stable id) and the input
  * to incremental re-processing: only `added ∪ changed` needs re-embedding,
  * re-deduping, or re-scoring.
  *
  * Scale shape: one full-outer hash join on the document key (both sides
  * shuffle once on the key they're already keyed by) comparing content
  * fingerprints — md5 in-plan, so neither snapshot ships its text anywhere;
  * the diff rides on 16-byte fingerprints. Status is a projection, the
  * census a bounded per-source aggregate.
  */
object Snapshot {

  /** Per-document diff of two snapshots sharing a `doc_id` key: columns
    * (doc_id, source, status) with status ∈ added | removed | changed |
    * unchanged. Content identity is md5 of the text — engine-portable. */
  def snapshotDiff(oldSnap: DataFrame, newSnap: DataFrame): DataFrame = {
    val o = oldSnap.select(col("doc_id"), col("source").as("src_old"),
      md5(col("text")).as("fp_old"))
    val n = newSnap.select(col("doc_id"), col("source").as("src_new"),
      md5(col("text")).as("fp_new"))
    o.join(n, Seq("doc_id"), "full_outer")
      .select(col("doc_id"), coalesce(col("src_old"), col("src_new")).as("source"),
        when(col("fp_old").isNull, "added")
          .when(col("fp_new").isNull, "removed")
          .when(col("fp_old") =!= col("fp_new"), "changed")
          .otherwise("unchanged").as("status"))
  }

  /** Batch CDC MERGE (upsert + delete): apply a changelog to a base
    * snapshot, latest change per key winning. The changelog carries full
    * row images (`op` ∈ I/U/D, a per-key-unique `seq`, payload columns);
    * semantics are the MERGE INTO of warehouse engines — a 'D' winner
    * removes the key, an 'I'/'U' winner replaces (or introduces) the
    * payload, untouched base keys pass through.
    *
    * Scale shape: the changelog collapses to one winner per key with a
    * map-side-combinable `max(struct(seq, …))` hash aggregate (seq is
    * unique per key by contract, so the struct max is deterministic — no
    * window, no sort), then ONE full-outer hash join on the merge key.
    * Both shuffles are on the key the output is keyed by; at 100 TB the
    * changelog is typically ≪ the base, and AQE will broadcast it when it
    * fits. Nothing here buffers more than one winner row per key.
    */
  def mergeChanges(base: DataFrame, changes: DataFrame): DataFrame = {
    val winner = changes
      .groupBy(col("k"))
      .agg(max(struct(col("seq"), col("op"), col("st"), col("cents"))).as("w"))
      .select(col("k"), col("w.op").as("op"),
        col("w.st").as("new_st"), col("w.cents").as("new_cents"))
    base.join(winner, Seq("k"), "full_outer")
      .where(col("op").isNull || col("op") =!= "D")
      .select(col("k"),
        when(col("op").isNull, col("base_st")).otherwise(col("new_st")).as("st"),
        when(col("op").isNull, col("base_cents")).otherwise(col("new_cents")).as("cents"))
  }

  /** Oracle-facing fixture: a deterministic changelog derived from the
    * orders table (membership and images are pure functions of
    * md5₄₈(tag‖key), mirrored verbatim in SQL). ~40% of keys get an update
    * (half of those a second, later update — exercising latest-wins), ~14%
    * a delete (seq 3, so it beats any update on the same key), and ~11%
    * spawn inserts under a disjoint key range. Output is the per-status
    * census of the merged table — counts plus an exact cents revenue sum,
    * so every surviving row's payload participates in the hash check.
    */
  def mergeUpsertProfile(orders: DataFrame): DataFrame = {
    import graft.functions.Cols
    def h(tag: String) =
      Dedup.PortableHash(concat(lit(tag), col("k").cast("string")))
    val base = orders.select(col("o_orderkey").as("k"),
      col("o_orderstatus").as("base_st"), Cols.cents(col("o_totalprice")).as("cents"))
    val u1 = base.where(h("chg:") % 5 < 2)
      .select(col("k"), lit(1L).as("seq"), lit("U").as("op"), lit("P").as("st"),
        (col("cents") + 1000L).as("cents"))
    val u2 = base.where(h("chg:") % 5 < 2 && h("chg2:") % 2 === 0)
      .select(col("k"), lit(2L).as("seq"), lit("U").as("op"), lit("F").as("st"),
        (col("cents") + 2000L).as("cents"))
    val del = base.where(h("del:") % 7 < 1)
      .select(col("k"), lit(3L).as("seq"), lit("D").as("op"),
        lit(null).cast("string").as("st"), lit(null).cast("long").as("cents"))
    // insert keys offset by max(o_orderkey): base ∈ [1, maxk] and inserts
    // ∈ (maxk, 2·maxk] are disjoint AT ANY SCALE FACTOR — a fixed 1e8
    // offset would collide once orderkeys pass it, producing duplicate
    // (k, seq=1) changelog rows whose tie the two engines may break
    // differently. The offset is one broadcast scalar, not a driver action
    // — though at 100 TB the max key should come from table statistics /
    // catalog metadata (a footer-stats or metastore lookup), not an extra
    // scan+agg pass; the scan form here is the engine-portable fixture.
    val offset = base.agg(max(col("k")).as("__maxk"))
    val ins = base.where(h("ins:") % 9 < 1)
      .crossJoin(broadcast(offset))
      .select((col("k") + col("__maxk")).as("k"), lit(1L).as("seq"), lit("I").as("op"),
        lit("N").as("st"), ((col("k") % 1000L) * 100L + 50L).as("cents"))
    val changes = u1.unionAll(u2).unionAll(del).unionAll(ins)
    mergeChanges(base.withColumnRenamed("cents", "base_cents"), changes)
      .groupBy(col("st"))
      .agg(count(lit(1)).as("orders"),
        (sum(col("cents")).cast("double") / 100.0).as("revenue"))
      .orderBy(col("st"))
      .select(col("st").as("o_orderstatus"), col("orders"), col("revenue"))
  }

  /** Incremental aggregate refresh (materialized-view delta maintenance):
    * given a stored aggregate of the already-ingested corpus and a NEW
    * batch, the refreshed aggregate is a key-space-sized merge — one
    * full-outer join summing count/cents lanes — never a recompute over
    * the base rows. At 100 TB this is the difference between a refresh
    * that costs O(|delta| + |keys|) and one that rescans the corpus; the
    * lanes here (count, exact integer cents) are the self-maintainable
    * aggregate class (sums/counts; min/max would need deletion logs).
    *
    * Oracle-facing fixture: the batch split is a pure function of
    * md5₄₈('inc:'‖key) (~25% of orders form the "new ingest"), the base
    * aggregate is derived in-plan, and the ORACLE is the full one-shot
    * GROUP BY over all orders — the merge must reproduce the recompute
    * bit-for-bit, which is exactly the MV-maintenance correctness claim. */
  def incrementalRefresh(orders: DataFrame): DataFrame = {
    import graft.functions.Cols
    def agg(df: DataFrame, pfx: String) =
      df.groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as(s"${pfx}_orders"),
          sum(Cols.cents(col("o_totalprice"))).as(s"${pfx}_cents"))
    val isDelta = Dedup.PortableHash(
      concat(lit("inc:"), col("o_orderkey").cast("string"))) % 4 === 3
    // md5-lane fan-out (Spread.byKey, no-op at scale); the base and delta
    // aggregations then consume ONE shared exchange (scan + per-row md5
    // run once, not once per side)
    val spread = Spread.byKey(orders, col("o_orderkey"))
    agg(spread.where(!isDelta), "base")
      .join(agg(spread.where(isDelta), "delta"), Seq("o_orderpriority"), "full_outer")
      .select(col("o_orderpriority"),
        (coalesce(col("base_orders"), lit(0L))
          + coalesce(col("delta_orders"), lit(0L))).as("orders"),
        ((coalesce(col("base_cents"), lit(0L))
          + coalesce(col("delta_cents"), lit(0L))).cast("double") / 100.0).as("revenue"))
      .orderBy(col("o_orderpriority"))
  }

  /** Incremental maintenance of a JOIN view (the two-table sibling of
    * [[incrementalRefresh]]'s aggregate-only delta merge): for a stored
    * aggregate over orders ⋈ lineitem, new rows on BOTH inputs refresh the
    * view through the bilinear delta identity
    *
    *   Δ(A ⋈ B) = ΔA ⋈ B₀ + A₀ ⋈ ΔB + ΔA ⋈ ΔB
    *
    * so the base-side term A₀ ⋈ B₀ is NEVER recomputed — at 100 TB the
    * three delta terms are each bounded by the batch size (ΔA ⋈ B₀ probes
    * the base table on the join key, a pruned/indexed lookup, not a scan;
    * with both tables bucketed by orderkey it is a co-located join), and
    * the four partial aggregates merge by summing count/cents lanes — the
    * self-maintainable class.
    *
    * Oracle-facing fixture: each table's delta membership is a pure
    * function of md5₄₈ over ITS OWN key ('inca:'‖o_orderkey on orders,
    * 'incb:'‖(l_orderkey,l_linenumber) on lineitem — independent splits,
    * so all four terms are non-trivially exercised), and the ORACLE is
    * the one-shot join + GROUP BY over the full tables: the delta merge
    * must reproduce the recompute bit-for-bit, which is exactly the
    * incremental-view-maintenance correctness claim. */
  def incrementalJoinRefresh(orders: DataFrame, lineitem: DataFrame): DataFrame = {
    import graft.functions.Cols
    val oDelta = Dedup.PortableHash(
      concat(lit("inca:"), col("o_orderkey").cast("string"))) % 5 === 4
    val lDelta = Dedup.PortableHash(
      concat(lit("incb:"), col("l_orderkey").cast("string"), lit(":"),
        col("l_linenumber").cast("string"))) % 5 === 4
    // md5-lane fan-out + join-key layout (Spread.byKey, no-op at scale):
    // the four delta terms below each reference these frames — one shared
    // exchange per side means the scan + per-row md5 run ONCE, and
    // hash-partitioning on o_orderkey co-partitions every term's join
    val o  = Spread.byKey(
      orders.select(col("o_orderkey"), col("o_orderpriority"), oDelta.as("od")),
      col("o_orderkey"))
    val li = Spread.byKey(
      lineitem.select(col("l_orderkey").as("o_orderkey"),
        Cols.cents(col("l_extendedprice")).as("cents"), lDelta.as("ld")),
      col("o_orderkey"))
    def term(oSide: DataFrame, lSide: DataFrame) =
      oSide.join(lSide, Seq("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("items"), sum(col("cents")).as("cents"))
    // A₀⋈B₀ is the STORED view; the fixture derives it in-plan like the
    // aggregate-refresh fixture does. The three delta terms are the work
    // an actual refresh performs.
    val parts = Seq(
      term(o.where(!col("od")), li.where(!col("ld"))), // stored view
      term(o.where(col("od")), li.where(!col("ld"))),  // ΔA ⋈ B₀
      term(o.where(!col("od")), li.where(col("ld"))),  // A₀ ⋈ ΔB
      term(o.where(col("od")), li.where(col("ld"))))   // ΔA ⋈ ΔB
    parts.reduce(_.unionAll(_))
      .groupBy(col("o_orderpriority"))
      .agg(sum(col("items")).as("items"),
        (sum(col("cents")).cast("double") / 100.0).as("revenue"))
      .orderBy(col("o_orderpriority"))
  }

  /** Oracle-facing fixture over one documents table: derives two
    * deterministic snapshot states (membership and mutation are pure
    * functions of md5₄₈(doc_id), mirrored verbatim in SQL — the same
    * content-addressed doctrine as the sampling operators), diffs them,
    * and reports the per-source census. The derivation simulates a
    * re-crawl: ~90% membership each side with independent drops, and
    * ~1/8 of retained docs carrying revised text. */
  def snapshotDiffProfile(docs: DataFrame): DataFrame = {
    def member(tag: String) =
      Dedup.PortableHash(concat(lit(tag), col("doc_id").cast("string"))) % 10 < 9
    val oldSnap = docs.where(member("snapA:"))
    val mutated = Dedup.PortableHash(concat(lit("mut:"), col("doc_id").cast("string"))) % 8 < 1
    val newSnap = docs.where(member("snapB:"))
      .withColumn("text", when(mutated, concat(col("text"), lit(" rev2")))
        .otherwise(col("text")))
    snapshotDiff(oldSnap, newSnap)
      .groupBy(col("source"))
      .agg(graft.functions.Cols.countWhen(col("status") === "added").as("added"),
        graft.functions.Cols.countWhen(col("status") === "removed").as("removed"),
        graft.functions.Cols.countWhen(col("status") === "changed").as("changed"),
        graft.functions.Cols.countWhen(col("status") === "unchanged").as("unchanged"))
      .orderBy(col("source"))
  }
}
