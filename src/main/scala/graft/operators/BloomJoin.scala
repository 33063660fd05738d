package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.plans.BloomFilter

/** Bloom-prefiltered joins — the explicit runtime-filter operator for the
  * "build side too big to broadcast, probe side enormous" regime.
  *
  * Plan shape (and why it scales): the build side reduces to ONE m-bit
  * filter row via map-side-combined `bloom_build` partials (each partition
  * ships one filter, merged by OR), that row broadcasts to every probe
  * task, and `bloom_might_contain` runs inside the probe's scan stage — so
  * non-matching probe rows die BEFORE the shuffle for the exact join. Only
  * matches + ~fpp·|probe| false positives get exchanged; the exact semi
  * join then removes the false positives, so the result is EXACTLY the
  * plain semi join (no false negatives by construction) while the shuffle
  * carries a selectivity-sized fraction of the probe table. At 100 TB with
  * a 1% match rate, that is the difference between exchanging 100 TB and
  * exchanging ~1 TB.
  *
  * Mirrors the reference's enrich-by-membership queries (high-value-order
  * filtering in `data_analysis.ipynb` cell 2's status breakdowns) at a
  * scale where the key list no longer broadcasts.
  */
object BloomJoin {

  /** Semi join `big ⋉ small` on `bigKey = smallKey`, bloom-prefiltered.
    * Output ≡ `big.join(small, bigKey === smallKey, "left_semi")` exactly.
    *
    * Sizing: fpp ≈ (1 − e^(−k·n/m))^k; the default 4 Mi bits / 5 hashes
    * holds ~400k build keys at ≈1% fpp (512 KiB on the wire). The build
    * aggregate hashes keys to 64 bits first, so any key type works.
    *
    * The built filter is materialized at the driver (one row, m/8 bytes —
    * the same distributed-build-then-ship step every runtime-filter engine
    * performs, cf. the Lloyd-round centroid materialization) and embedded
    * as a LITERAL in the probe predicate. Embedding matters: a
    * broadcast-join column reference would re-extract the m/8-byte binary
    * from the joined row for EVERY probe row (measured 35 s for 600k rows
    * at m=2^22), while a literal lands once in the generated class's
    * references and the probe is one static call per row. */
  def semiJoin(big: DataFrame, small: DataFrame, bigKey: String, smallKey: String,
               numBits: Int = 1 << 22, numHashes: Int = 5): DataFrame = {
    val bloomBytes = small
      .agg(BloomFilter.build(xxhash64(col(smallKey)), numBits, numHashes).as("__bloom"))
      .head().getAs[Array[Byte]]("__bloom")
    val prefiltered = big
      .where(BloomFilter.mightContainCol(lit(bloomBytes), xxhash64(col(bigKey))))
    // exact verification: false positives out, duplicates in `small` must
    // not multiply `big` rows — hence semi, not inner. Dataset-qualified
    // refs keep the condition unambiguous when bigKey == smallKey.
    prefiltered.join(small, prefiltered(bigKey) === small(smallKey), "left_semi")
  }

  /** Anti join `big ▷ small` (rows of `big` with NO match in `small`),
    * bloom-accelerated. The bloom flips roles here: a probe row whose key
    * the filter has DEFINITELY not seen (no false negatives ⟹ a miss is
    * authoritative) passes straight through with no join at all; only the
    * maybe-seen sliver — true matches plus ~fpp of the rest — pays the
    * exact anti join. This is the incremental-dedup shape: admit a new
    * batch against a 100 TB corpus key set where matches are rare, and the
    * exchange carries ~(match rate + fpp) of the batch instead of all of
    * it. Output ≡ the plain anti join (the union branches partition the
    * batch; each resolves membership exactly). */
  def antiJoin(big: DataFrame, small: DataFrame, bigKey: String, smallKey: String,
               numBits: Int = 1 << 22, numHashes: Int = 5): DataFrame = {
    val bloomBytes = small
      .agg(BloomFilter.build(xxhash64(col(smallKey)), numBits, numHashes).as("__bloom"))
      .head().getAs[Array[Byte]]("__bloom")
    val maybeSeen = BloomFilter.mightContainCol(lit(bloomBytes), xxhash64(col(bigKey)))
    // two complementary consumers (the union branches) — materialize the
    // batch once or its whole upstream subtree runs twice (the README's
    // alias-branch recompute hazard)
    val b = big.localCheckpoint()
    val definitelyNew = b.where(!maybeSeen)
    val candidates = b.where(maybeSeen)
    val rescued = candidates.join(small, candidates(bigKey) === small(smallKey), "left_anti")
    definitelyNew.unionByName(rescued)
  }

  /** Registered query: revenue of line items belonging to high-value orders
    * (o_totalprice above `cutoff`), per return flag. The order-key set at
    * 100 TB is far past broadcast size; the bloom pre-filter keeps the
    * lineitem scan → exchange volume proportional to the match rate. */
  def highValueLineitemRevenue(lineitem: DataFrame, orders: DataFrame,
                               cutoff: Double = 200000.0): DataFrame = {
    import graft.functions.Cols
    val highValue = orders.where(col("o_totalprice") > cutoff).select(col("o_orderkey"))
    semiJoin(lineitem, highValue, "l_orderkey", "o_orderkey")
      .groupBy(col("l_returnflag"))
      .agg(
        count(lit(1)).as("n_items"),
        Cols.sumDec4(Cols.dec2(col("l_extendedprice"))
          * (Cols.dec2(lit(1)) - Cols.dec2(col("l_discount")))).as("revenue"))
      .orderBy(col("l_returnflag"))
  }
}
