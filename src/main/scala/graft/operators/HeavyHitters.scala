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

  /** Entities (parsed `props.k`, the reference's JSON entity id) receiving
    * more than 1/(capacity+1) of all tagged events, with exact counts. */
  def heavyEntities(events: DataFrame, capacity: Int = 127): DataFrame = {
    val keyed = events
      .select(get_json_object(col("props"), "$.k").cast("long").as("entity"))
      .where(col("entity").isNotNull)
    // one pass: total row count and the candidate sketch share the
    // aggregation; materialized once (1 row) for its two consumers
    val sk = keyed
      .agg(count(lit(1)).as("n_total"),
        FrequentItemsAggregate.candidates(col("entity"), capacity).as("cands"))
      .localCheckpoint()
    val cands = sk.select(explode(col("cands")).as("entity"))
    val totals = sk.select(col("n_total"))
    keyed.join(broadcast(cands), Seq("entity"))
      .groupBy(col("entity")).agg(count(lit(1)).as("n_events"))
      .crossJoin(broadcast(totals))
      .where(col("n_events") * (capacity + 1) > col("n_total"))
      .select(col("entity"), col("n_events"))
      .orderBy(col("n_events").desc, col("entity").asc)
  }
}
