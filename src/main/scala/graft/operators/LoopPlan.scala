package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.broadcast

/** Physical-planning helpers for the fixpoint-loop family (PageRank/HITS/
  * LPA/CC/Markov/power-iteration/k-core): operators that re-materialize a
  * bounded label/score frame every round with `localCheckpoint`.
  *
  * Why this exists (optimization round r16, guide §1.2/§2.4): with AQE on,
  * EVERY exchange inside every round materializes as its own query-stage
  * job — measured at sf0.1, the 8-round HITS loop ran 140 driver jobs for
  * 1.6 s of executor task time and ~3 s of driver scheduling/replanning
  * gaps; the loop is driver-latency-bound, not compute-bound. AQE's
  * per-stage replanning buys nothing inside these loops: the partition
  * counts are already derived from the measured frame size
  * (GraphRank.ckParts), the join strategy is decidable ONCE from the
  * measured |E| (the overflow-guard action every loop already pays), and
  * the frame shapes repeat identically round after round. So the loop body
  * runs under static planning, with the broadcast decision made from
  * measured row counts instead of AQE's per-stage estimates — the same
  * decision AQE would make every round, paid once.
  *
  * Posture at scale: everything OUTSIDE the loop (corpus-sized edge
  * builds, final output joins) still plans under the session's AQE
  * setting; the loop's own joins degrade to shuffle joins on
  * ckParts-sized partitions when the measured size exceeds the session's
  * `spark.sql.autoBroadcastJoinThreshold` — exactly the degradation AQE
  * provided, minus the per-round replanning latency. Results are
  * bit-identical either way (planning only, never arithmetic).
  */
private[operators] object LoopPlan {

  /** Run `body` (loop-round plan building + checkpoint materializations)
    * with adaptive execution off, restoring the previous setting even on
    * throw. Lazy frames the body RETURNS execute under the caller's
    * setting — scope eager materializations inside. */
  def statically[A](spark: SparkSession)(body: => A): A = {
    // GRAFT_LOOP_STATIC=0: dev-only A/B switch (leaves AQE on inside the
    // loops) — lets a single build measure both plans back-to-back
    if (sys.env.get("GRAFT_LOOP_STATIC").contains("0")) return body
    val key = "spark.sql.adaptive.enabled"
    val prev = spark.conf.get(key)
    spark.conf.set(key, "false")
    try body finally spark.conf.set(key, prev)
  }

  /** Broadcast-hint `df` iff the MEASURED size estimate fits the session's
    * `spark.sql.autoBroadcastJoinThreshold` (≤ 0 disables, Spark's own
    * convention) — the once-per-query, measured-stats version of the
    * decision AQE re-derives per stage per round. `estBytes` should come
    * from a row count the loop already pays (e.g. the overflow-guard |E|)
    * times a conservative bytes/row. */
  def broadcastIfSmall(df: DataFrame, estBytes: Long): DataFrame = {
    val thr = df.sparkSession.conf.get("spark.sql.autoBroadcastJoinThreshold")
      .stripSuffix("b").stripSuffix("B") match {
      case s if s.isEmpty => -1L
      case s => scala.util.Try(
        org.apache.spark.network.util.JavaUtils.byteStringAsBytes(s)).getOrElse(-1L)
    }
    if (thr > 0 && estBytes <= thr) broadcast(df) else df
  }
}
