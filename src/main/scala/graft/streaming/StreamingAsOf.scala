package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming backward AS-OF attribution — the online form of
  * [[graft.operators.AsOfJoin.purchaseAttribution]] (reference consumer:
  * `/root/reference/notebooks/analysis.ipynb` purchase attribution): each
  * purchase is matched, AT INGEST TIME, to the user's latest view with
  * `v_sec ≤ p_sec`, horizon-bounded to [[HorizonSec]].
  *
  * Native Structured Streaming cannot express this: stream-stream joins
  * support equality + time-range predicates but not "latest predecessor"
  * (a per-row rank over the matched set), so the operator is a
  * flatMapGroupsWithState keyed by user — the custom-state analogue of the
  * batch engine's custom as-of physical operator
  * ([[graft.plans.AsOfJoinPlan]]).
  *
  * Correctness contract (what makes a batch SQL oracle exact):
  *  - A purchase is resolved only once the event-time watermark has passed
  *    it (strictly: `wm_ms > p_sec·1000 + 1000`) — by the watermark
  *    guarantee every admissible view (`v_sec ≤ p_sec`) has then arrived,
  *    so the decision is independent of arrival interleaving. The
  *    per-group timer is armed at `p_sec·1000 + 1001`, which fires exactly
  *    when that gate opens; with whole-second watermarks both gates equal
  *    "p_sec ≤ final_wm_sec − 2", the closure rule the oracle states.
  *  - Views dedup per (user, second) to the max event_id, and the match is
  *    max-by (v_sec, view_id) — identical tie rule to the batch operator
  *    and the DuckDB ASOF oracle.
  *  - The horizon is applied at RESOLUTION: if the latest admissible view
  *    is older than [[HorizonSec]], the purchase emits with null
  *    attribution (LEFT semantics). Eviction keeps every view younger than
  *    `wm − H − 2 s`; a pending purchase always has `p_sec ≥ wm − 1`, so
  *    its whole admissible horizon window is still in state when it
  *    resolves — evicted views are provably outside any pending or future
  *    purchase's horizon.
  *
  * Scale shape: state is per-user — one horizon window of deduped view
  * seconds plus the purchases awaiting their watermark, both bounded by
  * the horizon × per-user rate, evicted by event-time timers; the only
  * shuffle is the hash exchange on user_id into the stateful operator.
  * That is the plateau-bounded profile the ×16/×64 streaming scale records
  * measured for this family. Assumes watermark-disciplined delivery (no
  * beyond-watermark late rows), like every streaming query here; the
  * slicing-independence test delivers time-ordered micro-batches.
  */
object StreamingAsOf {

  /** Attribution horizon: views older than this never attribute. */
  val HorizonSec = 3600L
  /** Watermark delay (the family-wide 600 s). */
  val DelaySec = 600L

  case class AsOfIn(user_id: Long, event_id: Long, ts_sec: Long,
                    is_purchase: Boolean, event_time: java.sql.Timestamp)
  case class ViewEnt(v_sec: Long, view_id: Long)
  case class PendP(p_sec: Long, purchase_id: Long)
  case class AsOfState(views: List[ViewEnt], pending: List[PendP])
  case class AsOfOut(user_id: Long, event_id: Long, ts_sec: Long,
                     attributed_view_id: Option[Long], lag_sec: Option[Long])

  /** The stateful core. Unified data/timeout body: merge arrivals, resolve
    * every pending purchase whose watermark gate opened, compact + evict
    * views, re-arm the earliest outstanding timer. */
  private[graft] def resolve(rows: Dataset[AsOfIn]): Dataset[AsOfOut] = {
    val spark = rows.sparkSession
    import spark.implicits._
    rows
      .withWatermark("event_time", s"$DelaySec seconds")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[AsOfState, AsOfOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, it: Iterator[AsOfIn], state: GroupState[AsOfState]) =>
          val wmMs = state.getCurrentWatermarkMs
          val st = state.getOption.getOrElse(AsOfState(Nil, Nil))
          var views = st.views
          var pending = st.pending
          it.foreach { e =>
            if (e.is_purchase) pending ::= PendP(e.ts_sec, e.event_id)
            else views ::= ViewEnt(e.ts_sec, e.event_id)
          }
          // per-second dedup to the max view_id (the batch operator's rule)
          views = views.groupBy(_.v_sec)
            .map { case (s, es) => ViewEnt(s, es.map(_.view_id).max) }.toList
          val (ready, rest) = pending.partition(p => wmMs > p.p_sec * 1000 + 1000)
          val out = ready.sortBy(_.purchase_id).map { p =>
            val best = views.filter(_.v_sec <= p.p_sec)
              .sortBy(v => (v.v_sec, v.view_id)).lastOption
            best match {
              case Some(v) if p.p_sec - v.v_sec <= HorizonSec =>
                AsOfOut(user, p.purchase_id, p.p_sec, Some(v.view_id),
                  Some(p.p_sec - v.v_sec))
              case _ => AsOfOut(user, p.purchase_id, p.p_sec, None, None)
            }
          }
          // a view older than wm − H − 2 s is outside the horizon of every
          // pending purchase (p_sec ≥ wm − 1) and every future arrival
          // (event time ≥ wm) — evict; keep the strict inequality so the
          // re-armed timer is always > the current watermark
          val live = views.filter(v => (v.v_sec + HorizonSec) * 1000 + 2000 > wmMs)
          if (rest.isEmpty && live.isEmpty) state.remove()
          else {
            state.update(AsOfState(live, rest))
            val t =
              if (rest.nonEmpty) rest.map(_.p_sec).min * 1000 + 1001
              else (live.map(_.v_sec).max + HorizonSec) * 1000 + 2000
            state.setTimeoutTimestamp(t)
          }
          out.iterator
      }
  }

  /** Events file stream → typed view/purchase rows. */
  private[graft] def parse(spark: SparkSession, path: String,
                           options: Map[String, String]): Dataset[AsOfIn] = {
    import spark.implicits._
    val schema = StreamingHourly.stagedSchema(spark, path)
    spark.readStream.options(options).schema(schema).parquet(path)
      .where(col("event_type").isin("view", "purchase") && col("user_id").isNotNull)
      .withColumn("ts_sec", graft.sources.Tables.tsSec(schema))
      .select(col("user_id").cast("long"), col("event_id").cast("long"),
        col("ts_sec"), (col("event_type") === "purchase").as("is_purchase"),
        timestamp_seconds(col("ts_sec")).as("event_time"))
      .as[AsOfIn]
  }

  /** Oracle-facing run over the staged events table. Output: one row per
    * watermark-closed purchase with its attributed view (or nulls), ordered
    * by purchase id. */
  def purchaseAttribution(spark: SparkSession, dir: String): DataFrame =
    purchaseAttributionFrom(spark,
      StreamingHourly.stagedEventsDir(spark, dir), Map.empty)

  /** [[purchaseAttribution]] over an explicit staged source + options — the
    * slicing-independence hook. */
  private[graft] def purchaseAttributionFrom(spark: SparkSession, path: String,
                                             options: Map[String, String]): DataFrame = {
    val out = resolve(parse(spark, path, options)).toDF()
    // timers fire on the trailing no-data batch — required here
    MemorySinkRunner.run(spark, out, "graft_stream_asof", shufflePartitions = 8)
      .orderBy(col("event_id"))
  }
}
