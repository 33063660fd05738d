package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join: attach to each left row the latest right row with
  * `right.ts <= left.ts` within the same key — the canonical operator for
  * event attribution (purchase → most recent prior page view), trade
  * enrichment (fill → latest quote), and slowly-changing-dimension lookup.
  *
  * Spark has no native as-of join, and the reference's pipeline expresses
  * attribution only implicitly through sessionization. Rather than a custom
  * physical operator, this composes existing ones — the preferred extension
  * route, since the composition already has the optimal distributed shape:
  *
  *   1. make the right side unique per (key, ts) with a deterministic
  *      reduction (max of the carried struct), so ties cannot produce
  *      engine-dependent results;
  *   2. UNION the two sides with a side marker;
  *   3. one window pass per key ordered by (ts, marker):
  *      `last(right_payload, ignoreNulls)` — each left row sees the most
  *      recent right payload at or before its timestamp;
  *   4. keep the left rows.
  *
  * Cost model at scale: exactly ONE shuffle of (|L|+|R|) rows on the key and
  * one per-partition sort — the same exchange a sort-merge join would pay,
  * with no range-explosion risk and no skew amplification beyond the key's
  * own skew. The rows-unbounded-preceding running `last` is a streaming
  * window (no frame re-scan per row).
  *
  * Semantics are pinned by a DuckDB `ASOF LEFT JOIN` oracle (q_asof
  * attribution query): equal timestamps match (<=), keys with no prior right
  * row yield nulls.
  */
object AsOfJoin {

  /** Generic backward as-of join.
    *
    * @param left     left rows; all columns preserved
    * @param right    right rows; reduced to one row per (key, ts)
    * @param keyCols  equality key column names (present on both sides)
    * @param tsCol    ordering column name (present on both sides; numeric or
    *                 any type with total ordering)
    * @param payload  right-side columns to attach (renamed as given)
    * @return left rows + payload columns (null where no right row ≤ ts)
    */
  def asOfBackward(left: DataFrame, right: DataFrame, keyCols: Seq[String],
                   tsCol: String, payload: Seq[String]): DataFrame = {
    val pay = struct((tsCol +: payload).map(col): _*)
    // one deterministic right row per (key, ts): max over the carried struct
    // (ts leads the struct, so this is "max by remaining fields" at equal ts).
    // Null ordering values are never valid candidates (SQL ASOF inequality
    // semantics; nulls-first asc ordering would otherwise slot them before
    // every left row) — drop them up front, matching AsOfJoinExec.
    val r1 = right
      .where(col(tsCol).isNotNull)
      .groupBy((keyCols :+ tsCol).map(col): _*)
      .agg(max(pay).as("__asof_pay"))
      .select(keyCols.map(col) :+ col(tsCol) :+ col("__asof_pay")
        :+ lit(0).as("__asof_side"): _*)

    val leftCols = left.columns
    val l1 = left
      .withColumn("__asof_pay", lit(null).cast(r1.schema("__asof_pay").dataType))
      .withColumn("__asof_side", lit(1))
      .select((keyCols :+ tsCol).map(col)
        ++ leftCols.filterNot(c => keyCols.contains(c) || c == tsCol).map(col)
        :+ col("__asof_pay") :+ col("__asof_side"): _*)

    // align schemas: right side carries nulls for left-only columns
    val l1Cols = l1.columns
    val r2 = r1.select(l1Cols.map(c =>
      if (r1.columns.contains(c)) col(c)
      else lit(null).cast(l1.schema(c).dataType).as(c)): _*)

    val w = Window
      .partitionBy(keyCols.map(col): _*)
      .orderBy(col(tsCol).asc, col("__asof_side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    l1.unionByName(r2)
      .withColumn("__asof_hit", last(col("__asof_pay"), ignoreNulls = true).over(w))
      .where(col("__asof_side") === 1)
      .select(leftCols.map(col)
        ++ Seq(col(s"__asof_hit.$tsCol").as(s"asof_$tsCol"))
        ++ payload.map(p => col(s"__asof_hit.$p").as(s"asof_$p")): _*)
  }

  /** Forward as-of join: earliest right row with `right.ts >= left.ts` per
    * key (the "next event after" lookup — e.g. first view following a
    * campaign touch). Reduces to the backward join under time negation;
    * ties at equal (key, ts) resolve to the max payload, like backward.
    *
    * Contract: `tsCol` must be NUMERIC time (epoch seconds/millis as
    * long/int/double — the engine-wide timestamp grain), with values
    * strictly above Long.MinValue so negation cannot overflow; null ts
    * rows pass through unmatched (−null = null, and the backward join
    * ignores null ordering values). [[asOfBackward]]'s any-total-order
    * claim applies to the backward direction only. */
  def asOfForward(left: DataFrame, right: DataFrame, keyCols: Seq[String],
                  tsCol: String, payload: Seq[String]): DataFrame = {
    def negTs(df: DataFrame) = df.withColumn(tsCol, -col(tsCol))
    asOfBackward(negTs(left), negTs(right), keyCols, tsCol, payload)
      .withColumn(tsCol, -col(tsCol))
      .withColumn(s"asof_$tsCol", -col(s"asof_$tsCol"))
  }

  /** Native-operator variant of [[asOfBackward]]: plans the engine's
    * [[graft.plans.AsOfJoinExec]] (constant-memory streaming merge, one
    * exchange per side) instead of the union+window composition. Identical
    * output contract — both variants share one SQL oracle. */
  def asOfBackwardNative(left: DataFrame, right: DataFrame, keyCols: Seq[String],
                         tsCol: String, payload: Seq[String]): DataFrame = {
    import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, AttributeReference}
    import org.apache.spark.sql.catalyst.plans.logical.Project
    val lp = left.queryExecution.analyzed
    // Both sides often scan the same relation; the analyzer's
    // DeduplicateRelations then re-ids the right subtree without visiting a
    // custom node's captured attributes. Exposing the right side through a
    // fresh-exprId alias projection makes the node's references stable: the
    // dedup rewrite happens below the aliases and stops there.
    val rpRaw = right.queryExecution.analyzed
    val aliases = rpRaw.output.map(a => Alias(a, a.name)())
    val rp = Project(aliases, rpRaw)
    val rOut = aliases.map(_.toAttribute)
    def find(out: Seq[Attribute], n: String) = out.find(_.name == n)
      .getOrElse(throw new IllegalArgumentException(s"column $n not found in ${out.map(_.name)}"))
    def lattr(n: String) = find(lp.output, n)
    def rattr(n: String) = find(rOut, n)
    val asofOut = (tsCol +: payload).map { n =>
      AttributeReference(s"asof_$n", rattr(n).dataType, nullable = true)()
    }
    org.apache.spark.sql.graft.bridge.ofRows(left.sparkSession,
      graft.plans.AsOfJoinNode(lp, rp,
        keyCols.map(lattr), keyCols.map(rattr),
        lattr(tsCol), rattr(tsCol), payload.map(rattr), asofOut))
  }

  private def attribution(events: DataFrame,
      join: (DataFrame, DataFrame, Seq[String], String, Seq[String]) => DataFrame): DataFrame = {
    // null users excluded on both sides: SQL ASOF equality never matches
    // NULL = NULL, but the union+window composition WOULD group the nulls
    // together — filtering makes engine and oracle agree by construction
    val views = events.where(col("event_type") === "view" && col("user_id").isNotNull)
      .select(col("user_id"), col("ts_sec"), col("event_id").as("view_id"))
    val purchases = events.where(col("event_type") === "purchase" && col("user_id").isNotNull)
      .select(col("user_id"), col("ts_sec"), col("event_id"))
    join(purchases, views, Seq("user_id"), "ts_sec", Seq("view_id"))
      .select(col("user_id"), col("event_id"), col("ts_sec"),
        col("asof_view_id").as("attributed_view_id"),
        (col("ts_sec") - col("asof_ts_sec")).as("lag_sec"))
      .orderBy(col("event_id"))
  }

  /** Purchase→view attribution over the generic events table: each purchase
    * joined as-of to the user's most recent view at or before it, with the
    * attribution lag in seconds. Null view/lag = unattributed purchase. */
  def purchaseAttribution(events: DataFrame): DataFrame =
    attribution(events, asOfBackward)

  /** [[purchaseAttribution]] through the native physical operator. */
  def purchaseAttributionNative(events: DataFrame): DataFrame =
    attribution(events, asOfBackwardNative)

  /** NEAREST-event join — the bidirectional sibling of as-of: attach to
    * each purchase the user's view CLOSEST in time within ±`windowSeconds`,
    * whichever side of the purchase it falls on (as-of only looks
    * backward; "nearest" is the temporal analogue of a 1-NN lookup and the
    * right attribution rule when pre- and post-purchase views are both
    * meaningful). Ties on |Δ| break to the earlier view, then lowest id —
    * a total order both engines state identically.
    *
    * Scale shape — no window over candidates, no cartesian: views explode
    * to the ≤ ⌈2·win/w⌉+1 grid cells their admissible band covers (the
    * [[RangeJoin]] doctrine with the user in the key), purchases land in
    * their one cell, the candidate join is a pure (user, cell) equi-join,
    * and the 1-NN reduction is a map-side-combinable `min(struct(|Δ|,
    * v_sec, view_id))` aggregation keyed by the purchase. */
  def nearestViewPerPurchase(events: DataFrame,
                             windowSeconds: Long = 3600,
                             bucketWidth: Long = 3600): DataFrame = {
    // floor division, not `div` (which truncates toward zero): for negative
    // epoch seconds truncation would round the view's lowest cell UP past
    // the purchase's cell and silently drop admissible pairs near t=0
    def floorDiv(x: String, w: Long) = s"(($x) - pmod($x, ${w}L)) div ${w}L"
    val p = events.where(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("purchase_id"),
        col("ts_sec").as("p_sec"),
        expr(floorDiv("ts_sec", bucketWidth)).as("__bkt"))
    val v = events.where(col("event_type") === "view")
      .select(col("user_id"), col("event_id").as("view_id"),
        col("ts_sec").as("v_sec"),
        explode(expr(s"sequence(${floorDiv(s"ts_sec - ${windowSeconds}L", bucketWidth)}," +
          s" ${floorDiv(s"ts_sec + ${windowSeconds}L", bucketWidth)})")).as("__bkt"))
    p.join(v, Seq("user_id", "__bkt"))
      .where(abs(col("p_sec") - col("v_sec")) <= windowSeconds)
      .groupBy(col("purchase_id"))
      .agg(first(col("user_id")).as("user_id"), first(col("p_sec")).as("p_sec"),
        min(struct(abs(col("p_sec") - col("v_sec")).as("abs_lag"),
          col("v_sec").as("v_sec"), col("view_id").as("view_id"))).as("nn"))
      .select(col("user_id"), col("purchase_id"), col("p_sec"),
        col("nn.view_id").as("nearest_view_id"), col("nn.abs_lag").as("abs_lag"))
      .orderBy(col("purchase_id"))
  }
}
