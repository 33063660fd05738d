package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Cols
import graft.sources.Tables

/** Batch relational surface over the star schema — the join/aggregation
  * breadth the reference exercises only as out-of-engine SQL against Postgres
  * (SURVEY.md §2.3 J2, §2.11). Each method is a pure plan builder; Catalyst
  * supplies pushdown, pruning, join selection and AQE.
  *
  * Scale design notes (the part that matters at 100 TB):
  *  - Dimension tables (region/nation/supplier/part/customer) are broadcast
  *    explicitly — fact-side rows never shuffle for enrichment joins.
  *  - Fact-fact joins (lineitem ⋈ orders) shuffle on the join key once; the
  *    groupBy that follows reuses the same key where possible so Catalyst can
  *    avoid a second exchange.
  *  - Top-k is expressed as orderBy+limit → planned as TakeOrderedAndProject
  *    (per-partition heap + driver merge of k rows), never a global sort.
  */
object Relational {

  /** TPC-H Q1-style pricing summary: single-table scan + groupBy on two
    * low-cardinality keys. Partial aggregation does almost all the work
    * map-side; the exchange carries |flags×status| rows per partition. */
  def pricingSummary(li: DataFrame): DataFrame =
    // Literal cast to TIMESTAMP_NTZ to match the parquet column's type (the
    // files carry isAdjustedToUTC=false): a same-type comparison keeps the
    // predicate eligible for parquet pushdown — a column-side cast would not.
    li.where(col("l_shipdate") <= lit("1998-09-01 00:00:00").cast("timestamp_ntz"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        Cols.sumDec2(col("l_quantity")).as("sum_qty"),
        Cols.sumDec2(col("l_extendedprice")).as("sum_base_price"),
        // exact integer arithmetic: operands are 2-decimal by contract, so
        // the cents/1e-4-unit casts are exact and sums are order-independent
        Cols.sumDec4(Cols.dec2(col("l_extendedprice")) * (Cols.dec2(lit(1)) - Cols.dec2(col("l_discount"))))
          .as("sum_disc_price"),
        count(lit(1)).as("count_order"),
        Cols.avgMoney4(col("l_quantity"), count(lit(1))).as("avg_qty"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  /** Revenue by region: lineitem → supplier → nation → region, all three
    * dimensions broadcast (supplier is small in TPC-H-ish data; at real scale
    * supplier might be shuffle-joined — AQE would decide, the explicit hint
    * here documents intent for the star-schema case). */
  def revenueByRegion(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val su = Tables.supplier(spark, dir)
    val na = Tables.nation(spark, dir)
    val re = Tables.region(spark, dir)
    li.join(broadcast(su), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(na), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(re), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"))
      .agg(
        count(lit(1)).as("line_count"),
        Cols.sumDec4(Cols.dec2(col("l_extendedprice")) * (Cols.dec2(lit(1)) - Cols.dec2(col("l_discount"))))
          .as("revenue"))
      .orderBy(col("r_name"))
  }

  /** TPC-H Q3-style: customer ⋈ orders ⋈ lineitem with filters on both sides,
    * top-10 by revenue. Customer is broadcast; orders⋈lineitem shuffles on
    * orderkey. Filters sit below the joins so they push into the scans. */
  def topOrdersByRevenue(spark: SparkSession, dir: String, segment: String = "BUILDING", n: Int = 10): DataFrame = {
    val cu = Tables.customer(spark, dir).where(col("c_mktsegment") === segment)
    val or = Tables.orders(spark, dir)
    val li = Tables.lineitem(spark, dir)
    li.join(or, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cu), col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"))
      .agg(Cols.sumDec4(Cols.dec2(col("l_extendedprice")) * (Cols.dec2(lit(1)) - Cols.dec2(col("l_discount"))))
        .as("revenue"))
      .select(col("l_orderkey"),
        Cols.tsSec(col("o_orderdate")).as("orderdate_sec"), col("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey").asc)
      .limit(n)
  }

  /** Customers with ≥1 order, per market segment — left SEMI join (EXISTS).
    * Semi joins ship only the key column of the build side and stop probing
    * at first match; at scale this is strictly cheaper than join+distinct. */
  def customersWithOrders(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .join(Tables.orders(spark, dir), col("c_custkey") === col("o_custkey"), "left_semi")
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("customers_with_orders"))
      .orderBy(col("c_mktsegment"))

  /** FULL OUTER join audit: reconcile two keyed tables into a
    * both/left-only/right-only census — the referential-integrity check a
    * migration runs between systems of record. The outer join plans as a
    * sort-merge on the key (the only join type that cannot broadcast one
    * side away, since BOTH sides' unmatched rows survive); the census
    * aggregate rides the same exchange. The right side is pre-filtered to
    * high-value orders so `customer_only` is non-empty; `order_only` stays
    * absent while the orders→customer foreign key holds — its appearance IS
    * the integrity violation this audit exists to surface. */
  def outerJoinAudit(spark: SparkSession, dir: String, threshold: Double = 450000.0): DataFrame = {
    val c = Tables.customer(spark, dir).select(col("c_custkey"))
    val o = Tables.orders(spark, dir).where(col("o_totalprice") > threshold)
      .select(col("o_custkey")).distinct()
    c.join(o, col("c_custkey") === col("o_custkey"), "full_outer")
      .select(
        when(col("c_custkey").isNotNull && col("o_custkey").isNotNull, "both")
          .when(col("c_custkey").isNotNull, "customer_only")
          .otherwise("order_only").as("presence"))
      .groupBy(col("presence")).agg(count(lit(1)).as("keys"))
      .orderBy(col("presence"))
  }

  /** Customers with no high-value order — left ANTI join (NOT EXISTS). The
    * build side is pre-filtered (threshold pushes into the orders scan), so
    * the anti join probes a small hash relation. (Plain "no orders at all"
    * would be vacuously empty in this data — every customer has orders.) */
  def customersWithoutBigOrders(spark: SparkSession, dir: String, threshold: Double = 450000.0): DataFrame =
    Tables.customer(spark, dir)
      .join(Tables.orders(spark, dir).where(col("o_totalprice") > threshold),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
      .orderBy(col("c_custkey"))

  /** Top-3 parts by revenue within each brand — ranking window (reference W2).
    * The window partitions on brand after a keyed aggregation, so the sort is
    * per-brand over |parts-per-brand| rows, not global. Ties broken on
    * partkey for determinism. */
  def topPartsPerBrand(spark: SparkSession, dir: String, n: Int = 3): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val pa = Tables.part(spark, dir)
    val perPart = li.join(broadcast(pa), col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"), col("p_partkey"))
      .agg(Cols.sumDec2(col("l_extendedprice")).as("revenue"))
    val w = Window.partitionBy(col("p_brand"))
      .orderBy(col("revenue").desc, col("p_partkey").asc)
    // cast to long: the oracle's row_number() is 64-bit, and a schema compare
    // would flag int32 vs int64 even when values agree
    perPart.withColumn("rank_in_brand", row_number().over(w).cast("long"))
      .where(col("rank_in_brand") <= n)
      .orderBy(col("p_brand"), col("rank_in_brand"))
  }

  /** Fulfillment-latency census: days from order placement to each line's
    * ship date — the one FACT-TO-FACT join in the relational family
    * (lineitem ⋈ orders; neither side broadcasts at scale, so this is the
    * plan that exercises the co-partitioned big-big shuffle join — with
    * both tables bucketed by orderkey at rest it degrades to a zero-shuffle
    * sort-merge, the [[graft.sources.Bucketing]] doctrine). The census is
    * bounded by the latency domain (≤ ~125 day values), integer-exact. */
  def fulfillmentLatency(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), Cols.tsSec(col("l_shipdate")).as("ship_sec"),
        Cols.cents(col("l_extendedprice")).as("cents"))
    val or = Tables.orders(spark, dir)
      .select(col("o_orderkey"), Cols.tsSec(col("o_orderdate")).as("order_sec"))
    li.join(or, col("l_orderkey") === col("o_orderkey"))
      .select(expr("(ship_sec - order_sec) div 86400").as("latency_days"), col("cents"))
      .groupBy(col("latency_days"))
      .agg(count(lit(1)).as("lines"),
        (sum(col("cents")).cast("double") / 100.0).as("revenue"))
      .orderBy(col("latency_days"))
  }

  /** Market-leader query: each nation's top supplier by lineitem revenue —
    * a three-table star join (fact ⋈ supplier ⋈ nation, both dimensions
    * broadcast) whose per-nation winner is an ARGMAX AGGREGATION
    * (`max(struct(cents, −s_suppkey, …))` — map-side combinable, one row
    * per nation ships), never a ranking window over the supplier universe.
    * Ties break to the lower supplier key via the negated key inside the
    * struct; revenue stays exact cents until the final render. */
  def topSupplierByNation(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val su = Tables.supplier(spark, dir)
    val na = Tables.nation(spark, dir)
    val perSupplier = li.join(broadcast(su), col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("s_nationkey"), col("s_suppkey"), col("s_name"))
      .agg(sum(Cols.cents(col("l_extendedprice"))).as("cents"))
    perSupplier
      .groupBy(col("s_nationkey"))
      .agg(max(struct(col("cents"), (-col("s_suppkey")).as("neg"),
        col("s_suppkey").as("s_suppkey"), col("s_name").as("s_name"))).as("w"))
      .join(broadcast(na), col("s_nationkey") === col("n_nationkey"))
      .select(col("n_name").as("nation"), col("w.s_suppkey").as("s_suppkey"),
        col("w.s_name").as("s_name"),
        (col("w.cents").cast("double") / 100.0).as("revenue"))
      .orderBy(col("nation"))
  }

  /** TPC-H Q6-shaped selective scan aggregate: the "how much revenue would
    * a discount policy change move" forecast — three scan-side predicates
    * (ship-date year, discount band, quantity cap) and one exact product
    * sum, NO join, NO group. The point at 100 TB: every predicate is a
    * plain column comparison, so all three reach the parquet reader as
    * PushedFilters (PlanSpec asserts it) and row-group statistics prune
    * before a single page decodes; revenue is the exact 1e-4-unit integer
    * sum of the 2-decimal × 2-decimal product. */
  def forecastRevenue(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .where(col("l_shipdate") >= lit("1996-01-01").cast("timestamp")
        && col("l_shipdate") < lit("1997-01-01").cast("timestamp")
        && col("l_discount") >= 0.05 && col("l_discount") <= 0.07
        && col("l_quantity") < 24)
      .agg(count(lit(1)).as("lines"),
        Cols.sumDec4(Cols.dec2(col("l_extendedprice")) * Cols.dec2(col("l_discount")))
          .as("revenue"))

  /** Scale sibling of [[topPartsPerBrand]] (exact-anchor pairing doctrine):
    * the SAME per-brand top-n through the engine's bounded heap aggregate
    * ([[graft.plans.TopKAggregate]]) instead of a ranking window — each
    * partition keeps an O(n) heap per brand and ships n rows, no per-brand
    * sort of the part universe. Ranking runs on exact integer cents (the
    * long→double→long heap round-trip is exact below 2⁵³), ties to the
    * lower part key — the identical total order the window states, so both
    * queries share one oracle. */
  def topPartsPerBrandAgg(spark: SparkSession, dir: String, n: Int = 3): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val pa = Tables.part(spark, dir)
    val perPart = li.join(broadcast(pa), col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"), col("p_partkey"))
      .agg(sum(Cols.cents(col("l_extendedprice"))).as("rev_cents"))
    perPart.groupBy(col("p_brand"))
      .agg(graft.plans.TopKAggregate.topk(
        struct(col("rev_cents").cast("double"), col("p_partkey")), n).as("top"))
      .select(col("p_brand"), posexplode(col("top")).as(Seq("pos", "p")))
      .select(col("p_brand"), col("p.id").as("p_partkey"),
        (col("p.score").cast("long").cast("double") / 100.0).as("revenue"),
        (col("pos") + 1).cast("long").as("rank_in_brand"))
      .orderBy(col("p_brand"), col("rank_in_brand"))
  }

  /** Order-priority distribution with ratio-to-total (A11 over star data). */
  def orderPriorityDistribution(spark: SparkSession, dir: String): DataFrame = {
    val counts = Tables.orders(spark, dir)
      .groupBy(col("o_orderpriority")).agg(count(lit(1)).as("cnt"))
    counts.select(col("o_orderpriority"), col("cnt"),
        Cols.pct4(col("cnt"), sum(col("cnt")).over(Window.partitionBy())).as("pct"))
      .orderBy(col("o_orderpriority"))
  }

  /** UNION ALL of scalar health counts — parity with the reference's
    * monitor_pipeline.sh:24-34 status query. */
  def tableCounts(spark: SparkSession, dir: String): DataFrame = {
    def one(name: String, df: DataFrame) =
      df.agg(count(lit(1)).as("row_count")).select(lit(name).as("table_name"), col("row_count"))
    one("events", Tables.events(spark, dir))
      .unionByName(one("orders", Tables.orders(spark, dir)))
      .unionByName(one("lineitem", Tables.lineitem(spark, dir)))
      .unionByName(one("customer", Tables.customer(spark, dir)))
      .orderBy(col("table_name"))
  }

  /** Orders bucketed by total price — bucketed aggregation (reference A12,
    * notebook cell 4 pd.cut): CASE-chain bucketing keeps the whole thing in
    * one codegen stage, no Bucketizer/ML dependency. */
  def ordersByPriceBucket(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .withColumn("price_bucket",
        when(col("o_totalprice") < 50000, "0-50k")
          .when(col("o_totalprice") < 100000, "50-100k")
          .when(col("o_totalprice") < 200000, "100-200k")
          .otherwise("200k+"))
      .groupBy(col("price_bucket"))
      .agg(
        count(lit(1)).as("orders"),
        Cols.sumDec2(col("o_totalprice")).as("total_value"))
      .orderBy(col("price_bucket"))

  /** Decile statistics over order totals — EXACT ntile(10) semantics with a
    * distributed plan (the registered form; [[orderValueDecilesNtile]] is the
    * one-window spec it provably equals, kept as a test-only anchor).
    *
    * A global ranking window is a single-partition sort of every order — the
    * canonical 100 TB killer. Instead the global rank is decomposed:
    *  1. histogram the values into fixed-width buckets (map-side-combined
    *     groupBy; bucket count is VALUE RANGE / width, independent of rows);
    *  2. a running sum over that bounded histogram gives each bucket's
    *     global rank OFFSET (the single-partition window here touches only
    *     |buckets| rows — same bounded shape as [[orderValueDecilesHist]]);
    *  3. broadcast the offsets back and row_number WITHIN each bucket
    *     (window partitioned by bucket — parallel, spillable per bucket);
    *     global rank = offset + in-bucket rank, exact because the
    *     (o_totalprice, o_orderkey) order key is unique and bucket order is
    *     value order.
    *  4. map rank → tile with the SQL ntile rule (first n mod 10 tiles get
    *     ⌈n/10⌉ rows): integer-exact, ⌈a/b⌉ = floor((a+b−1)/b), exact in
    *     double below 2^52.
    * Skew: a pathological bucket still sorts in one window partition —
    * shrink `width` to split it (the histogram stays tiny either way). */
  def orderValueDeciles(spark: SparkSession, dir: String,
                        width: Double = 1000.0): DataFrame =
    decilesByValue(Tables.orders(spark, dir), width)

  /** [[orderValueDeciles]] over an arbitrary orders-shaped frame (needs
    * `o_orderkey`, `o_totalprice`) — the testable core. */
  private[graft] def decilesByValue(ordersIn: DataFrame,
                                    width: Double = 1000.0): DataFrame = {
    // bucket-lane fan-out (Spread.byKey, no-op at scale): the per-bucket
    // ranking window's exchange otherwise AQE-coalesces to one partition
    // on the local SFs, serializing the sort; hash(bucket) is pinned here
    // and both the histogram and the ranking reuse it
    val orders = Spread.byKey(ordersIn
      .select(col("o_orderkey"), col("o_totalprice"),
        floor(col("o_totalprice") / width).cast("long").as("bucket")),
      col("bucket"))
    val hist = orders.groupBy(col("bucket")).agg(count(lit(1)).as("cnt"))
    val wPrev = Window.orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = hist.select(col("bucket"),
      coalesce(sum(col("cnt")).over(wPrev), lit(0L)).as("off"),
      sum(col("cnt")).over(Window.partitionBy()).as("n"))
    val wBucket = Window.partitionBy(col("bucket"))
      .orderBy(col("o_totalprice"), col("o_orderkey"))
    val ranked = orders.join(broadcast(offsets), Seq("bucket"))
      .select(col("o_totalprice"),
        (col("off") + row_number().over(wBucket)).as("r"), col("n"))
    // ntile(10) of 1-based rank r over n rows: q = n div 10, rem = n mod 10,
    // the first rem tiles hold q+1 rows (boundary big = rem·(q+1))
    val q    = floor(col("n") / 10).cast("long")
    val rem  = pmod(col("n"), lit(10L))
    val big  = rem * (q + 1)
    val tile = when(col("r") <= big,
        floor((col("r") + q) / (q + 1)).cast("long"))
      .otherwise(rem +
        floor((col("r") - big + greatest(q, lit(1L)) - 1) / greatest(q, lit(1L))).cast("long"))
    ranked
      .select(tile.as("decile"), col("o_totalprice"))
      .groupBy(col("decile"))
      .agg(count(lit(1)).as("orders"),
        Cols.sumDec2(col("o_totalprice")).as("total_value"))
      .orderBy(col("decile"))
  }

  /** Exact interpolated quantiles (SQL `percentile_cont` semantics) with NO
    * global sort: the [[decilesByValue]] histogram-offset machinery ranks
    * every order inside its value bucket, the (n−1)·q selection positions
    * are pure integer arithmetic on the rank frame (q = num/den rational, so
    * lo = ((n−1)·num) div den and the fractional remainder are exact), and
    * only the ≤ 2·|quantiles| selected rows reach the interpolation — one
    * deterministic IEEE op sequence on exact cents, mirrored verbatim in
    * the oracle.
    *
    * Scale shape: same as the deciles — the only unpartitioned window runs
    * on the bounded bucket histogram; per-bucket ranking shuffles on the
    * bucket key; selection is a filter on the ranked stream (no top-k, no
    * sort). Complements [[groupQuantiles]]' nearest-rank flavor with the
    * interpolated one analysts usually mean by "the median". */
  private[graft] def quantilesCont(ordersIn: DataFrame, width: Double = 1000.0,
      qs: Seq[(String, Long, Long)] = Seq(("p25", 1L, 4L), ("p50", 2L, 4L),
        ("p75", 3L, 4L))): DataFrame = {
    // bucket-lane fan-out — same rationale as [[decilesByValue]]
    val orders = Spread.byKey(ordersIn
      .select(col("o_orderkey"), Cols.cents(col("o_totalprice")).as("cents"),
        floor(col("o_totalprice") / width).cast("long").as("bucket")),
      col("bucket"))
    val hist = orders.groupBy(col("bucket")).agg(count(lit(1)).as("cnt"))
    val wPrev = Window.orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = hist.select(col("bucket"),
      coalesce(sum(col("cnt")).over(wPrev), lit(0L)).as("off"),
      sum(col("cnt")).over(Window.partitionBy()).as("n"))
    val wBucket = Window.partitionBy(col("bucket"))
      .orderBy(col("cents"), col("o_orderkey"))
    val ranked = orders.join(broadcast(offsets), Seq("bucket"))
      .select(col("cents"), (col("off") + row_number().over(wBucket)).as("r"), col("n"))
    def lo(nu: Long, de: Long) = expr(s"((n - 1) * $nu) div $de")
    val cands = ranked.where(qs.map { case (_, nu, de) =>
      col("r") === lo(nu, de) + 1 || col("r") === lo(nu, de) + 2
    }.reduce(_ || _))
    val sel = cands.agg(
      first(col("n")).as("n"),
      qs.flatMap { case (label, nu, de) => Seq(
        min(when(col("r") === lo(nu, de) + 1, col("cents"))).as(s"${label}_lo"),
        min(when(col("r") === lo(nu, de) + 2, col("cents"))).as(s"${label}_hi"))
      }: _*)
    val rows = qs.map { case (label, nu, de) =>
      val rem = pmod((col("n") - 1) * nu, lit(de))
      // empty-input guard: the global agg emits one row with n=NULL when
      // zero candidates exist; SQL's GROUP-BY-shaped quantile emits zero
      // rows there, so drop the all-NULL row instead of reporting it
      sel.where(col("n").isNotNull).select(lit(label).as("quantile"),
        ((col(s"${label}_lo").cast("double")
          + (rem.cast("double") / lit(de).cast("double"))
            * (coalesce(col(s"${label}_hi"), col(s"${label}_lo")).cast("double")
              - col(s"${label}_lo").cast("double"))) / 100.0).as("value"))
    }
    rows.reduce(_.unionAll(_)).orderBy(col("quantile"))
  }

  /** [[quantilesCont]] over the orders table — the registered form. */
  def orderPriceQuantilesCont(spark: SparkSession, dir: String): DataFrame =
    quantilesCont(Tables.orders(spark, dir))

  /** Per-group [[quantilesCont]] — `percentile_cont(...) WITHIN GROUP ...
    * GROUP BY g`, the form analysts actually write, with the same no-
    * global-sort machinery applied per group: bucket histograms and rank
    * offsets are computed per (group, bucket), the offset windows run on
    * the bounded per-group histograms, and each group's (n−1)·q selection
    * positions use ITS OWN n. One shuffle on (group, bucket) ranks the
    * corpus; only ≤ 2·|quantiles| rows per group reach the interpolation. */
  def quantilesContByGroup(ordersIn: DataFrame, groupCol: String,
      width: Double = 1000.0,
      qs: Seq[(String, Long, Long)] = Seq(("p25", 1L, 4L), ("p50", 2L, 4L),
        ("p75", 3L, 4L))): DataFrame = {
    val g = col(groupCol)
    // (group, bucket)-lane fan-out — same rationale as [[decilesByValue]]
    val orders = Spread.byKey(ordersIn
      .select(g, col("o_orderkey"), Cols.cents(col("o_totalprice")).as("cents"),
        floor(col("o_totalprice") / width).cast("long").as("bucket")),
      g, col("bucket"))
    val hist = orders.groupBy(g, col("bucket")).agg(count(lit(1)).as("cnt"))
    val wPrev = Window.partitionBy(g).orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = hist.select(g, col("bucket"),
      coalesce(sum(col("cnt")).over(wPrev), lit(0L)).as("off"),
      sum(col("cnt")).over(Window.partitionBy(g)).as("n"))
    val wBucket = Window.partitionBy(g, col("bucket"))
      .orderBy(col("cents"), col("o_orderkey"))
    val ranked = orders.join(broadcast(offsets), Seq(groupCol, "bucket"))
      .select(g, col("cents"), (col("off") + row_number().over(wBucket)).as("r"),
        col("n"))
    def lo(nu: Long, de: Long) = expr(s"((n - 1) * $nu) div $de")
    val cands = ranked.where(qs.map { case (_, nu, de) =>
      col("r") === lo(nu, de) + 1 || col("r") === lo(nu, de) + 2
    }.reduce(_ || _))
    val sel = cands.groupBy(g).agg(
      first(col("n")).as("n"),
      qs.flatMap { case (label, nu, de) => Seq(
        min(when(col("r") === lo(nu, de) + 1, col("cents"))).as(s"${label}_lo"),
        min(when(col("r") === lo(nu, de) + 2, col("cents"))).as(s"${label}_hi"))
      }: _*)
    val rows = qs.map { case (label, nu, de) =>
      val rem = pmod((col("n") - 1) * nu, lit(de))
      sel.select(g, lit(label).as("quantile"),
        ((col(s"${label}_lo").cast("double")
          + (rem.cast("double") / lit(de).cast("double"))
            * (coalesce(col(s"${label}_hi"), col(s"${label}_lo")).cast("double")
              - col(s"${label}_lo").cast("double"))) / 100.0).as("value"))
    }
    rows.reduce(_.unionAll(_)).orderBy(g, col("quantile"))
  }

  /** [[quantilesContByGroup]] by order priority — the registered form. */
  def priorityPriceQuantilesCont(spark: SparkSession, dir: String): DataFrame =
    quantilesContByGroup(Tables.orders(spark, dir), "o_orderpriority")

  /** Assortment coverage: per brand, how much of the catalog has EVER
    * sold — the complement of [[DataQuality.fkIntegrity]]'s orphan check
    * (that audits children without parents; this audits parents without
    * children, which is a business readout, not a bug). One distinct
    * collapse of the fact side's keys, one left join onto the catalog,
    * a bounded per-brand census. */
  def catalogCoverage(spark: SparkSession, dir: String): DataFrame = {
    val part = Tables.part(spark, dir).select(col("p_partkey"), col("p_brand"))
    val sold = Tables.lineitem(spark, dir)
      .select(col("l_partkey").as("p_partkey")).distinct()
      .withColumn("sold", lit(1L))
    part.join(sold, Seq("p_partkey"), "left")
      .groupBy(col("p_brand"))
      .agg(count(lit(1)).as("parts"),
        Cols.countWhen(col("sold").isNotNull).as("sold_parts"))
      .select(col("p_brand"), col("parts"), col("sold_parts"),
        Cols.pct4(col("sold_parts"), col("parts")).as("coverage_pct"))
      .orderBy(col("p_brand"))
  }

  /** Hour-of-day traffic envelope: exact interpolated p25/p50/p75 of the
    * per-(day, hour-of-day) event counts — the expected-traffic band an
    * alerting rule compares tonight's 3 AM against LAST WEEK'S 3 AMs
    * rather than the daily mean. Pure reuse: the hourly count frame is
    * shaped into [[quantilesContByGroup]]'s contract (group = hour of
    * day, key = hour, value = count), so the quantile machinery and its
    * cross-engine interpolation are the ones already proven. The windowed
    * frame is the calendar-bounded hourly aggregate.
    *
    * Semantics note: the envelope is over hours that HAD events — an
    * hour with zero traffic contributes no row (deliberate: a dead hour
    * is an availability incident, not part of the expected band; zero
    * hours would also be invisible to the oracle's identical
    * construction, so the choice is stated here rather than implied). */
  def trafficEnvelope(events: DataFrame): DataFrame = {
    val hourly = events
      .groupBy((col("ts_sec") - pmod(col("ts_sec"), lit(3600L))).as("hour_sec"))
      .agg(count(lit(1)).cast("double").as("o_totalprice"))
      .select(expr("pmod(hour_sec, 86400) div 3600").as("hod"),
        col("hour_sec").as("o_orderkey"), col("o_totalprice"))
    quantilesContByGroup(hourly, "hod", width = 16.0)
      .select(col("hod"), col("quantile"), col("value").as("events"))
      .orderBy(col("hod"), col("quantile"))
  }

  /** Exact WEIGHTED quantiles — "the price below which half the UNITS
    * (not half the line items) sell": each row counts with integer weight
    * wᵢ, and quantile q selects the first row (in (value, key) order)
    * whose cumulative weight reaches ⌈q·W⌉. The lower weighted quantile —
    * integer thresholds, no interpolation, so selection is bit-exact in
    * any engine.
    *
    * Same no-global-sort machinery as [[quantilesCont]], with weight sums
    * replacing row counts: the bucket histogram aggregates Σw per value
    * bucket (bounded frame — the only unpartitioned window), per-bucket
    * cumulative weights ride a (bucket)-partitioned window, and each
    * quantile's unique CROSSING row (cw − w < T ≤ cw) is a filter — at
    * most |qs| rows reach the final aggregate. At 100 TB: one shuffle on
    * the bucket key, one bounded-histogram window, no sort of the fact
    * table. */
  def weightedQuantiles(lineitem: DataFrame, width: Double = 1000.0,
      qs: Seq[(String, Long, Long)] = Seq(("p25", 1L, 4L), ("p50", 2L, 4L),
        ("p75", 3L, 4L))): DataFrame = {
    // bucket-lane fan-out — same rationale as [[decilesByValue]]
    val rows = Spread.byKey(lineitem.select(
      Cols.cents(col("l_extendedprice")).as("cents"),
      col("l_quantity").cast("long").as("w"),
      col("l_orderkey"), col("l_linenumber"),
      floor(col("l_extendedprice") / width).cast("long").as("bucket")),
      col("bucket"))
    val hist = rows.groupBy(col("bucket")).agg(sum(col("w")).as("bw"))
    val wPrev = Window.orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = hist.select(col("bucket"),
      coalesce(sum(col("bw")).over(wPrev), lit(0L)).as("off"),
      sum(col("bw")).over(Window.partitionBy()).as("wtot"))
    val wBucket = Window.partitionBy(col("bucket"))
      .orderBy(col("cents"), col("l_orderkey"), col("l_linenumber"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = rows.join(broadcast(offsets), Seq("bucket"))
      .select(col("cents"), col("w"), col("wtot"),
        (col("off") + sum(col("w")).over(wBucket)).as("cw"))
    def thr(nu: Long, de: Long) = expr(s"(wtot * $nu + ${de - 1}) div $de")
    val cands = cum.where(qs.map { case (_, nu, de) =>
      col("cw") >= thr(nu, de) && col("cw") - col("w") < thr(nu, de)
    }.reduce(_ || _))
    val sel = cands.agg(
      first(col("wtot")).as("wtot"),
      qs.map { case (label, nu, de) =>
        min(when(col("cw") >= thr(nu, de) && col("cw") - col("w") < thr(nu, de),
          col("cents"))).as(label)
      }: _*)
    qs.map { case (label, _, _) =>
      sel.where(col("wtot").isNotNull).select(lit(label).as("quantile"),
        (col(label).cast("double") / 100.0).as("value"))
    }.reduce(_.unionAll(_)).orderBy(col("quantile"))
  }

  /** [[weightedQuantiles]] of line price weighted by quantity — registered. */
  def quantityWeightedPriceQuantiles(spark: SparkSession, dir: String): DataFrame =
    weightedQuantiles(Tables.lineitem(spark, dir))

  /** Tukey-fence (1.5·IQR) outlier census — the standard distribution-
    * health gate before any mean-based metric is trusted: quartiles come
    * from [[quantilesCont]]'s distributed selection (one 3-row frame,
    * broadcast back), fences are one fixed IEEE expression on them, and
    * the census is a single aggregation pass. Nothing corpus-sized sorts;
    * the quantile stage is the deciles histogram machinery. */
  def iqrOutliers(ordersIn: DataFrame): DataFrame = {
    val qs = quantilesCont(ordersIn)
    val fences = qs.agg(
        min(when(col("quantile") === "p25", col("value"))).as("p25"),
        min(when(col("quantile") === "p75", col("value"))).as("p75"))
      .select(col("p25"), col("p75"),
        (col("p25") - lit(1.5) * (col("p75") - col("p25"))).as("fence_lo"),
        (col("p75") + lit(1.5) * (col("p75") - col("p25"))).as("fence_hi"))
    ordersIn
      .select((Cols.cents(col("o_totalprice")).cast("double") / 100.0).as("v"))
      .crossJoin(broadcast(fences))
      .agg(count(lit(1)).as("orders"),
        first(col("p25")).as("p25"), first(col("p75")).as("p75"),
        first(col("fence_lo")).as("fence_lo"), first(col("fence_hi")).as("fence_hi"),
        Cols.countWhen(col("v") < col("fence_lo")).as("below_fence"),
        Cols.countWhen(col("v") > col("fence_hi")).as("above_fence"))
      .select(col("orders"), col("p25"), col("p75"), col("fence_lo"), col("fence_hi"),
        col("below_fence"), col("above_fence"),
        Cols.pct4(col("below_fence") + col("above_fence"), col("orders")).as("outlier_pct"))
  }

  /** [[iqrOutliers]] over the orders table — the registered form. */
  def orderPriceOutliers(spark: SparkSession, dir: String): DataFrame =
    iqrOutliers(Tables.orders(spark, dir))

  /** One-window ntile spec of [[orderValueDeciles]] — a single-partition
    * sort of every order, which is exactly what must never run at scale.
    * Test-only anchor: the SQL oracle states this form, and OperatorSpec
    * asserts the distributed plan equals it row-for-row. */
  private[graft] def orderValueDecilesNtile(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.orderBy(col("o_totalprice"), col("o_orderkey"))
    Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_totalprice"), ntile(10).over(w).cast("long").as("decile"))
      .groupBy(col("decile"))
      .agg(count(lit(1)).as("orders"),
        Cols.sumDec2(col("o_totalprice")).as("total_value"))
      .orderBy(col("decile"))
  }

  /** Set-operation surface (§2.7 beyond UNION ALL): customers who placed an
    * urgent order but never a low-priority one (EXCEPT), and those who
    * placed both (INTERSECT). Spark plans these as left-anti/left-semi
    * aggregates over distinct keys — same dedup-set semantics as SQL. */
  def prioritySegments(spark: SparkSession, dir: String): DataFrame = {
    val orders = Tables.orders(spark, dir)
    def keysOf(p: String) = orders.where(col("o_orderpriority") === p)
      .select(col("o_custkey")).distinct()
    val urgent = keysOf("1-URGENT")
    val low    = keysOf("5-LOW")
    def summarize(name: String, df: DataFrame) =
      df.agg(count(lit(1)).as("customers"), sum(col("o_custkey")).as("key_checksum"))
        .select(lit(name).as("segment"), col("customers"), col("key_checksum"))
    summarize("urgent_minus_low", urgent.except(low))
      .unionByName(summarize("urgent_and_low", urgent.intersect(low)))
      .orderBy(col("segment"))
  }

  /** Rollup aggregation (subtotals + grand total) over order priority and
    * ship mode proxies — the OLAP grouping-sets surface. Aggregated-out
    * levels are labelled explicitly (coalesce) so ordering and hashing
    * never depend on engine NULL-sort conventions. */
  def orderRollup(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .rollup(col("o_orderpriority"), col("o_orderstatus"))
      .agg(count(lit(1)).as("orders"), Cols.sumDec2(col("o_totalprice")).as("total_value"))
      .select(coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
        coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
        col("orders"), col("total_value"))
      .orderBy(col("priority"), col("status"))

  /** CUBE (§2.4, completes the multi-dimensional family next to
    * [[orderRollup]]'s hierarchy): all 2² grouping-set combinations of
    * (priority, status) in one pass — Spark expands the sets map-side and
    * aggregates them through a single shuffle, which is the scale shape
    * (4 grouping sets multiply the partial-agg rows, never the scan). */
  def orderCube(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .cube(col("o_orderpriority"), col("o_orderstatus"))
      .agg(count(lit(1)).as("orders"), Cols.sumDec2(col("o_totalprice")).as("total_value"))
      .select(coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
        coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
        col("orders"), col("total_value"))
      .orderBy(col("priority"), col("status"))

  /** Explicit GROUPING SETS (completes the multi-dimensional family beyond
    * [[orderRollup]]'s hierarchy and [[orderCube]]'s power set): exactly
    * the marginals — per-priority, per-status, and the grand total — in
    * one pass, skipping the (priority, status) cross CUBE would also pay.
    * Spark's `groupingSets` expands only the requested sets map-side
    * through a single shuffle; `grouping()` disambiguates a real NULL key
    * from a set's "all" slot, which coalesce alone cannot. */
  def orderGroupingSets(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupingSets(
        Seq(Seq(col("o_orderpriority")), Seq(col("o_orderstatus")), Seq()),
        col("o_orderpriority"), col("o_orderstatus"))
      .agg(count(lit(1)).as("orders"), Cols.sumDec2(col("o_totalprice")).as("total_value"),
        // grouping() is only resolvable inside the grouping-sets aggregate
        grouping(col("o_orderpriority")).as("__gp"),
        grouping(col("o_orderstatus")).as("__gs"))
      .select(
        when(col("__gp") === 1, lit("ALL")).otherwise(col("o_orderpriority")).as("priority"),
        when(col("__gs") === 1, lit("ALL")).otherwise(col("o_orderstatus")).as("status"),
        col("orders"), col("total_value"))
      .orderBy(col("priority"), col("status"))

  /** Pivot (§2.4 wide layout): order counts by priority, one column per
    * order status. The status domain is closed and passed explicitly —
    * an unpinned pivot would first run a distinct scan to discover it. */
  def statusPivot(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupBy(col("o_orderpriority"))
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(count(lit(1)))
      .select(col("o_orderpriority"),
        coalesce(col("F"), lit(0L)).as("status_f"),
        coalesce(col("O"), lit(0L)).as("status_o"),
        coalesce(col("P"), lit(0L)).as("status_p"))
      .orderBy(col("o_orderpriority"))

  /** Shared daily aggregate for the time-series queries: exact cents plus
    * order counts per UTC day bucket. */
  private def dailyCents(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupBy((floor(Cols.tsSec(col("o_orderdate")) / 86400.0) * 86400).cast("long").as("day_sec"))
      .agg(count(lit(1)).as("orders"), sum(Cols.cents(col("o_totalprice"))).as("cents"))

  /** Daily revenue with a running cumulative total — the canonical
    * time-series dashboard shape (ROWS running frame over the daily
    * aggregate, so the window input is |days|, not |orders|). */
  def dailyCumulativeRevenue(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.orderBy(col("day_sec")).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    dailyCents(spark, dir).select(col("day_sec"), col("orders"),
        (col("cents").cast("double") / 100.0).as("revenue"),
        (sum(col("cents")).over(w).cast("double") / 100.0).as("cumulative_revenue"))
      .orderBy(col("day_sec"))
  }

  /** Day-over-day revenue movement: previous day's revenue (lag) and the
    * delta, in exact cents until the output edge. Lag/lead over the daily
    * aggregate — |days| window input, same shape as the cumulative series. */
  def dailyRevenueDelta(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.orderBy(col("day_sec"))
    dailyCents(spark, dir).select(col("day_sec"),
        (col("cents").cast("double") / 100.0).as("revenue"),
        (lag(col("cents"), 1).over(w).cast("double") / 100.0).as("prev_revenue"),
        ((col("cents") - lag(col("cents"), 1).over(w)).cast("double") / 100.0).as("delta"))
      .orderBy(col("day_sec"))
  }

  /** Exact per-group percentiles (median/p90 of order value by priority).
    * Spark's exact `percentile` and DuckDB's `quantile_cont` share the
    * standard linear-interpolation definition and agree bit-for-bit on this
    * data (verified at all scale factors); floor quantization adds a safety
    * margin.
    *
    * SMALL-DATA / AUDIT PATH ONLY. Exact `percentile` buffers every value
    * of a group in its aggregation buffer, and a BOUNDED group count makes
    * that WORSE, not safer: 5 priority groups means ~N/5 values
    * concentrated on each of 5 reducers, growing linearly with the data —
    * at 100 TB this OOMs. Per-group cardinality, not group count, is what
    * scales. The registered scale sibling is [[priceQuantilesHist]]
    * (bounded per-group histogram state); [[orderValueDecilesApprox]]'s
    * one-pass sketch is the global-quantile analogue. */
  def priceQuantiles(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupBy(col("o_orderpriority"))
      .agg(
        count(lit(1)).as("orders"),
        Cols.q4(percentile(col("o_totalprice"), lit(0.5))).as("median_price"),
        Cols.q4(percentile(col("o_totalprice"), lit(0.9))).as("p90_price"))
      .orderBy(col("o_orderpriority"))

  /** Scale-path PER-GROUP quantiles (median/p90 of order value by
    * priority) via a fixed-width value histogram — the registered,
    * oracle-checked sibling of [[priceQuantiles]], same doctrine as
    * [[orderValueDecilesHist]] applied per group.
    *
    * Shape: one map-side-combined groupBy on (group, floor(value/width)) —
    * per-group state is bounded by VALUE RANGE / width (a few hundred
    * buckets), independent of row count — then a running-count window over
    * each group's bounded histogram, and each quantile boundary is the
    * first bucket whose cumulative count reaches the integer rank
    * threshold (`2·cum ≥ n` for the median, `10·cum ≥ 9·n` for p90 — both
    * pure integer, so any engine agrees exactly). Boundaries resolve to
    * the bucket edges [lo, hi): deterministic to bucket resolution, no
    * value interpolation, no per-group value buffering anywhere. At
    * 100 TB the only per-row work is the histogram aggregation; the
    * windows and boundary picks touch ≤ |groups|·|buckets| rows. */
  def priceQuantilesHist(spark: SparkSession, dir: String,
                         width: Double = 1000.0): DataFrame = {
    val hist = Tables.orders(spark, dir)
      .groupBy(col("o_orderpriority"),
        floor(col("o_totalprice") / width).cast("long").as("bucket"))
      .agg(count(lit(1)).as("cnt"))
    val wCum = Window.partitionBy(col("o_orderpriority")).orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wGrp = Window.partitionBy(col("o_orderpriority"))
    val cum = hist.select(col("o_orderpriority"), col("bucket"),
      sum(col("cnt")).over(wCum).as("cum"), sum(col("cnt")).over(wGrp).as("n"))
    cum.groupBy(col("o_orderpriority"))
      .agg(
        max(col("n")).as("orders"),
        min(when(lit(2) * col("cum") >= col("n"), col("bucket"))).as("mb"),
        min(when(lit(10) * col("cum") >= lit(9) * col("n"), col("bucket"))).as("pb"))
      .select(col("o_orderpriority"), col("orders"),
        (col("mb").cast("double") * width).as("median_lo"),
        ((col("mb") + 1).cast("double") * width).as("median_hi"),
        (col("pb").cast("double") * width).as("p90_lo"),
        ((col("pb") + 1).cast("double") * width).as("p90_hi"))
      .orderBy(col("o_orderpriority"))
  }

  /** Scale-path percentile: one-pass approximate quantiles, no global sort. */
  def orderValueDecilesApprox(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir).agg(
      percentile_approx(col("o_totalprice"),
        array((1 to 9).map(i => lit(i / 10.0)): _*), lit(10000)).as("deciles"))

  /** Scale-path deciles via a fixed-width value histogram — the registered,
    * oracle-checked alternative to [[orderValueDeciles]]'s global ntile.
    *
    * Shape: one map-side-combined groupBy on `floor(value/width)` (histogram
    * size is bounded by the VALUE RANGE / width — a few hundred buckets —
    * independent of row count), a running-sum window over that bounded
    * histogram, then each decile boundary is the first bucket whose
    * cumulative count reaches ceil(i·n/10). The rank test is pure integer
    * (`10·cum ≥ i·n` ⟺ `cum ≥ ⌈i·n/10⌉` for integral cum), so both engines
    * agree exactly; the boundary is resolved to the bucket edges
    * [lo, hi) — deterministic to bucket resolution, no value interpolation.
    * At 100 TB: the only per-row work is the histogram aggregation; windows
    * and the 9-threshold range join touch ≤ |buckets| rows. */
  def orderValueDecilesHist(spark: SparkSession, dir: String,
                            width: Double = 1000.0): DataFrame = {
    val hist = Tables.orders(spark, dir)
      .groupBy(floor(col("o_totalprice") / width).cast("long").as("bucket"))
      .agg(count(lit(1)).as("cnt"))
    val wCum = Window.orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy()
    val cum = hist.select(col("bucket"),
      sum(col("cnt")).over(wCum).as("cum"), sum(col("cnt")).over(wAll).as("n"))
    val deciles = spark.range(1, 10).select(col("id").as("decile"))
    deciles.join(cum, lit(10) * col("cum") >= col("decile") * col("n"))
      .groupBy(col("decile"))
      .agg(min(col("bucket")).as("bucket"))
      .select(col("decile"),
        (col("bucket").cast("double") * width).as("value_lo"),
        ((col("bucket") + 1).cast("double") * width).as("value_hi"))
      .orderBy(col("decile"))
  }
}
