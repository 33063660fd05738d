package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.functions.Cols

/** Data-quality checks — the reference declares "Data quality checks" and
  * "Data validation and schema enforcement" as capabilities
  * (/root/reference/PROJECT_SUMMARY.md:36,47) but ships no implementation;
  * this operator realizes them as a single-pass validation report.
  *
  * One whole-table aggregation (conditional counts — A2 machinery), emitted
  * in a tall (check_name, violations, total, violation_pct) layout. At
  * 100 TB this is exactly one scan with map-side partial aggregation; checks
  * compose as columns, not extra passes.
  */
object DataQuality {

  /** Validation report for the generic events table. */
  def eventsReport(events: DataFrame): DataFrame = {
    val validTypes = Seq("view", "click", "purchase", "signup", "error")
    val checks: Seq[(String, org.apache.spark.sql.Column)] = Seq(
      "null_event_id"    -> col("event_id").isNull,
      "null_user_id"     -> col("user_id").isNull,
      "null_ts"          -> col("ts").isNull,
      "invalid_type"     -> !col("event_type").isin(validTypes: _*),
      "negative_value"   -> (col("value") < 0),
      "unparseable_props" -> get_json_object(col("props"), "$.k").isNull,
      "ts_before_2020"   -> (col("ts_sec") < lit(1577836800L)),
      "duplicate_event_id" -> lit(false)) // counted separately below
    val aggCols = countDistinct(col("event_id")).as("distinct_ids") +:
      checks.map { case (n, c) => Cols.countWhen(c).as(n) }
    val wide = events.agg(count(lit(1)).as("total"), aggCols: _*)
    val stacked = checks.map(_._1).filterNot(_ == "duplicate_event_id")
      .map(n => s"'$n', $n").mkString(", ")
    wide
      .withColumn("duplicate_event_id", col("total") - col("distinct_ids"))
      .selectExpr("total",
        s"stack(${checks.size}, $stacked, 'duplicate_event_id', duplicate_event_id) as (check_name, violations)")
      .select(col("check_name"), col("violations"),
        col("total"), Cols.pct4(col("violations"), col("total")).as("violation_pct"))
      .orderBy(col("check_name"))
  }

  /** Order-independent table checksum over an explicit canonical key list —
    * the cross-engine / cross-cluster migration validator: run it on both
    * sides of a copy (or before/after a rewrite) and compare one row.
    *
    * Each row renders its listed columns to a canonical '|'-joined string
    * (the caller chooses renderings that are engine-stable: longs, strings,
    * integer cents — never raw doubles; NULLs render as an explicit
    * sentinel, because silently skipping them would collapse distinct rows
    * like (1, NULL, 'x') and (1, 'x', NULL) into one hash), hashes it with
    * the portable 48-bit md5, and the table reduces by count + bit_xor +
    * min + max of the row hashes. XOR/min/max/count are commutative, associative and
    * overflow-free, so the digest is independent of row order, partitioning
    * and engine, at any scale (a SUM digest would overflow 64-bit wraparound
    * differently per engine). Caveat, as with any XOR digest: an even
    * number of IDENTICAL rows cancels out of the xor lane — the count and
    * min/max lanes still move, and fully duplicate rows should be rare in
    * keyed tables.
    *
    * One scan, map-side-combined — the cheapest full-table integrity check
    * that exists at 100 TB. */
  def tableChecksum(df: DataFrame, canonicalCols: Seq[org.apache.spark.sql.Column]): DataFrame =
    df.select(Dedup.PortableHash(concat_ws("|",
        canonicalCols.map(c => coalesce(c.cast("string"), lit("\u0001NULL"))): _*)).as("h"))
      .agg(
        count(lit(1)).as("rows"),
        bit_xor(col("h")).as("xor_digest"),
        min(col("h")).as("min_hash"),
        max(col("h")).as("max_hash"))

  /** Range-level Merkle census — [[tableChecksum]] split over `buckets`
    * CONTIGUOUS key ranges, the anti-entropy structure replica repair
    * actually uses: compare per-range digests first, recurse only into the
    * ranges that differ instead of re-hashing 100 TB on both sides. Range
    * width is `(max_key div buckets) + 1` from a broadcast 1-row max (a
    * metadata lookup at scale), so ranges are stable for a given key
    * domain; each range row carries its observed [key_lo, key_hi], row
    * count and xor digest. Same commutative digest lanes as the global
    * checksum — order/partitioning/engine independent. One scan, map-side
    * combined, bounded output. */
  def rangeChecksums(df: DataFrame, keyCol: org.apache.spark.sql.Column,
                     canonicalCols: Seq[org.apache.spark.sql.Column],
                     buckets: Int = 64): DataFrame = {
    require(buckets >= 1)
    val mx = df.agg(max(keyCol).as("__mk"))
    df.select(keyCol.as("__k"),
        Dedup.PortableHash(concat_ws("|",
          canonicalCols.map(c => coalesce(c.cast("string"), lit("\u0001NULL"))): _*)).as("h"))
      .crossJoin(broadcast(mx))
      .withColumn("range_id", expr(s"__k div ((__mk div $buckets) + 1L)"))
      .groupBy(col("range_id"))
      .agg(min(col("__k")).as("key_lo"), max(col("__k")).as("key_hi"),
        count(lit(1)).as("rows"),
        bit_xor(col("h")).as("xor_digest"))
      .orderBy(col("range_id"))
  }

  /** Validation report for the documents corpus. */
  def documentsReport(docs: DataFrame): DataFrame = {
    val checks: Seq[(String, org.apache.spark.sql.Column)] = Seq(
      "null_text"     -> col("text").isNull,
      "empty_text"    -> (length(col("text")) === 0),
      "nchar_mismatch" -> (col("n_chars") =!= length(col("text"))),
      "unknown_lang"  -> !col("lang").isin("en", "es", "de", "fr", "zh"))
    val wide = docs.agg(count(lit(1)).as("total"),
      checks.map { case (n, c) => Cols.countWhen(c).as(n) }: _*)
    val stacked = checks.map(_._1).map(n => s"'$n', $n").mkString(", ")
    wide
      .selectExpr("total", s"stack(${checks.size}, $stacked) as (check_name, violations)")
      .select(col("check_name"), col("violations"),
        col("total"), Cols.pct4(col("violations"), col("total")).as("violation_pct"))
      .orderBy(col("check_name"))
  }

  /** Referential-integrity audit across the star schema: for each foreign
    * key, the child row count and how many child rows reference a missing
    * parent. Orphans come from LEFT ANTI joins — at scale each is one
    * shuffle (or a broadcast when the parent is a dimension), never a
    * full outer materialization — and the report is one bounded row per
    * relationship. The healthy-corpus expectation is all zeros; the query
    * exists so a pipeline can ASSERT that instead of assuming it. */
  def fkIntegrity(spark: org.apache.spark.sql.SparkSession, dir: String): DataFrame = {
    import graft.sources.Tables
    def check(name: String, child: DataFrame, childKey: String,
              parent: DataFrame, parentKey: String): DataFrame =
      // pure plan, no driver action: left join onto the DISTINCT parent key
      // set (a PK, so distinct is a no-op guard against multiplication),
      // count misses in the same aggregation as the total. A NULL foreign
      // key is standard-SQL exempt (MATCH SIMPLE): it references nothing,
      // so it is not an orphan — only non-null keys missing a parent count
      child.select(col(childKey))
        .join(parent.select(col(parentKey).as(childKey), lit(1L).as("__hit")).distinct(),
          Seq(childKey), "left")
        .agg(count(lit(1)).as("child_rows"),
          Cols.countWhen(col(childKey).isNotNull && col("__hit").isNull).as("orphans"))
        .select(lit(name).as("relationship"), col("child_rows"), col("orphans"))
    check("lineitem.l_orderkey -> orders", Tables.lineitem(spark, dir), "l_orderkey",
        Tables.orders(spark, dir), "o_orderkey")
      .unionAll(check("lineitem.l_partkey -> part", Tables.lineitem(spark, dir), "l_partkey",
        Tables.part(spark, dir), "p_partkey"))
      .unionAll(check("lineitem.l_suppkey -> supplier", Tables.lineitem(spark, dir), "l_suppkey",
        Tables.supplier(spark, dir), "s_suppkey"))
      .unionAll(check("orders.o_custkey -> customer", Tables.orders(spark, dir), "o_custkey",
        Tables.customer(spark, dir), "c_custkey"))
      .unionAll(check("supplier.s_nationkey -> nation", Tables.supplier(spark, dir), "s_nationkey",
        Tables.nation(spark, dir), "n_nationkey"))
      .orderBy(col("relationship"))
  }

  /** k-anonymity census over a quasi-identifier tuple — the privacy audit
    * a dataset needs BEFORE it ships as training data: group rows into
    * equivalence classes on the quasi identifiers (here nation ×
    * market segment × coarse balance band — the kind of "harmless"
    * demographics that re-identify when combined) and band the class
    * sizes. A k=1 class is a uniquely re-identifiable row; the k ≥ 10
    * band is what most disclosure policies require. One hash aggregation
    * to the class frame (bounded by the quasi-value cross product), one
    * more to the four bands. */
  def kAnonymityCensus(customer: DataFrame): DataFrame = {
    import graft.functions.Cols
    val classes = customer.groupBy(col("c_nationkey"), col("c_mktsegment"),
        floor(col("c_acctbal") / 1000.0).cast("long").as("bal_band"))
      .agg(count(lit(1)).as("k"))
    val banded = classes.withColumn("band",
      when(col("k") === 1, "k=1 identifiable")
        .when(col("k") <= 4, "k=2-4")
        .when(col("k") <= 9, "k=5-9")
        .otherwise("k>=10"))
    val tot = classes.agg(sum(col("k")).as("tot"))
    banded.groupBy(col("band"))
      .agg(count(lit(1)).as("classes"), sum(col("k")).as("rows"))
      .crossJoin(broadcast(tot))
      .select(col("band"), col("classes"), col("rows"),
        Cols.pct4(col("rows"), col("tot")).as("rows_pct"))
      .orderBy(col("band"))
  }

  /** l-diversity census — the second privacy gate behind
    * [[kAnonymityCensus]]: k-anonymity bounds how many rows share a
    * quasi-identifier tuple, but a class where every member carries the
    * SAME sensitive value still discloses it (the homogeneity attack —
    * Machanavajjhala 2006). Here the quasi identifiers are nation ×
    * coarse balance band and the sensitive attribute is the market
    * segment: per equivalence class, l = distinct sensitive values, and
    * the classes band into l ≤ 1 (homogeneous — disclosed), l = 2, and
    * l ≥ 3 (what distinct-l-diversity policies require). An all-null
    * sensitive column counts l = 0 and lands in the disclosed band.
    *
    * Shape: one hash aggregation to the class frame (bounded by the
    * quasi-value cross product), one more to the three bands — the
    * [[kAnonymityCensus]] plan with a count-distinct added to stage 1. */
  def lDiversityCensus(customer: DataFrame): DataFrame = {
    import graft.functions.Cols
    val classes = customer.groupBy(col("c_nationkey"),
        floor(col("c_acctbal") / 1000.0).cast("long").as("bal_band"))
      .agg(count(lit(1)).as("k"), countDistinct(col("c_mktsegment")).as("l"))
    val banded = classes.withColumn("band",
      when(col("l") <= 1, "l<=1 homogeneous")
        .when(col("l") === 2, "l=2")
        .otherwise("l>=3"))
    val tot = classes.agg(sum(col("k")).as("tot"))
    banded.groupBy(col("band"))
      .agg(count(lit(1)).as("classes"), sum(col("k")).as("rows"),
        min(col("l")).as("min_l"))
      .crossJoin(broadcast(tot))
      .select(col("band"), col("classes"), col("rows"), col("min_l"),
        Cols.pct4(col("rows"), col("tot")).as("rows_pct"))
      .orderBy(col("band"))
  }

  /** t-closeness census — the third privacy gate, completing the
    * k-anonymity → l-diversity → t-closeness ladder (Li 2007):
    * l-diversity counts DISTINCT sensitive values per class, but a class
    * can carry 3 distinct segments at 98/1/1 % and still disclose; the
    * t-closeness question is how far each class's sensitive DISTRIBUTION
    * sits from the corpus-wide one. Distance is total variation
    * (t = ½ Σ_v |p_class(v) − p_global(v)|), the categorical-attribute
    * form of the paper's EMD.
    *
    * Exactness: the TV numerator is Σ|cv·N − gv·k| over the COMPLETED
    * class×value grid (absent values contribute their full |0 − gv·k|
    * mass — the [[graft.operators.EventAnalytics.typeMixDrift]] grid
    * rule) in exact DECIMAL(38,0) lanes; ONE double division by 2·k·N per
    * class, floor-quantized. Null sensitive values are filtered up front
    * in both engine and oracle (the typeMixDrift null doctrine — a null
    * segment is a missing measurement, not a disclosure category).
    *
    * Shape: one hash agg to the (class, value) cell frame (bounded by the
    * quasi-value cross product × |segments|), the dense grid via an
    * enum-bounded broadcast cross join, one more agg per class, one to the
    * three policy bands. */
  def tClosenessCensus(customer: DataFrame): DataFrame = {
    val dec = DecimalType(38, 0)
    val cells = customer
      .where(col("c_mktsegment").isNotNull)
      .groupBy(col("c_nationkey"),
        floor(col("c_acctbal") / 1000.0).cast("long").as("bal_band"),
        col("c_mktsegment").as("seg"))
      .agg(count(lit(1)).as("cv"))
      .localCheckpoint() // three consumers: class sizes, value totals, grid
    val classes = cells.groupBy(col("c_nationkey"), col("bal_band"))
      .agg(sum(col("cv")).as("k"))
    val gvals = cells.groupBy(col("seg")).agg(sum(col("cv")).as("gv"))
    val n = cells.agg(coalesce(sum(col("cv")), lit(0L)).as("nn"))
    val grid = classes.crossJoin(broadcast(gvals))
      .join(cells, Seq("c_nationkey", "bal_band", "seg"), "left")
      .select(col("c_nationkey"), col("bal_band"), col("k"), col("gv"),
        coalesce(col("cv"), lit(0L)).as("cv"))
      .crossJoin(broadcast(n))
    val perClass = grid.groupBy(col("c_nationkey"), col("bal_band"))
      .agg(max(col("k")).as("k"), max(col("nn")).as("nn"),
        sum(abs(col("cv").cast(dec) * col("nn").cast(dec)
          - col("gv").cast(dec) * col("k").cast(dec))).as("tvnum"))
      .select(col("k"),
        Cols.q4(col("tvnum").cast("double")
          / (lit(2.0) * col("k").cast("double") * col("nn").cast("double")))
          .as("t"))
    val banded = perClass.withColumn("band",
      when(col("t") <= 0.2, "t<=0.2 close")
        .when(col("t") <= 0.4, "t<=0.4")
        .otherwise("t>0.4 divergent"))
    val tot = perClass.agg(coalesce(sum(col("k")), lit(0L)).as("tot"))
    banded.groupBy(col("band"))
      .agg(count(lit(1)).as("classes"), sum(col("k")).as("rows"),
        max(col("t")).as("max_t"))
      .crossJoin(broadcast(tot))
      .select(col("band"), col("classes"), col("rows"), col("max_t"),
        Cols.pct4(col("rows"), col("tot")).as("rows_pct"))
      .orderBy(col("band"))
  }

  /** Order↔lineitem reconciliation census — the cross-table totals audit
    * every warehouse runs between a header table and its detail table:
    * per-order Σ(l_extendedprice) against o_totalprice, bucketed by the
    * integer ratio band ⌊100·header/detail⌋ div 25 (exact cross-
    * multiplied integers — no division on the hot path), with orphan
    * headers (no detail rows) and orphan details (no header) as their own
    * lanes. On this synthetic fixture the identity deliberately does NOT
    * hold (the generator prices headers independently) — the census
    * REPORTS that honestly, which is exactly what a reconciliation audit
    * is for.
    *
    * Shape: one detail-side hash agg to per-order sums, one big-big
    * shuffle join on the order key (the [[Relational.fulfillmentLatency]]
    * posture — degrades to zero-shuffle under at-rest bucketing), one
    * bounded band census. */
  def orderReconciliation(spark: org.apache.spark.sql.SparkSession,
                          dir: String): DataFrame = {
    import graft.functions.Cols
    val orders = graft.sources.Tables.orders(spark, dir)
      .select(col("o_orderkey"), Cols.cents(col("o_totalprice")).as("hc"))
    val items = graft.sources.Tables.lineitem(spark, dir)
      .groupBy(col("l_orderkey"))
      .agg(sum(Cols.cents(col("l_extendedprice"))).as("dc"),
        count(lit(1)).as("items"))
    val joined = orders.join(items,
      col("o_orderkey") === col("l_orderkey"), "full_outer")
    val band = when(col("hc").isNull, lit("orphan_detail"))
      .when(col("dc").isNull, lit("orphan_header"))
      .otherwise(concat(lit("ratio_"),
        lpad((least(expr("(100 * hc) div dc"), lit(999L))
          - pmod(least(expr("(100 * hc) div dc"), lit(999L)), lit(25L)))
          .cast("string"), 4, "0")))
    joined.groupBy(band.as("band"))
      .agg(count(lit(1)).as("orders"),
        coalesce(sum(col("items")), lit(0L)).as("line_items"),
        (coalesce(sum(col("hc")), lit(0L)).cast("double") / 100.0).as("header_total"),
        (coalesce(sum(col("dc")), lit(0L)).cast("double") / 100.0).as("detail_total"))
      .orderBy(col("band"))
  }
}
