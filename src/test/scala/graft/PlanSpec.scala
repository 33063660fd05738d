package graft

import org.apache.spark.sql.DataFrame

import graft.operators._
import graft.sources.Tables

/** Plan-shape assertions — the 100 TB design contract (broadcasts chosen,
  * filters pushed to parquet, codegen engaged). These fail if a refactor
  * silently degrades the physical plan even though results stay correct. */
class PlanSpec extends SparkSpec {

  private def planOf(df: DataFrame, mode: String = "formatted"): String = {
    val out = new java.io.ByteArrayOutputStream()
    Console.withOut(new java.io.PrintStream(out)) { df.explain(mode) }
    out.toString
  }

  test("dimension joins broadcast (no shuffle of the fact side)") {
    val p = planOf(Relational.revenueByRegion(spark, sf))
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), "star joins must not sort-merge: \n" + p)
  }

  test("semi/anti joins plan as join types, not distinct+join") {
    assert(planOf(Relational.customersWithOrders(spark, sf)).contains("LeftSemi"))
    assert(planOf(Relational.customersWithoutBigOrders(spark, sf)).contains("LeftAnti"))
  }

  test("Q6 forecast pushes all three predicates into the parquet scan") {
    val p = planOf(Relational.forecastRevenue(spark, sf))
    for (f <- Seq("GreaterThanOrEqual(l_shipdate", "LessThan(l_shipdate",
        "GreaterThanOrEqual(l_discount,0.05)", "LessThanOrEqual(l_discount,0.07)",
        "LessThan(l_quantity,24.0)"))
      assert(p.contains(f), s"missing pushed filter $f in:\n$p")
  }

  test("pricing summary pushes the shipdate filter into the parquet scan") {
    val p = planOf(Relational.pricingSummary(Tables.lineitem(spark, sf)))
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"), p)
  }

  test("scans prune columns (hourly metrics reads only what it needs)") {
    val p = planOf(EventAnalytics.hourlyMetrics(Tables.events(spark, sf)))
    val read = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(read.contains("ts") && read.contains("event_type") && read.contains("value"))
    assert(!read.contains("props"), s"props must be pruned from the scan: $read")
  }

  test("top-k plans as TakeOrderedAndProject, not a global sort") {
    val p = planOf(Relational.topOrdersByRevenue(spark, sf))
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("Lloyd-refined PQ keeps the heap-aggregate ADC plan: no ranking window") {
    val emb = Tables.embeddings(spark, sf)
    val p = planOf(Quantize.pqKmeansTopK(emb, emb.where(
      org.apache.spark.sql.functions.col("vec_id") < 5), 5))
    // refinement must only change codebook VALUES, not the query plan
    // shape: ADC ranks through the bounded TopKAggregate heap, and both
    // the codebook and LUT arrive broadcast
    assert(!p.contains("Window"), s"ADC stage must not rank via window:\n$p")
    assert(p.contains("BroadcastHashJoin"), s"LUT/codebook joins must broadcast:\n$p")
  }

  test("sliding KMV DAU: sketch merge rides equi/semi joins on day_sec — no cartesian") {
    val p = planOf(HeavyHitters.slidingDauKmv(Tables.events(spark, sf)))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"the sketch-merge lane must never cartesian:\n$p")
  }

  test("source vocab jaccard: pair generation is a token equi-join, never a cartesian") {
    val p = planOf(TextAnalysis.sourceVocabJaccard(Tables.documents(spark, sf)))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"the source-pair intersection must shuffle on token:\n$p")
  }

  test("type-mix drift: no cartesian beyond the broadcast type grid; lag windows partition by type") {
    val p = planOf(EventAnalytics.typeMixDrift(Tables.events(spark, sf)))
    // the dense day×type grid is an intended broadcast of the bounded type
    // list (BroadcastNestedLoopJoin over ~5 rows); a CartesianProduct —
    // the unbroadcast shuffle variant — would mean the hint regressed
    assert(!p.contains("CartesianProduct"), s"the type grid must broadcast:\n$p")
  }

  test("fuzzy decontamination plans as bounded equi-joins: no cartesian") {
    val p = planOf(CorpusFilters.fuzzyDecontaminationProfile(
      Tables.documents(spark, sf)))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"bipartite LSH decontamination must not plan a cartesian:\n$p")
  }

  test("sliding DAU is window-free: coverage replication, joins and aggs only") {
    val p = planOf(EventAnalytics.slidingActiveUsers(Tables.events(spark, sf)))
    assert(!p.contains("Window"), s"sliding distinct count must not window:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("LSH recall audit is cartesian-free: blocked equi-join, no crossJoin") {
    // the registered audit samples the corpus and computes exact pairs via
    // the triangle-blocked equi-join — the suite must contain NO
    // corpus×corpus cartesian anywhere
    val p = planOf(Similarity.lshRecallAudit(Tables.embeddings(spark, sf)))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"recall audit must not plan a cartesian:\n$p")
  }

  test("pareto front plans threshold equi-joins, not the oracle's quadratic NOT EXISTS") {
    val p = planOf(Skyline.partParetoFront(spark, sf))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"skyline must join on x, never all-pairs:\n$p")
  }

  test("typo recovery joins on deletion-neighborhood variants, never all-pairs") {
    val p = planOf(TextAnalysis.typoRecoveryCensus(Tables.documents(spark, sf)))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"edit-distance join must equi-join on variants:\n$p")
  }

  test("linear attribution: touch join is a (user, cell) equi-join, never a time-range nested loop") {
    val p = planOf(Attribution.linearCreditByHour(Tables.events(spark, sf)))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"attribution must grid-join, not range-scan all pairs:\n$p")
  }

  test("association rules: basket pair join is an equi-join on user_id, no cartesian") {
    val p = planOf(EventAnalytics.associationRules(Tables.events(spark, sf)))
    assert(!p.contains("CartesianProduct"), s"pair join must shuffle on user_id:\n$p")
    // the only nested-loop is the blessed 1-row scalar broadcast (n_baskets);
    // the item-pair join itself must be hash/merge on user_id
    val bnlj = "BroadcastNestedLoopJoin".r.findAllIn(p).size
    assert(bnlj <= 2, s"only the scalar n_baskets frame may nested-loop:\n$p")
  }

  test("phrase census: every term filters at the scan and joins on (doc, pos) — no body regex, no cartesian") {
    val p = planOf(TextAnalysis.phraseCensus(Tables.documents(spark, sf)))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"phrase terms must equi-join on (doc_id, pos):\n$p")
  }

  test("aggregations are whole-stage codegen'd") {
    // codegen stages exist only in the AQE-finalized plan → execute first
    val df = EventAnalytics.hourlyMetrics(Tables.events(spark, sf))
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("*("), p) // '*' prefix marks whole-stage-codegen'd operators
  }

  test("as-of join costs two exchanges: right pre-agg + one window shuffle") {
    import org.apache.spark.sql.functions.col
    val events = Tables.events(spark, sf)
    val views = events.where(col("event_type") === "view")
      .select(col("user_id"), col("ts_sec"), col("event_id").as("view_id"))
    val purchases = events.where(col("event_type") === "purchase")
      .select(col("user_id"), col("ts_sec"), col("event_id"))
    val p = planOf(AsOfJoin.asOfBackward(purchases, views, Seq("user_id"), "ts_sec", Seq("view_id")))
    val exchanges = "\\(\\d+\\) Exchange".r.findAllIn(p).size
    assert(exchanges == 2, s"expected right-agg + window shuffles only, got $exchanges:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("kmeans index is materialized; query plan windows are the two rank stages only") {
    import org.apache.spark.sql.functions.col
    // the refined index is collected per Lloyd round (standard distributed
    // k-means), so the centroid table arrives as a broadcast-ready local
    // relation with no lineage to replay
    val cents = planOf(Similarity.kmeansCentroids(Tables.embeddings(spark, sf), 16, 1))
    assert(cents.contains("LocalTableScan"), cents)
    assert(!cents.contains("Window"), s"materialized index must carry no lineage:\n$cents")
    // the search itself: cell assignment is a HashAggregate argmax (never a
    // ranking window); the only Windows are the probe rank and final top-k
    val emb = Tables.embeddings(spark, sf)
    val p = planOf(Similarity.ivfKmeansTopK(emb, emb.where(col("vec_id") < 5), 5))
    // \b excludes WindowGroupLimit (the rank-limit pushdown helper nodes)
    val windows = "\\(\\d+\\) Window\\b".r.findAllIn(p).size
    assert(windows == 2, s"expected probe-rank + top-k windows only, got $windows:\n$p")
    // max-over-struct argmax plans as SortAggregate (struct types are not
    // hash-aggregable) — still a partial-combining aggregate, never a window
    assert(p.contains("SortAggregate") || p.contains("HashAggregate"), p)
  }

  test("IVF index build never funnels through a single partition") {
    import org.apache.spark.sql.functions.col
    // seed selection is one hash-bucket aggregation: no window, no
    // SinglePartition exchange anywhere (the former every-⌈N/k⌉-th-rank rule
    // needed a one-task global row_number — the 100 TB killer)
    val emb = Tables.embeddings(spark, sf)
    val seeds = planOf(Similarity.seedCentroids(emb, 16))
    assert(!seeds.contains("Window"), s"seed build must not window:\n$seeds")
    assert(!seeds.contains("SinglePartition"), seeds)
    val p = planOf(Similarity.ivfTopK(emb, emb.where(col("vec_id") < 5), 5))
    assert(!p.contains("SinglePartition"), s"IVF query plan funnels to one task:\n$p")
  }

  test("near-dup cosine plans as bucket equi-joins, never a cartesian") {
    val p = planOf(Similarity.nearDupCosineLsh(Tables.embeddings(spark, sf), 0.4))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"near-dup must join on LSH buckets:\n$p")
  }

  test("purchase-context range frames cost one exchange plus the output sort") {
    val p = planOf(EventAnalytics.purchaseContext(Tables.events(spark, sf)))
    val exchanges = "\\(\\d+\\) Exchange".r.findAllIn(p).size
    assert(exchanges <= 2, s"window + output sort only, got $exchanges:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("sessionization uses a single exchange for both window functions") {
    val p = planOf(operators.Sessionize.withSessionId(Tables.events(spark, sf)))
    // count Exchange nodes in the plan tree (the '(n) Exchange' detail headers)
    val exchanges = "\\(\\d+\\) Exchange".r.findAllIn(p).size
    assert(exchanges == 1, s"expected one shuffle, got $exchanges:\n$p")
  }

  test("deterministic sampling is a pure scan-side filter — no shuffle before the agg") {
    val p = planOf(Sampling.hashSample(Tables.documents(spark, sf),
      org.apache.spark.sql.functions.col("doc_id"), 1, 5))
    assert(!p.contains("Exchange"), s"hash sampling must not shuffle:\n$p")
    assert(p.contains("Filter"), p)
  }

  test("jaccard prefix join: hash-keyed equi-join candidates, no cartesian, no global sort") {
    val p = planOf(Dedup.jaccardJoinPrefix(Tables.documents(spark, sf), 1, 2))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"candidates must come from the prefix equi-join:\n$p")
    // the candidate self-join keys on the 64-bit shingle hash, not the string
    val joinKeyLines = p.linesIterator.filter(_.contains("Join condition")).toSeq
    assert(p.contains("h#") || joinKeyLines.nonEmpty, p)
    // the only Sort allowed below the output orderBy is per-doc array_sort
    // (an expression, not an operator) — no global Sort over the corpus
    val sorts = "\\(\\d+\\) Sort\\b".r.findAllIn(p).size
    assert(sorts <= 1, s"expected at most the output sort, got $sorts:\n$p")
  }

  test("containment join: posting-list equi-join candidates, no cartesian, one output sort") {
    val p = planOf(Dedup.containmentJoinPrefix(Tables.documents(spark, sf), 4, 5))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"candidates must come from the prefix-vs-posting-list equi-join:\n$p")
    val sorts = "\\(\\d+\\) Sort\\b".r.findAllIn(p).size
    assert(sorts <= 1, s"expected at most the output sort, got $sorts:\n$p")
  }

  test("cluster survivors: broadcast quality join, no cartesian, bounded exchanges") {
    import org.apache.spark.sql.functions.col
    val docs = Tables.documents(spark, sf)
    val clusters = Dedup.dedupClusters(
      Dedup.jaccardJoinPrefix(docs, 1, 2).select(col("doc_a"), col("doc_b")))
    val p = planOf(Dedup.clusterSurvivors(clusters, TextAnalysis.qualityUnits(docs)))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    // cluster assignment (small by construction) joins quality per doc;
    // then one aggregation exchange and the output sort — nothing more
    val exchanges = "\\(\\d+\\) Exchange".r.findAllIn(p).size
    assert(exchanges <= 3, s"join + agg + output sort only, got $exchanges:\n$p")
  }

  test("span dedup remediation: equi-joins only, per-doc windows, no global structure") {
    val p = planOf(CorpusFilters.spanDedupProfile(Tables.documents(spark, sf), 50))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"keeper stats must equi-join on the span key:\n$p")
    // island merging partitions by doc_id — a window over nothing would
    // funnel every removal range through one task
    assert(!p.contains("SinglePartition"), s"windows must partition by doc:\n$p")
  }

  test("contamination joins on n-grams — never a cartesian") {
    val p = planOf(CorpusFilters.contaminationProfile(Tables.documents(spark, sf), 20, 5))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"contamination must equi-join on shingle:\n$p")
  }

  test("token packing windows per stratum — no single-partition global sort") {
    val p = planOf(CorpusFilters.tokenPackingProfile(Tables.documents(spark, sf), 2000))
    assert(p.contains("Window"), p)
    // a global window would hashpartition by nothing / SinglePartition
    assert(!p.contains("SinglePartition"), s"window must partition by source:\n$p")
  }

  test("mixture weights broadcast the one-row global aggregate") {
    val p = planOf(CorpusFilters.mixtureWeights(Tables.documents(spark, sf)))
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      s"global totals must broadcast:\n$p")
  }

  test("redaction is projection-only — rides the scan with zero exchanges before the agg") {
    val p = planOf(operators.Redact.eventsProfile(Tables.events(spark, sf)))
    val exchanges = "\\(\\d+\\) Exchange".r.findAllIn(p).size
    assert(exchanges <= 2, s"redact profile = scan → partial agg → final agg → sort:\n$p")
  }

  test("salted join shuffles on (key, salt) and never broadcasts the replicated side") {
    import org.apache.spark.sql.functions.col
    val li = Tables.lineitem(spark, sf).withColumn("p_partkey", col("l_partkey"))
    val p = planOf(Skew.saltedJoin(li, Tables.part(spark, sf), Seq("p_partkey"),
      col("l_orderkey") * 10 + col("l_linenumber"), 16))
    assert(!p.contains("BroadcastHashJoin"),
      s"replicated side must not broadcast (that would defeat the salting):\n$p")
    assert(p.contains("_salt"), p)
    val partLine = p.linesIterator.find(l =>
      l.contains("hashpartitioning") && l.contains("_salt")).getOrElse("")
    assert(partLine.nonEmpty, s"join exchange must hash on the salt too:\n$p")
  }

  test("native as-of join executes with one exchange per side under AQE") {
    // the operator's scaladoc promise: each child is hash-clustered on the
    // key and sorted (key, ts) — the same requirement a sort-merge join
    // declares — so the EXECUTED plan (AQE on, the default) must contain
    // exactly two shuffles and no more; a regression in the
    // requiredChildDistribution/Ordering plumbing would show up here
    val df = AsOfJoin.purchaseAttributionNative(Tables.events(spark, sf))
    df.collect()
    val p = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(exchanges == 2, s"expected one hash exchange per side, got $exchanges:\n$p")
    assert(!p.contains("SinglePartition") || p.contains("TakeOrderedAndProject"),
      s"as-of children must never funnel to one task:\n$p")
  }

  test("order deciles rank per bucket — no ntile, per-row window never single-partition") {
    val p = planOf(Relational.orderValueDeciles(spark, sf))
    // the registered decile plan must not contain a global ntile window (a
    // single-partition sort of every order — the 100 TB killer this plan
    // replaced); the only global windows allowed are over the bounded
    // histogram, and the per-row ranking must partition by bucket
    assert(!p.contains("ntile"), s"registered deciles must not plan a global ntile:\n$p")
    // formatted Window arguments render as [functions], [partition], [order]
    val rowNumLine = p.linesIterator.find(_.contains("row_number")).getOrElse("")
    assert(rowNumLine.contains("windowspecdefinition(bucket#") && rowNumLine.contains("], [bucket#"),
      s"per-row rank window must partition by bucket:\n$rowNumLine\n$p")
    // offsets come back as a broadcast — the fact side is never shuffled
    // for the offset join
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("per-group price quantiles (hist) buffer no values — bounded histogram state only") {
    val p = planOf(Relational.priceQuantilesHist(spark, sf))
    // the scale sibling must never plan Spark's exact `percentile` (which
    // buffers every group value in the aggregation buffer — the 100 TB
    // killer q_price_quantiles keeps only as a small-data oracle anchor)
    assert(!p.toLowerCase.contains("percentile"), s"hist quantiles must not buffer values:\n$p")
    // the running-count window rides the bounded per-group histogram and
    // must partition by the group key, never collapse to a single task
    val cumLine = p.linesIterator.find(_.contains("windowspecdefinition")).getOrElse("")
    assert(cumLine.contains("o_orderpriority#"),
      s"cumulative window must partition by priority:\n$cumLine\n$p")
    assert(!p.contains("SinglePartition"), s"bounded windows must stay per-group:\n$p")
  }

  test("exact knn baseline is the BROADCAST nested-loop variant, never a shuffle NLJ") {
    import org.apache.spark.sql.functions.col
    // topKCosine is the documented exact baseline: tiny query set × streamed
    // corpus. The pairing must plan as a broadcast of the query side — a
    // config drift that degrades it to a cartesian/shuffle pairing would
    // re-shuffle the 100 TB corpus
    val emb = Tables.embeddings(spark, sf)
    val p = planOf(Similarity.topKCosine(emb, emb.where(col("vec_id") < 5), 5))
    assert(p.contains("BroadcastNestedLoopJoin"), s"query side must broadcast:\n$p")
    assert(!p.contains("CartesianProduct"), s"corpus must never shuffle for the pairing:\n$p")
  }

  test("quantized knn ranks on the bounded heap aggregate — no window, one output sort") {
    import org.apache.spark.sql.functions.col
    // the quantized candidate stage must ship k rows per query, not rank a
    // corpus-sized window per query: no row_number Window, and the only
    // Sort is the final output orderBy (above the aggregation)
    val emb = Tables.embeddings(spark, sf)
    val p = planOf(Quantize.quantizedTopK(emb, emb.where(col("vec_id") < 5), 5))
    assert(!"\\(\\d+\\) Window\\b".r.findAllIn(p).hasNext,
      s"quantized top-k must not rank via a window:\n$p")
    val sorts = "\\(\\d+\\) Sort\\b".r.findAllIn(p).size
    assert(sorts <= 1, s"expected only the output sort, got $sorts:\n$p")
    assert(p.contains("topk"), s"expected the TopKAggregate in the plan:\n$p")
  }

  test("bm25 ranks via top-k, not a global sort, and tf prunes to the term set in the scan stage") {
    val p = planOf(TextAnalysis.bm25TopDocs(Tables.documents(spark, sf), Seq("join", "filter"), 10))
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(p.contains("token#") && (p.contains("IN (join,filter)") || p.contains("INSET")),
      s"term filter must prune before the tf shuffle:\n$p")
  }

  test("token budget: the only single-partition window is the bounded bucket frame") {
    val p = planOf(CorpusFilters.tokenBudgetProfile(Tables.documents(spark, sf), 3, 5))
    // the bucket cumulative window is allowed to be single-partition (≤10001
    // aggregated rows); the union's two branches each plan a copy of the
    // bucket-window + one-row-total subtree (4 text occurrences; AQE reuses
    // the exchanges at runtime), and the per-doc boundary window must be
    // hash-partitioned on qual_u
    val single = "SinglePartition".r.findAllIn(p).size
    assert(single <= 4, s"only the bounded bucket/total frames may run single-partition:\n$p")
    assert(p.contains("hashpartitioning(qual_u"),
      s"the boundary window must partition on the bucket key:\n$p")
    // the corpus itself is classified by broadcast join, never globally sorted
    assert(p.contains("BroadcastExchange"), s"bucket stats must broadcast:\n$p")
    assert(!p.contains("CartesianProduct"), p)
  }

  test("dsir importance: bucket stats broadcast back onto the token stream") {
    import org.apache.spark.sql.functions.col
    val p = planOf(Importance.importanceProfile(
      Tables.documents(spark, sf), col("lang") === "en", 256))
    assert(p.contains("BroadcastHashJoin"),
      s"≤256-row stats table must broadcast, not shuffle the tokens:\n$p")
    assert(!p.contains("SortMergeJoin"), s"token stream must not sort-merge:\n$p")
  }

  test("nearest centroid: broadcast NLJ over the bounded centroid table, no shuffle NLJ") {
    val p = planOf(Similarity.nearestCentroidProfile(Tables.embeddings(spark, sf)))
    assert(p.contains("BroadcastNestedLoopJoin"),
      s"centroids must broadcast into the scan-side cross join:\n$p")
    assert(!p.contains("CartesianProduct"),
      s"a shuffle cartesian would re-partition the corpus:\n$p")
  }

  test("vocab coverage: top-k via bounded heap, vocab broadcast onto the token stream") {
    val p = planOf(TextAnalysis.vocabCoverage(Tables.documents(spark, sf), 1000))
    assert(p.contains("TakeOrderedAndProject"),
      s"top-k vocab must not globally sort the vocabulary:\n$p")
    assert(p.contains("BroadcastHashJoin"), s"the k-row vocab must broadcast:\n$p")
  }

  test("quality percentiles: rank from bounded buckets — no per-document window") {
    val p = planOf(TextAnalysis.qualityPercentiles(Tables.documents(spark, sf)))
    // the only windows run on the (source, qual_u) bucket frame, partitioned
    // by source — never single-partition, never over per-doc rows
    assert(!p.contains("SinglePartition"), s"bucket windows partition by source:\n$p")
    assert(p.contains("hashpartitioning(source"),
      s"the rank frame must partition on source:\n$p")
    assert(p.contains("BroadcastHashJoin"), s"bucket ranks must broadcast back:\n$p")
  }

  test("gram matrix: bounded-buffer aggregate, no explode or join before the final agg") {
    val p = planOf(graft.operators.Spectral.gramMatrix(Tables.embeddings(spark, sf), 64),
      mode = "simple")
    assert(p.contains("ObjectHashAggregate"),
      s"gram must run as a TypedImperativeAggregate (partial+final):\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("SortMergeJoin") &&
      !p.contains("BroadcastHashJoin"), s"gram needs no join:\n$p")
    // simple mode prints sink-first: the triangle explode (Generate) must sit
    // ABOVE the aggregate pair — it consumes the d^2/2-row buffer, never the
    // corpus (n*d^2/2 rows)
    val lines  = p.linesIterator.toVector
    val genIdx = lines.indexWhere(_.contains("Generate"))
    val aggIdx = lines.indexWhere(_.contains("ObjectHashAggregate"))
    assert(genIdx >= 0 && aggIdx >= 0 && genIdx < aggIdx,
      s"explode must consume the aggregated buffer, not the corpus:\n$p")
  }

  test("value fill: user-partitioned window, no join anywhere in the plan") {
    val p = planOf(graft.operators.EventAnalytics.lastKnownValueProfile(
      Tables.events(spark, sf)))
    assert(p.contains("hashpartitioning(user_id"),
      s"the fill window must partition per user:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("SortMergeJoin") &&
      !p.contains("BroadcastHashJoin") && !p.contains("BroadcastNestedLoopJoin"),
      s"forward fill is a window, not a join:\n$p")
  }

  test("snapshot diff: full-outer equi-join on the key, no cartesian") {
    val p = planOf(graft.operators.Snapshot.snapshotDiffProfile(
      Tables.documents(spark, sf)))
    assert(p.contains("FullOuter"), s"diff must full-outer join the snapshots:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"diff must join on the document key:\n$p")
  }

  test("cooccurrence: all lags share one user window, explode feeds a hash agg, no join") {
    val p = planOf(graft.operators.EventAnalytics.cooccurrenceCounts(
      Tables.events(spark, sf), 2), mode = "simple")
    val windows = p.linesIterator.count(_.contains("- Window "))
    assert(windows == 1, s"Catalyst must collapse same-spec lag windows into one:\n$p")
    assert(p.contains("hashpartitioning(user_id"), s"window partitions per user:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct") &&
      !p.contains("BroadcastHashJoin"), s"never a self-join of events:\n$p")
  }

  test("knn graph: bucket equi-join candidates, per-vector rank window, no cartesian") {
    val p = planOf(Similarity.knnGraph(Tables.embeddings(spark, sf), 3, 0.3))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"candidates must come from bucket equi-joins:\n$p")
    assert(p.contains("hashpartitioning(vec_id"),
      s"the rank window must partition per vector:\n$p")
  }

  test("normalized dedup: fingerprint stats equi-join, projection rides the scan") {
    val p = planOf(Dedup.normalizedDedupProfile(Tables.documents(spark, sf)))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"group stats must equi-join on the fingerprint:\n$p")
    assert(!p.contains("SinglePartition"), s"no global structure anywhere:\n$p")
  }

  test("band join: grid cell is an EQUI key — the range probe never nested-loops the points") {
    val p = planOf(RangeJoin.purchaseBandProfile(Tables.events(spark, sf)))
    assert(!p.contains("CartesianProduct"), s"no cartesian anywhere:\n$p")
    // the point→interval probe hashes on the grid cell (range predicate is
    // only the residual condition of the equi join)
    assert(p.linesIterator.exists(l => l.contains("keys") && l.contains("__bkt")),
      s"the probe must be an equi join on the grid cell:\n$p")
    // the only nested loop is the bounded band-table build: range(n) × the
    // broadcast 1-row max — metadata, never the point stream (formatted
    // mode prints each node twice: once in the tree, once as "(i) Node")
    assert(p.linesIterator.count(
        _.matches("""\(\d+\) BroadcastNestedLoopJoin.*""")) <= 1,
      s"points must never flow through a nested loop:\n$p")
  }

  test("interval overlap: both sides meet on the grid cell — an equi join, no cartesian") {
    val ev = Tables.events(spark, sf)
    val p = planOf(graft.operators.RangeJoin.busyHourSessionOverlap(
      ev, Sessionize.sessionMetrics(ev)))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"overlap candidates must come from the shared grid cell:\n$p")
    assert(p.linesIterator.exists(l => l.contains("keys") && l.contains("__bkt")),
      s"the overlap join must be EQUI on the grid cell:\n$p")
  }

  test("pagerank: ten rounds of equi-join + agg — no cartesian at any depth") {
    val p = planOf(graft.operators.GraphRank.weightedPageRank(
      graft.operators.EventAnalytics.cooccurrenceCounts(Tables.events(spark, sf), 2),
      iterations = 3))
    assert(!p.contains("CartesianProduct"),
      s"rank propagation must stay an equi-join per round:\n$p")
  }

  test("bfs distances: label propagation is an equi-join + min-agg per round, no cartesian") {
    val p = planOf(graft.operators.GraphRank.bfsDistances(
      graft.operators.EventAnalytics.cooccurrenceCounts(Tables.events(spark, sf), 2),
      seeds = 3, hops = 2))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"label propagation must stay an equi-join per round:\n$p")
  }

  test("triangle census: oriented wedge equi-joins only, no cartesian") {
    val p = planOf(graft.operators.GraphRank.triangleCounts(
      graft.operators.EventAnalytics.cooccurrenceCounts(Tables.events(spark, sf), 2)))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"wedges must come from apex equi-joins:\n$p")
  }

  test("scd2 history: both windows share one user partition+sort, no join, no global window") {
    val p = planOf(EventAnalytics.changeIntervals(Tables.events(spark, sf)),
      mode = "simple")
    assert(!p.contains("Join"), s"change capture is windows, not a self-join:\n$p")
    assert(p.contains("hashpartitioning(user_id"),
      s"windows must partition per user:\n$p")
    val exchanges = p.linesIterator
      .count(l => l.contains("Exchange hashpartitioning"))
    assert(exchanges == 1,
      s"lag/lead/row_number over the same spec must reuse ONE exchange:\n$p")
  }

  test("systematic sample: the only unpartitioned window is the bucket table, 4096x smaller") {
    val p = planOf(Sampling.systematicSampleProfile(Tables.documents(spark, sf)),
      mode = "simple")
    // the per-row cumulative window must partition by bucket
    assert(p.contains("hashpartitioning(__b"),
      s"the row-scale window must partition by bucket:\n$p")
    assert(!p.contains("CartesianProduct"), s"no cartesian anywhere:\n$p")
    // one bounded nested loop is allowed: the broadcast 1-row total-weight
    // scalar; the bucket offsets themselves equi-join back on __b
    assert(p.split("BroadcastNestedLoopJoin").length <= 2,
      s"rows must never flow through more than the scalar broadcast:\n$p")
  }

  test("two-sample tests: per-value ranking partitions by bucket; kendall pairs equi-join") {
    val orders = Tables.orders(spark, sf)
    for (df <- Seq(Hypothesis.ksTest(orders), Hypothesis.rankSumTest(orders))) {
      val p = planOf(df, mode = "simple")
      // the value-scale cumulative window must partition by the bucket key;
      // only the 4096x-smaller bucket histogram windows globally
      assert(p.contains("hashpartitioning(bkt"),
        s"the value-frame window must partition by bucket:\n$p")
      assert(!p.contains("CartesianProduct"), s"no cartesian:\n$p")
    }
    val pk = planOf(Hypothesis.kendallTauDaily(Tables.events(spark, sf)),
      mode = "simple")
    assert(!pk.contains("CartesianProduct") && !pk.contains("BroadcastNestedLoopJoin"),
      s"kendall pairs must flow through the blocked equi-join:\n$pk")
  }

  test("mmr: candidate and pair-sim joins are equi-joins on the query key") {
    val emb = Tables.embeddings(spark, sf)
    val p = planOf(Similarity.mmrRerank(emb), mode = "simple")
    // one broadcast NLJ is expected and bounded: queries x corpus (the
    // brute-kNN candidate scan); the pair-sim self-join and every greedy
    // round must equi-join
    assert(!p.contains("CartesianProduct"), s"no cartesian anywhere:\n$p")
    assert(p.split("BroadcastNestedLoopJoin").length <= 2,
      s"only the bounded query-broadcast NLJ is allowed:\n$p")
  }

  test("survival km: risk counts ride the bucketed prefix, user frame never globally windows") {
    val p = planOf(Hypothesis.survivalKm(Tables.events(spark, sf)), mode = "simple")
    assert(p.contains("hashpartitioning(bkt"),
      s"the duration-frame window must partition by bucket:\n$p")
    assert(!p.contains("CartesianProduct"), s"no cartesian:\n$p")
  }
}
