package graft

import org.apache.spark.sql.functions._

import graft.sources.{Bucketing, Tables}

/** Bucketed co-located joins: the write-once / join-shuffle-free pattern
  * for repeated fact-fact joins at scale. */
class BucketingSpec extends SparkSpec {

  test("partitioned parquet sink enables partition-pruned scans") {
    import org.apache.spark.sql.functions._
    val out = java.nio.file.Files.createTempDirectory("graft_part").toString
    val events = Tables.events(spark, sf)
      .withColumn("event_date", date_format(timestamp_seconds(col("ts_sec")), "yyyy-MM-dd"))
    graft.streaming.Sinks.parquetAppend(out, Seq("event_date"))(events, 0L)
    val firstDate = events.agg(min(col("event_date"))).head().getString(0)
    val read = spark.read.parquet(out).where(col("event_date") === firstDate)
    read.collect()
    val p = read.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(p.contains(s"PartitionFilters: [isnotnull(event_date"),
      s"date filter must prune partitions, not scan+filter:\n$p")
    assert(read.count() == events.where(col("event_date") === firstDate).count())
  }

  test("hilbert write layout: per-file footer extents shrink in BOTH dimensions") {
    import graft.operators.ZOrder
    val li = Tables.lineitem(spark, sf).select("l_partkey", "l_suppkey")
    def meanExtentArea(dir: String): Double = {
      val perFile = spark.read.parquet(dir)
        .withColumn("f", input_file_name())
        .groupBy("f")
        .agg(((max(col("l_partkey")) - min(col("l_partkey")) + 1)
          * (max(col("l_suppkey")) - min(col("l_suppkey")) + 1)).as("area"))
      perFile.agg(avg(col("area"))).head().getDouble(0)
    }
    val hDir = java.nio.file.Files.createTempDirectory("graft_hilb").toString
    val nDir = java.nio.file.Files.createTempDirectory("graft_nat").toString
    ZOrder.writeHilbertLayout(li, hDir, "l_partkey", "l_suppkey", bits = 8, files = 16)
    li.repartition(16).write.mode("overwrite").parquet(nDir) // natural layout
    val h = meanExtentArea(hDir)
    val n = meanExtentArea(nDir)
    info(f"mean per-file (x,y) footer extent area: hilbert=$h%.0f natural=$n%.0f")
    // hash-partitioned files each span nearly the full key plane; the
    // hilbert layout's files must cover a small fraction of it
    assert(h < n / 4.0, s"hilbert layout must shrink footer extents: $h vs $n")
    // and the layout must not lose or duplicate rows
    assert(spark.read.parquet(hDir).count() == li.count())
  }

  test("bucketed join on the bucket key runs with zero exchanges") {
    Seq("bkt_lineitem", "bkt_orders").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = new java.io.File(s"spark-warehouse/$t")
      if (loc.exists()) { // stale location from an interrupted prior run
        def rm(f: java.io.File): Unit = {
          Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
        }
        rm(loc)
      }
    }
    Bucketing.writeBucketed(Tables.lineitem(spark, sf)
        .select(col("l_orderkey"), col("l_extendedprice")),
      "bkt_lineitem", "l_orderkey", buckets = 4, sortCol = Some("l_orderkey"))
    Bucketing.writeBucketed(Tables.orders(spark, sf)
        .select(col("o_orderkey").as("l_orderkey"), col("o_totalprice")),
      "bkt_orders", "l_orderkey", buckets = 4, sortCol = Some("l_orderkey"))

    val joined = Bucketing.bucketedJoin(spark, "bkt_lineitem", "bkt_orders", "l_orderkey")
      .groupBy(col("l_orderkey")).agg(sum(col("l_extendedprice")).as("s"))
    joined.collect()
    val p = joined.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(!p.contains("Exchange hashpartitioning"),
      s"bucketed join must not shuffle:\n$p")

    // same join without bucketing DOES shuffle (or broadcasts) — the bucketed
    // layout is what removed the exchange, not data size
    val unbucketed = Tables.lineitem(spark, sf)
      .join(Tables.orders(spark, sf).withColumnRenamed("o_orderkey", "l_orderkey"), Seq("l_orderkey"))
      .groupBy(col("l_orderkey")).agg(sum(col("l_extendedprice")).as("s"))
    unbucketed.collect()
    val up = unbucketed.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(up.contains("Exchange") || up.contains("Broadcast"))
  }

  test("IVF write-time layout: probe scan is partition-pruned and matches the in-memory index") {
    import org.apache.spark.sql.functions.col
    val emb = Tables.embeddings(spark, sf)
    val dir = java.nio.file.Files.createTempDirectory("graft_ivf").toString
    operators.Similarity.writeCellPartitioned(emb, dir, numCells = 16)

    val queries = emb.where(col("vec_id") < 3)
    val viaLayout = operators.Similarity.ivfTopKPartitioned(
      spark, dir, queries, k = 5, nprobe = 2)
    // the pruned probe must equal the in-memory index probed with the same
    // centroids and nprobe (same deterministic assignment + tie rules)
    val inMemory = operators.Similarity.ivfTopK(emb, queries, k = 5,
      numCells = 16, nprobe = 2)
    assert(viaLayout.exceptAll(inMemory).isEmpty && inMemory.exceptAll(viaLayout).isEmpty)

    // and the scan itself must prune: the executed scan's numFiles METRIC
    // (not inputFiles, which lists the relation pre-pruning; not the
    // PartitionFilters string, which prints even when empty) must be a
    // strict subset of the layout's files
    viaLayout.collect()
    def scans(p: org.apache.spark.sql.execution.SparkPlan): Seq[org.apache.spark.sql.execution.FileSourceScanExec] =
      p match {
        // AQE wraps subtrees in stage nodes that expose their plan via a
        // field, not children — unwrap each before recursing
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => scans(a.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => scans(q.plan)
        case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec => scans(r.child)
        case f: org.apache.spark.sql.execution.FileSourceScanExec => Seq(f)
        case other => other.children.flatMap(scans) ++
          other.subqueries.flatMap(scans)
      }
    val allFiles = spark.read.parquet(dir).inputFiles.length
    val layoutScans = scans(viaLayout.queryExecution.executedPlan)
      .filter(_.metadata.get("Location").exists(l => l.contains("graft_ivf") && !l.contains("_centroids")))
    assert(layoutScans.nonEmpty, "layout scan not found in executed plan")
    val readFiles = layoutScans.map(_.metrics("numFiles").value).sum
    assert(readFiles > 0 && readFiles < allFiles,
      s"probe must read a strict subset of partitions: $readFiles of $allFiles")
  }
}
