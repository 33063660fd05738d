package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Weighted PageRank in fixed-point integer arithmetic — the iterative
  * graph-centrality family (beyond the connected-components clustering in
  * [[Dedup.dedupClusters]]), run as the standard Pregel-as-joins shape:
  * each iteration is ONE equi-join (ranks onto out-edges) plus ONE hash
  * aggregation (contributions by target), both hash-partitioned on node
  * ids — no driver-side graph, no cartesian, linear in |E| per round.
  *
  * All mass is integer (`scale` total, PageRank's p=0.85 as ×85 div 100;
  * per-edge contribution `(rank·w) div strength`), so ranks are
  * bit-reproducible on any engine and partitioning — the same doctrine as
  * the clustering oracles. Integer division sheds a few units of mass per
  * round; that loss is deterministic and identical cross-engine, which is
  * what an oracle-checked sketch needs (a float PageRank would drift in
  * the last ulp per reduction order).
  *
  * Iteration count is FIXED (default 10), not run to a tolerance: the
  * oracle must unroll the same rounds, and at 0.85 damping ten rounds
  * settle well under one fixed-point unit per node on graphs this shape.
  * Reference scope: the reference engine has no graph surface; declared
  * SURVEY extension (training-data pipelines rank entities/documents for
  * curriculum and graph-dedup survivor choice — e.g. centrality-weighted
  * survivor selection over the near-dup graph).
  */
object GraphRank {

  /** Ranks over an undirected weighted edge list `(item_a, item_b, pairs)`
    * (as produced by [[EventAnalytics.cooccurrenceCounts]]): each edge
    * feeds both directions (self-loops once), node set = every node with
    * at least one incident edge (strength > 0, so no dangling mass).
    * Returns (node, rank) for the top `k` by (rank desc, node asc). */
  def weightedPageRank(edges: DataFrame, iterations: Int = 10, k: Int = 50,
                       scale: Long = 1000000000000L): DataFrame = {
    require(iterations >= 1 && k >= 1 && scale >= 1)
    val dir = edges.select(col("item_a").cast("long").as("src"),
        col("item_b").cast("long").as("dst"), col("pairs").cast("long").as("w"))
      .union(edges.where(col("item_a") =!= col("item_b"))
        .select(col("item_b").cast("long").as("src"),
          col("item_a").cast("long").as("dst"), col("pairs").cast("long").as("w")))
    val strength = dir.groupBy(col("src")).agg(sum(col("w")).as("s"))
    val nDF = strength.agg(count(lit(1)).as("n"))
    // per-node constants: teleport share and the initial uniform rank —
    // broadcast of the 1-row count, computed once, reused every round
    val base = strength.select(col("src").as("node"))
      .crossJoin(broadcast(nDF))
      .select(col("node"),
        expr(s"(15L * (${scale}L div n)) div 100L").as("teleport"),
        expr(s"${scale}L div n").as("rank0"))
    val outEdges = dir.join(strength, "src") // (src, dst, w, s)
    var rank = base.select(col("node"), col("rank0").as("rank"))
    for (_ <- 1 to iterations) {
      val contribs = outEdges
        .join(rank.withColumnRenamed("node", "src"), "src")
        .select(col("dst").as("node"), expr("(rank * w) div s").as("c"))
        .groupBy(col("node")).agg(sum(col("c")).as("in_mass"))
      rank = base
        .join(contribs, Seq("node"), "left")
        .select(col("node"),
          expr("teleport + (85L * coalesce(in_mass, 0L)) div 100L").as("rank"))
    }
    rank.orderBy(col("rank").desc, col("node").asc).limit(k)
  }
}
