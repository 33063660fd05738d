package graft

import org.apache.spark.sql.functions._

import graft.operators.BloomJoin
import graft.plans.BloomFilter
import graft.sources.Tables

/** Bloom-filter build/probe invariants and the prefiltered-join contract. */
class BloomFilterSpec extends SparkSpec {

  import spark.implicits._

  test("no false negatives: every inserted key probes true, under any partitioning") {
    val keys = (1L to 5000L).map(_ * 7919L)
    for (parts <- Seq(1, 13)) {
      val df = keys.toDF("k").repartition(parts)
      val bloomRow = df.agg(BloomFilter.build(xxhash64(col("k")), 1 << 16, 5).as("b"))
      val misses = keys.toDF("k")
        .crossJoin(broadcast(bloomRow))
        .where(!BloomFilter.mightContainCol(col("b"), xxhash64(col("k"))))
        .count()
      assert(misses == 0, s"false negatives with $parts partitions")
    }
  }

  test("bit pattern is a pure function of the key set (merge order / duplicates invisible)") {
    val keys = (1L to 2000L).toDF("k")
    def bits(df: org.apache.spark.sql.DataFrame): Seq[Byte] =
      df.agg(BloomFilter.build(xxhash64(col("k")), 1 << 14, 5).as("b"))
        .head().getAs[Array[Byte]]("b").toSeq
    assert(bits(keys) == bits(keys.repartition(17)))
    assert(bits(keys) == bits(keys.union(keys))) // idempotent under duplicates
  }

  test("false-positive rate is near the sizing formula") {
    // n=2000 keys, m=2^16 bits, k=5 → fpp ≈ (1 − e^(−kn/m))^k ≈ 0.05%
    val inserted = (1L to 2000L).map(_ * 3L)
    val bloomRow = inserted.toDF("k")
      .agg(BloomFilter.build(xxhash64(col("k")), 1 << 16, 5).as("b"))
    val probes = (1_000_000L to 1_020_000L).toDF("k") // disjoint from inserted
    val fp = probes.crossJoin(broadcast(bloomRow))
      .where(BloomFilter.mightContainCol(col("b"), xxhash64(col("k"))))
      .count()
    assert(fp < 100, s"fpp way above sizing formula: $fp / 20000") // 0.5% headroom
  }

  test("bloom semi join equals the plain semi join") {
    val lineitem = Tables.lineitem(spark, sf)
    val orders   = Tables.orders(spark, sf)
    val high     = orders.where(col("o_totalprice") > 200000.0).select(col("o_orderkey"))

    val viaBloom = BloomJoin.semiJoin(lineitem, high, "l_orderkey", "o_orderkey")
      .select(col("l_orderkey"), col("l_linenumber"))
    val plain = lineitem.join(high, col("l_orderkey") === col("o_orderkey"), "left_semi")
      .select(col("l_orderkey"), col("l_linenumber"))
    assert(viaBloom.exceptAll(plain).isEmpty && plain.exceptAll(viaBloom).isEmpty)
    assert(viaBloom.count() > 0)
  }

  test("null join keys keep SQL semantics through both bloom joins") {
    // xxhash64(NULL) is the seed constant (not null), so null keys DO set
    // bits — harmless: the exact join after the prefilter enforces SQL's
    // NULL-never-matches rule, which is the contract worth pinning
    val big = Seq[java.lang.Long](1L, 2L, null, 5L).toDF("key")
    val small = Seq[java.lang.Long](1L, null).toDF("skey")
    val semi = BloomJoin.semiJoin(big, small, "key", "skey")
    val plainSemi = big.join(small, col("key") === col("skey"), "left_semi")
    assert(semi.exceptAll(plainSemi).isEmpty && plainSemi.exceptAll(semi).isEmpty)
    assert(semi.count() == 1) // only key=1; the null row never matches
    val anti = BloomJoin.antiJoin(big, small, "key", "skey")
    val plainAnti = big.join(small, col("key") === col("skey"), "left_anti")
    assert(anti.exceptAll(plainAnti).isEmpty && plainAnti.exceptAll(anti).isEmpty)
    assert(anti.count() == 3) // 2, 5, and the null row all survive
  }

  test("bloom anti join equals the plain anti join, including same-name keys") {
    val docs = Tables.lineitem(spark, sf)
      .select(col("l_orderkey").as("key"), col("l_linenumber"))
    val existing = Tables.orders(spark, sf)
      .where(col("o_totalprice") > 300000.0)
      .select(col("o_orderkey").as("key"))
    val viaBloom = BloomJoin.antiJoin(docs, existing, "key", "key")
    val plain = docs.join(existing, docs("key") === existing("key"), "left_anti")
    assert(viaBloom.exceptAll(plain).isEmpty && plain.exceptAll(viaBloom).isEmpty)
    assert(viaBloom.count() > 0 && viaBloom.count() < docs.count())
  }

  test("probe stays codegen'd and the filter broadcasts (plan shape)") {
    val q = BloomJoin.highValueLineitemRevenue(
      Tables.lineitem(spark, sf), Tables.orders(spark, sf))
    // sparkPlan: the pre-AQE physical tree (executedPlan is an opaque
    // AdaptiveSparkPlan wrapper until execution)
    val tree = q.queryExecution.sparkPlan
    val physical = tree.toString
    assert(physical.contains("bloom_might_contain"), "probe expression missing from plan")
    // the filter is an embedded literal: no join machinery of any kind may
    // sit between the scan and the probe predicate
    assert(!physical.contains("BroadcastNestedLoopJoin"),
      "bloom must embed as a literal, not ride a nested-loop join")
    // the probe filter must sit UNDER the exact semi join: the whole point
    // is dropping rows before that join's exchange
    val semiJoinNodes = tree.collect {
      case p if p.nodeName.contains("Join") && p.toString.contains("LeftSemi") => p
    }
    assert(semiJoinNodes.nonEmpty, "exact semi join missing")
    assert(semiJoinNodes.head.exists(_.toString.contains("bloom_might_contain")),
      "bloom prefilter must be below the exact join")
  }
}
