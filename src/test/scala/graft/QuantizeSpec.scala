package graft

import org.apache.spark.sql.functions._

import graft.operators.{Quantize, Similarity}
import graft.plans.VectorExpressions.ivecDot
import graft.sources.Tables

/** Invariants of int8 scalar quantization and the integer-dot expression. */
class QuantizeSpec extends SparkSpec {

  import spark.implicits._

  test("codes stay within int8 range and reconstruction error is bounded by scale/2") {
    val emb = Tables.embeddings(spark, sf)
    val stats = Quantize.quantStats(emb)
    // max_err ≤ 0.5/scale + ulp slack: q = floor(v*scale + 0.5) is within
    // half a quantization step of v*scale
    val bad = stats.where(col("scale") > 0.0
      && col("max_err") > lit(0.5) / col("scale") * 1.0000001).count()
    assert(bad == 0)
    val outOfRange = emb.select(explode(
        transform(col("embedding"), x =>
          floor(x.cast("double")
            * (lit(127.0) / array_max(transform(col("embedding"), v => abs(v))).cast("double"))
            + 0.5))).as("q"))
      .where(abs(col("q")) > 127).count()
    assert(outOfRange == 0)
  }

  test("ivec_dot matches an interpreted zip/sum on int arrays") {
    val df = Seq(
      (Array(1L, -2L, 3L), Array(4L, 5L, -6L)),
      (Array(127L, 127L), Array(-127L, 127L)),
      (Array.empty[Long], Array.empty[Long])
    ).toDF("a", "b")
    val got = df.select(ivecDot(col("a"), col("b")).as("d")).as[Long].collect().toSeq
    val want = df.select(aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
      lit(0L), (acc, v) => acc + v).as("d")).as[Long].collect().toSeq
    assert(got == want && got == Seq(1L * 4 - 2 * 5 - 3 * 6, -127L * 127 + 127L * 127, 0L))
  }

  test("random projection is partition-invariant and roughly distance-preserving") {
    val emb = Tables.embeddings(spark, sf)
    val p1 = Similarity.randomProjection(emb, 8)
    val p2 = Similarity.randomProjection(emb.repartition(13), 8)
    assert(p1.exceptAll(p2).isEmpty && p2.exceptAll(p1).isEmpty)

    // JL sanity on a sample of pairs: sketch distance must correlate with
    // full distance. The synthetic embeddings are near-isotropic, so
    // pairwise distances CONCENTRATE (tiny cross-pair variance) and a
    // coarse 8-dim sketch shows weak correlation by nature; 32 dims keeps
    // the test meaningful while still exercising the same operator.
    val sk = Similarity.randomProjection(emb, 32).groupBy(col("vec_id"))
      .agg(collect_list(struct(col("j"), col("proj_micro"))).as("ps"))
      .select(col("vec_id"),
        transform(array_sort(col("ps")), p => p.getField("proj_micro").cast("double") / 1e6).as("sk"))
    val full = emb.select(col("vec_id"), col("embedding"))
    val pairs = sk.join(full, "vec_id").where(col("vec_id") < 40)
    val a = pairs.select(col("vec_id").as("ida"), col("sk").as("ska"), col("embedding").as("ea"))
    val b = pairs.select(col("vec_id").as("idb"), col("sk").as("skb"), col("embedding").as("eb"))
    def d2(x: org.apache.spark.sql.Column, y: org.apache.spark.sql.Column) =
      aggregate(zip_with(x, y, (u, v) => (u.cast("double") - v.cast("double"))
        * (u.cast("double") - v.cast("double"))), lit(0.0), (acc, v) => acc + v)
    val ds = a.crossJoin(b).where(col("ida") < col("idb"))
      .select(d2(col("ska"), col("skb")).as("dsk"), d2(col("ea"), col("eb")).as("dfull"))
      .collect()
    val corr = {
      val xs = ds.map(_.getDouble(0)); val ys = ds.map(_.getDouble(1))
      val (mx, my) = (xs.sum / xs.length, ys.sum / ys.length)
      val cov = xs.zip(ys).map { case (x, y) => (x - mx) * (y - my) }.sum
      cov / math.sqrt(xs.map(x => (x - mx) * (x - mx)).sum * ys.map(y => (y - my) * (y - my)).sum)
    }
    assert(corr > 0.3, s"JL sketch uncorrelated with full distance: corr=$corr")
  }

  test("quantized candidate ranking agrees closely with float cosine ranking") {
    val emb = Tables.embeddings(spark, sf)
    val queries = emb.where(col("vec_id") < 5)
    val quant = Quantize.quantizedTopK(emb, queries, 5)
      .select(col("query_id"), col("neighbor_id"))
    // float reference ranked by the same normalization-free score the
    // quantized stage approximates: the raw dot product
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id")).orderBy(col("dot").desc, col("neighbor_id").asc)
    val exact = emb.select(col("vec_id").as("neighbor_id"), col("embedding"))
      .join(broadcast(queries.select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))),
        col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        Similarity.dot(col("embedding"), col("q_emb")).as("dot"))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= 5)
      .select(col("query_id"), col("neighbor_id"))
    val total = exact.count().toDouble
    val overlap = quant.intersect(exact).count().toDouble
    assert(overlap / total > 0.6,
      s"int8 candidates lost too much recall: $overlap/$total")
  }

  test("Lloyd-refined PQ approximates true dots better than seed codebooks") {
    import graft.plans.VectorExpressions.fvecDot
    val emb = Tables.embeddings(spark, sf)
    val queries = emb.where(col("vec_id") < 5)
    // mean |approx_dot - true dot| over each pipeline's returned top-k
    // pairs: the ADC quality the Lloyd rounds exist to improve
    def meanErr(df: org.apache.spark.sql.DataFrame): Double = {
      val l = emb.select(col("vec_id").as("query_id"), col("embedding").as("qe"))
      val r = emb.select(col("vec_id").as("neighbor_id"), col("embedding").as("ne"))
      df.join(l, Seq("query_id")).join(r, Seq("neighbor_id"))
        .select(avg(abs(col("approx_dot") - fvecDot(col("qe"), col("ne")))).as("e"))
        .head().getDouble(0)
    }
    val seedErr = meanErr(Quantize.pqTopK(emb, queries, 5))
    val refinedErr = meanErr(Quantize.pqKmeansTopK(emb, queries, 5))
    info(s"mean ADC |error|: seed=$seedErr refined=$refinedErr")
    // deterministic corpus + seeds: these are constants, not flake
    assert(refinedErr < seedErr,
      s"Lloyd refinement must tighten ADC reconstruction: $refinedErr !< $seedErr")
  }

  test("PQ top-k: aggregation pipeline equals a window-based re-derivation") {
    import org.apache.spark.sql.expressions.Window
    import graft.plans.VectorExpressions.fvecDot
    val emb = Tables.embeddings(spark, sf)
    val got = Quantize.pqTopK(emb, emb.where(col("vec_id") < 5), 5)

    // independent plan: same PQ definition but every argmax/topk stated as
    // a row_number window (the oracle's shape) — pins the struct-max
    // encoding and heap top-k against ranking-window semantics
    val subLen = 16
    val sv = emb.select(col("vec_id"),
        explode(sequence(lit(0), lit(3))).as("sub"), col("embedding"))
      .select(col("vec_id"), col("sub"),
        slice(col("embedding"), col("sub") * subLen + 1, lit(subLen)).as("sv"))
    val cb = sv.groupBy(col("sub"),
        (graft.operators.Dedup.PortableHash(concat(lit("pq"), col("sub").cast("string"),
          lit(":"), col("vec_id").cast("string"))) % 16).as("bucket"))
      .agg(min(col("vec_id")).as("code_id"), min_by(col("sv"), col("vec_id")).as("c_emb"))
      .select(col("sub"), col("code_id"), col("c_emb"))
    val encW = Window.partitionBy(col("vec_id"), col("sub"))
      .orderBy(col("d").desc, col("code_id").asc)
    val enc = sv.join(cb, Seq("sub"))
      .withColumn("d", fvecDot(col("sv"), col("c_emb")))
      .withColumn("rn", row_number().over(encW)).where(col("rn") === 1)
      .select(col("vec_id"), col("sub"), col("code_id"))
    val lut = sv.where(col("vec_id") < 5).join(cb, Seq("sub"))
      .select(col("vec_id").as("query_id"), col("sub"), col("code_id"),
        floor(fvecDot(col("sv"), col("c_emb")) * 10000.0).cast("long").as("du"))
    val rankW = Window.partitionBy(col("query_id"))
      .orderBy(col("su").desc, col("neighbor_id").asc)
    val expect = enc.join(lut, Seq("sub", "code_id"))
      .where(col("vec_id") =!= col("query_id"))
      .groupBy(col("query_id"), col("vec_id").as("neighbor_id"))
      .agg(sum(col("du")).as("su"))
      .withColumn("rank", row_number().over(rankW).cast("long"))
      .where(col("rank") <= 5)
      .select(col("query_id"), col("rank"), col("neighbor_id"),
        (col("su").cast("double") / 10000.0).as("approx_dot"))
    assert(got.exceptAll(expect).count() == 0 && expect.exceptAll(got).count() == 0,
      "PQ aggregation pipeline diverged from the window-based derivation")
  }
}
