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
}
