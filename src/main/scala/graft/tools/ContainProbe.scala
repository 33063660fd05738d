package graft.tools

import org.apache.spark.sql.functions._
import graft.GraftSession
import graft.operators.Dedup
import graft.sources.Tables

/** Dev-only: stage volumes/timings of the containment join. */
object ContainProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.build("contain-probe")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }
    val docs = Tables.documents(spark, sfDir)
    val docArrays = t("docArrays")(Dedup.canonicalDocArrays(docs))
    val num = 4; val den = 5
    val p = (col("s") - floor((col("s") * num + (den - 1)) / den) + 1).cast("int")
    val probe = docArrays.select(col("doc_id").as("doc_a"), col("s").as("sa"),
      explode(slice(col("ohs"), lit(1), p)).as("h"))
    val index = docArrays.select(col("doc_id").as("doc_b"), col("s").as("sb"),
      explode(col("ohs")).as("h"))
    println("[probe] probe rows: " + t("probe count")(probe.count()))
    println("[probe] index rows: " + t("index count")(index.count()))
    val joined = probe.join(index, Seq("h"))
      .where(col("sa") < col("sb") || (col("sa") === col("sb") && col("doc_a") < col("doc_b")))
    println("[probe] join rows: " + t("join count")(joined.count()))
    val cand = joined.select(col("doc_a"), col("doc_b")).distinct()
    println("[probe] cand pairs: " + t("cand count")(cand.count()))
    spark.stop()
  }
}
