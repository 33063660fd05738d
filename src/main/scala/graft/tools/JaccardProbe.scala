package graft.tools

import org.apache.spark.sql.functions._
import graft.GraftSession
import graft.operators.Dedup
import graft.sources.Tables

/** Dev-only: stage volumes of the exact prefix-filter jaccard join. */
object JaccardProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.build("jaccard-probe")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }
    val docs = Tables.documents(spark, sfDir)
    val (num, den) = (1, 2)
    val docArrays = t("docArrays")(Dedup.canonicalDocArrays(docs))
    val p = (col("s") - floor((col("s") * num + (den - 1)) / den) + 1).cast("int")
    val pShort = (col("s")
      - floor((col("s") * (2 * num) + (num + den - 1)) / (num + den)) + 1).cast("int")
    val pre = docArrays
      .select(col("doc_id"), col("s"), col("dup"),
        posexplode(slice(col("ohs"), lit(1), p)))
      .select(col("doc_id"), col("s"), col("dup"), col("pos"), col("col").as("h"))
    val l = pre.where(col("pos") < pShort)
      .select(col("h"), col("doc_id").as("doc_l"), col("s").as("sl"), col("pos").as("pl"),
        col("dup").as("dup_l"))
    val r = pre.select(col("h"), col("doc_id").as("doc_r"), col("s").as("sr"),
      col("pos").as("pr"), col("dup").as("dup_r"))
    println("[probe] index rows: " + t("index")(r.count()) + " probe rows: " + l.count())
    val alpha = floor((lit(num) * (col("sl") + col("sr")) + (num + den - 1)) / (num + den))
    val joined = l.join(r, Seq("h"))
      .where((col("sl") < col("sr")
          || (col("sl") === col("sr") && col("doc_l") < col("doc_r")))
        && lit(den) * col("sl") >= lit(num) * col("sr"))
    println("[probe] join rows: " + t("join")(joined.count()))
    val cand = joined
      .groupBy(col("doc_l"), col("doc_r"), col("sl"), col("sr"),
        col("dup_l"), col("dup_r"))
      .agg(count(lit(1)).as("o_pp"), max(col("pl")).as("pl_max"), max(col("pr")).as("pr_max"))
    println("[probe] distinct pairs: " + t("pairs")(cand.count()))
    val kept = cand.where(col("o_pp") +
      least(col("sl") - col("pl_max") - 1, col("sr") - col("pr_max") - 1)
      + col("dup_l") + col("dup_r") >= alpha)
    println("[probe] after positional filter: " + t("pos-filter")(kept.count()))
    val res = Dedup.jaccardJoinPrefix(docs, num, den)
    println("[probe] final results: " + t("full query")(res.count()))
    spark.stop()
  }
}
