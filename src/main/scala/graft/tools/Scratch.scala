package graft.tools

import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.operators.Dedup
import graft.sources.Tables

/** Dev-only stage-timing probe (throwaway). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.build("graft-scratch")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[scratch] $label: ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }
    val docs = Tables.documents(spark, sfDir)
    for (rep <- 1 to 2) {
      println(s"--- rep $rep")
      val pairs = t("pairs (full jaccard)") {
        Dedup.jaccardJoinPrefix(docs, 1, 2).localCheckpoint()
      }
      println(s"[scratch] pair rows: ${pairs.count()}")
      val cc = t("cc build") { Dedup.dedupClusters(pairs) }
      t("cc run")(cc.count())
    }
    spark.stop()
  }
}
