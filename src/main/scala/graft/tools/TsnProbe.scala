package graft.tools

import graft.GraftSession
import graft.operators.Stats
import graft.sources.Tables

/** Dev-only block-count A/B for theilSenDailyRevenue (same-JVM warm reps).
  * Round-11 measurement at sf0.1: B ∈ {4, 8, 12, 16, 24} all land in the
  * 4.1–5.5 s noise band — the cost is the ~2.9M-pair volume itself, not
  * block parallelism, so the registered default (B=8) stands and further
  * tuning would be window-shopping noise. */
object TsnProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.build("graft-tsn-probe")
    val orders = Tables.orders(spark, sfDir)
    Stats.theilSenDailyRevenue(orders).count() // warm
    for (rep <- 1 to 2; b <- Seq(4, 8, 12, 16, 24)) {
      val t0 = System.nanoTime()
      Stats.theilSenDailyRevenue(orders, numBlocks = b).count()
      println(f"[tsn] rep=$rep B=$b%-3d ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    spark.stop()
  }
}
