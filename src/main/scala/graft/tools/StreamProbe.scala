package graft.tools

import org.apache.spark.sql.functions._

import graft.GraftSession

/** Dev-only: isolates the streaming oracles' cost layers (stream run vs
  * post-collect batch reduction) so floor work targets the right layer. */
object StreamProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.drop(1).headOption.map(_.toInt).getOrElse(3)
    val spark = GraftSession.build("graft-stream-probe")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[sprobe] $label: ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }
    for (i <- 1 to reps) {
      println(s"[sprobe] --- rep $i")
      t("update_mode full")(
        graft.streaming.StreamingSessions.updatedUserHourly(spark, sfDir).count())
      t("sessions full")(
        graft.streaming.StreamingSessions.closedSessions(spark, sfDir).count())
      t("outer_join full")(
        graft.streaming.StreamingJoin.purchaseViewPairsOuter(spark, sfDir).count())
      t("dedup full")(
        graft.streaming.StreamingDedup.dedupedTypeCounts(spark, sfDir).count())
    }
    spark.stop()
  }
}
