package graft.tools

import graft.GraftSession
import graft.operators.TextAnalysis
import graft.sources.Tables

/** BPE rounds-vs-wall curve (r14 verdict task 4): trains the
  * [[TextAnalysis.bpeMergeTable]] at increasing round counts on one
  * warm JVM and prints one JSON line per depth (cold rep first, then
  * warm reps), so the scheduling-floor vs vocabulary-math split is
  * measurable. Dev-only; not part of the driver contract.
  *
  * Usage: runMain graft.tools.BpeCurve <sfDir> [rounds,...] [reps]
  */
object BpeCurve {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val depths = args.lift(1).getOrElse("6,24,96").split(",").map(_.trim.toInt)
    val reps = args.lift(2).map(_.toInt).getOrElse(3)
    val spark = GraftSession.build("graft-bpecurve")
    // one warm-up train so JIT/classloading doesn't land on the first depth
    TextAnalysis.bpeMergeTable(Tables.documents(spark, sfDir), 2).count()
    for (d <- depths) {
      val walls = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        val n = TextAnalysis.bpeMergeTable(Tables.documents(spark, sfDir), d).count()
        ((System.nanoTime() - t0) / 1e9, n)
      }
      val ws = walls.map(_._1)
      println(f"""{"rounds":$d,"merges":${walls.head._2},"cold_s":${ws.head}%.3f,"warm_min_s":${ws.tail.minOption.getOrElse(ws.head)}%.3f,"per_round_warm_ms":${ws.tail.minOption.getOrElse(ws.head) / d * 1000}%.1f}""")
    }
    spark.stop()
  }
}
