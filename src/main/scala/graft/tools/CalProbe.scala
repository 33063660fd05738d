package graft.tools

import graft.Calibration

/** Dev tool: measures the two Bench calibration probes (the SHARED
  * [[graft.Calibration]] definitions — never a copy that could drift) N
  * times on an otherwise-idle host to (re-)pin their nominals.
  * Usage: runMain graft.tools.CalProbe [reps].
  * Pin the nominal to the MEDIAN printed at loadavg < 1. */
object CalProbe {
  def main(args: Array[String]): Unit = {
    val reps = args.headOption.map(_.toInt).getOrElse(8)
    val spark = graft.GraftSession.build("graft-calprobe")
    // throwaways: one-time codegen + JIT settle for both plans
    Calibration.cpuProbe(spark); Calibration.shuffleProbe(spark)
    val cs = (1 to reps).map(_ => Calibration.cpuProbe(spark))
    val ss = (1 to reps).map(_ => Calibration.shuffleProbe(spark))
    def stats(xs: Seq[Double]) =
      f"median ${Calibration.median(xs)}%.3f  all ${xs.map(x => f"$x%.3f").mkString(" ")}"
    println(s"[calprobe] cpu:     ${stats(cs)} (pinned nominal ${Calibration.CpuNominal})")
    println(s"[calprobe] shuffle: ${stats(ss)} (pinned nominal ${Calibration.ShuffleNominal})")
    spark.stop()
  }
}
