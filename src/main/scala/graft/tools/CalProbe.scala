package graft.tools

import org.apache.spark.sql.functions._

/** Dev tool: measures the two Bench calibration probes (pinned CPU lane,
  * shuffle lane) N times on an otherwise-idle host to (re-)pin their
  * nominals. Usage: runMain graft.tools.CalProbe [reps].
  * Pin the nominal to the MEDIAN printed at loadavg < 1. */
object CalProbe {
  def main(args: Array[String]): Unit = {
    val reps = args.headOption.map(_.toInt).getOrElse(8)
    val spark = graft.GraftSession.build("graft-calprobe")
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def cpu(): Unit =
      spark.range(0L, 3000L * 1000 * 1000, 1L, 32)
        .select(expr("bit_xor(xxhash64(id))")).head()
    def shuffle(): Unit =
      spark.range(0L, 8L * 1000 * 1000, 1L, 32)
        .select((col("id") % 1000003L).as("k"))
        .repartition(32, col("k"))
        .groupBy(col("k")).agg(count(lit(1)).as("c"))
        .select(expr("bit_xor(xxhash64(k, c))")).head()
    cpu(); shuffle() // throwaway: one-time codegen
    val cs = (1 to reps).map(_ => time(cpu()))
    val ss = (1 to reps).map(_ => time(shuffle()))
    def stats(xs: Seq[Double]) =
      f"median ${xs.sorted.apply(xs.size / 2)}%.3f  all ${xs.map(x => f"$x%.3f").mkString(" ")}"
    println(s"[calprobe] cpu:     ${stats(cs)}")
    println(s"[calprobe] shuffle: ${stats(ss)}")
    spark.stop()
  }
}
