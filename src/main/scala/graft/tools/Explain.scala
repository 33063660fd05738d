package graft.tools

import graft.{GraftSession, SparkEntry}

/** Dev-only plan/timing inspector: `runMain graft.tools.Explain <sfDir>
  * <query> [reps]` — prints the formatted plan once, then wall-clock per
  * rep (first rep = cold). Not part of the driver contract. */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val name = args(1)
    val reps = args.drop(2).headOption.map(_.toInt).getOrElse(3)
    val spark = GraftSession.build("graft-explain")
    // warm-up may fail when the flagship's fixture is absent — report, and
    // carry on (the timed reps are the point)
    try SparkEntry.entry(spark).count()
    catch { case e: Exception => System.err.println(s"[explain] warm-up skipped: $e") }
    val fn = SparkEntry.queries(name)
    if (sys.env.get("GRAFT_EXPLAIN_PLAN").contains("1")) // opt-in
      fn(spark, sfDir).explain("formatted")
    for (i <- 1 to reps) {
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      println(f"[explain] $name rep $i: ${(System.nanoTime() - t0) / 1e9}%.3f s ($n rows)")
    }
    spark.stop()
  }
}
