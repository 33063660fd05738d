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
    try SparkEntry.entry(spark).count() catch { case _: Throwable => () }
    val fn = SparkEntry.queries(name)
    if (sys.env.get("GRAFT_EXPLAIN_PLAN").forall(_ == "1"))
      fn(spark, sfDir).explain("formatted")
    for (i <- 1 to reps) {
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      println(f"[explain] $name rep $i: ${(System.nanoTime() - t0) / 1e9}%.3f s ($n rows)")
    }
    spark.stop()
  }
}
