package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}

/** Idle-host profiler for the [[graft.operators.Spectral.powerIteration]]
  * loop: counts Spark jobs and wall-clock per phase so a slow reading can
  * be attributed to driver round-trips (many tiny jobs) vs real work —
  * the r12 verdict's open question on q_top_eigenvector. Run at
  * loadavg < 1; pairs with [[CalProbe]] for the bracketing samples. */
object EigProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.GraftSession.build("graft-eig-profile")
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = { jobs.incrementAndGet(); () }
    })
    def timed(label: String)(f: => Long): Unit = {
      // listener events are async; a short settle keeps job counts phased
      Thread.sleep(300)
      val j0 = jobs.get(); val t0 = System.nanoTime()
      val n = f
      val dt = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300)
      System.err.println(f"[eig] $label%-28s $dt%6.3f s  jobs=${jobs.get() - j0}%3d  rows=$n")
    }
    val emb = graft.sources.Tables.embeddings(spark, sfDir)
    // warm the session/codegen so phase numbers are steady-state
    timed("warmup gram")(graft.operators.Spectral.gramMatrix(emb).count())
    timed("gram")(graft.operators.Spectral.gramMatrix(emb).count())
    for (rep <- 1 to 3)
      timed(s"powerIteration rep$rep")(graft.operators.Spectral.powerIteration(emb).count())
    spark.stop()
  }
}
