package graft.tools

import java.util.concurrent.ConcurrentLinkedQueue

import org.apache.spark.scheduler._

import graft.{GraftSession, SparkEntry}

/** Dev-only whole-suite profiler: `runMain graft.tools.ProfileAll <sfDir>
  * [q1,q2,...] [reps]` — runs every registered query once (like Bench: `.count()`),
  * with a listener attributing jobs/stages/tasks to the in-flight query.
  * Prints one line per query:
  *
  *   wall, jobs, stages, tasks, taskTime (summed executor run time),
  *   bigSerial (summed task time of stages that ran on ONE task and took
  *   ≥ 100 ms — the serialized-CPU symptom the pre-explosion-repartition
  *   doctrine fixes), barrier = wall − stageWallMax estimate.
  *
  * Used by the optimization rounds to rank targets; not part of the driver
  * contract. */
object ProfileAll {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    // optional 2nd arg: comma-separated query subset; 3rd arg: reps per query
    val wanted = args.drop(1).headOption
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val reps = args.drop(2).headOption.map(_.toInt).getOrElse(1)
    val spark = GraftSession.build("graft-profile-all")
    try SparkEntry.entry(spark).count()
    catch { case e: Exception => System.err.println(s"[profileall] warm-up skipped: $e") }

    val stages = new ConcurrentLinkedQueue[(Int, Int, Long, Long)]() // id, tasks, taskMs, wallMs
    // AtomicInteger: incremented from the listener-bus thread, read from
    // main — a plain var could lose or read stale counts (r16 advisory)
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new SparkListener {
      override def onJobEnd(e: SparkListenerJobEnd): Unit = jobs.incrementAndGet()
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val si = e.stageInfo
        val wall = (for {a <- si.completionTime; b <- si.submissionTime} yield a - b)
          .getOrElse(0L)
        val m = si.taskMetrics
        stages.add((si.stageId, si.numTasks, if (m == null) 0L else m.executorRunTime, wall))
      }
    }
    spark.sparkContext.addSparkListener(listener)
    import scala.jdk.CollectionConverters._
    for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)
           .filter { case (n, _) => wanted.forall(_.contains(n)) };
         r <- 1 to reps) {
      stages.clear(); jobs.set(0)
      val t0 = System.nanoTime()
      val err = try { fn(spark, sfDir).count(); None } catch {
        case e: Throwable => Some(e.getClass.getSimpleName)
      }
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(150) // let the listener drain
      val ss = stages.asScala.toSeq
      val taskTime = ss.map(_._3).sum / 1e3
      val stageWall = ss.map(_._4).sum / 1e3
      val bigSerial = ss.filter(s => s._2 == 1 && s._3 >= 100).map(_._3).sum / 1e3
      println(f"[pa] $name rep=$r wall=$wall%.3f jobs=${jobs.get} stages=${ss.size} " +
        f"tasks=${ss.map(_._2).sum} task=$taskTime%.2f stageWall=$stageWall%.2f " +
        f"serial1=$bigSerial%.2f${err.map(e => s" ERR=$e").getOrElse("")}")
    }
    spark.stop()
  }
}
