package graft.tools

import java.util.concurrent.ConcurrentLinkedQueue

import org.apache.spark.scheduler._

import graft.{GraftSession, SparkEntry}

/** Dev-only job/stage profiler: `runMain graft.tools.Profile <sfDir> <query>
  * [reps]` — runs the query like Bench does (`.count()`), with a listener
  * recording every job and stage, then prints per-rep wall, job count,
  * stage count, summed executor task time, and the top stages by task time
  * — the local stand-in for the Spark UI's stage page (the UI is disabled
  * in this harness). Scheduling/barrier overhead shows up as the gap
  * between wall-clock and max-concurrent task time. Not part of the driver
  * contract. */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val name = args(1)
    val reps = args.drop(2).headOption.map(_.toInt).getOrElse(3)
    val spark = GraftSession.build("graft-profile")
    try SparkEntry.entry(spark).count()
    catch { case e: Exception => System.err.println(s"[profile] warm-up skipped: $e") }

    case class StageRec(id: Int, name: String, tasks: Int, taskTimeMs: Long,
                        wallMs: Long, shuffleReadMb: Double, shuffleWriteMb: Double)
    val stages = new ConcurrentLinkedQueue[StageRec]()
    val jobs = new ConcurrentLinkedQueue[(Int, Long)]() // id, wallMs
    val listener = new SparkListener {
      private val jobStart = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
      override def onJobStart(e: SparkListenerJobStart): Unit =
        jobStart.put(e.jobId, e.time)
      override def onJobEnd(e: SparkListenerJobEnd): Unit = {
        val t0 = Option(jobStart.get(e.jobId)).getOrElse(e.time)
        jobs.add((e.jobId, e.time - t0))
      }
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val si = e.stageInfo
        val wall = (for {a <- si.completionTime; b <- si.submissionTime} yield a - b)
          .getOrElse(0L)
        val m = si.taskMetrics
        stages.add(StageRec(si.stageId, si.name.takeWhile(_ != '\n').take(90),
          si.numTasks,
          if (m == null) 0L else m.executorRunTime,
          wall,
          if (m == null) 0.0 else m.shuffleReadMetrics.totalBytesRead / 1e6,
          if (m == null) 0.0 else m.shuffleWriteMetrics.bytesWritten / 1e6))
      }
    }
    val fn = SparkEntry.queries(name)
    for (i <- 1 to reps) {
      stages.clear(); jobs.clear()
      spark.sparkContext.addSparkListener(listener)
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      val wall = (System.nanoTime() - t0) / 1e9
      // drain listener events before reading (the bus is private; a short
      // sleep is enough for a dev tool)
      Thread.sleep(300)
      spark.sparkContext.removeSparkListener(listener)
      import scala.jdk.CollectionConverters._
      val ss = stages.asScala.toSeq
      val js = jobs.asScala.toSeq
      println(f"[profile] $name rep $i: wall=$wall%.3f s rows=$n " +
        f"jobs=${js.size} stages=${ss.size} tasks=${ss.map(_.tasks).sum} " +
        f"taskTime=${ss.map(_.taskTimeMs).sum / 1e3}%.2f s " +
        f"stageWall=${ss.map(_.wallMs).sum / 1e3}%.2f s " +
        f"jobWall=${js.map(_._2).sum / 1e3}%.2f s")
      if (i == reps) {
        ss.sortBy(-_.taskTimeMs).take(12).foreach(s =>
          println(f"[profile]   stage ${s.id}%4d ${s.tasks}%3d tasks " +
            f"task=${s.taskTimeMs / 1e3}%6.2f s wall=${s.wallMs / 1e3}%6.2f s " +
            f"shR=${s.shuffleReadMb}%7.2f MB shW=${s.shuffleWriteMb}%7.2f MB  ${s.name}"))
      }
    }
    spark.stop()
  }
}
