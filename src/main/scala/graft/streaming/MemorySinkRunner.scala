package graft.streaming

import java.nio.file.{Files, Path, Paths}
import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Shared harness for the oracle-facing streaming queries: run an
  * append-mode plan to completion against the memory sink and hand back the
  * captured result. Owns the bits the streaming query families were each
  * duplicating — unique query naming, the shuffle-partition override (the
  * partition count bakes into the checkpoint, and state-store open/commit
  * per partition per micro-batch is pure overhead for small result sets),
  * and start/processAllAvailable/stop discipline.
  *
  * Lifecycle contract: the result is COPIED out of the memory sink into a
  * local relation, the sink's temp view is dropped and its one-run
  * checkpoint deleted before returning — nothing accumulates in driver
  * memory or on disk across invocations. Checkpoints live on tmpfs when
  * available (/dev/shm): offset/commit-log and state-store file IO is the
  * micro-batch latency floor, and these checkpoints are throwaways by
  * construction (each run gets a fresh name). The whole run is serialized
  * on this object: the session-conf override around start() would race any
  * concurrent planner in the same session, so only one streaming oracle
  * query starts at a time (concurrent STREAMING execution belongs to
  * ClickstreamPipeline, which owns its queries' confs up front).
  */
private[streaming] object MemorySinkRunner {
  private val counter = new AtomicInteger()

  private def checkpointRoot: Path = {
    val shm = Paths.get("/dev/shm")
    val base =
      if (Files.isDirectory(shm) && Files.isWritable(shm)) shm
      else Paths.get(System.getProperty("java.io.tmpdir"))
    base.resolve("graft_ck")
  }

  private def deleteRecursively(p: Path): Unit =
    if (Files.exists(p)) {
      import scala.jdk.CollectionConverters._
      val walk = Files.walk(p)
      try walk.sorted(java.util.Comparator.reverseOrder()).iterator.asScala
        .foreach(f => try Files.delete(f) catch { case _: Throwable => () })
      finally walk.close()
    }

  def run(spark: SparkSession, df: DataFrame, namePrefix: String,
          shufflePartitions: Int, outputMode: String = "append"): DataFrame = synchronized {
    val name  = s"${namePrefix}_${counter.incrementAndGet()}"
    val ckDir = Files.createDirectories(checkpointRoot).resolve(name)
    val prevParts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", shufflePartitions.toString)
    val q =
      try df.writeStream
        .format("memory").queryName(name)
        .option("checkpointLocation", ckDir.toString)
        .outputMode(outputMode)
        .start()
      finally spark.conf.set("spark.sql.shuffle.partitions", prevParts)
    try {
      try q.processAllAvailable() finally q.stop()
      val sunk = spark.table(name)
      val local = spark.createDataFrame(
        java.util.Arrays.asList(sunk.collect(): _*), sunk.schema)
      spark.catalog.dropTempView(name)
      local
    } finally deleteRecursively(ckDir)
  }
}
