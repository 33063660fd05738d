package graft.streaming

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Shared harness for the oracle-facing streaming queries: run an
  * append-mode plan to completion against the memory sink and hand back the
  * captured table. Owns the bits the three streaming query families were
  * each duplicating — unique query naming, the shuffle-partition override
  * (the partition count bakes into the checkpoint, and state-store
  * open/commit per partition per micro-batch is pure overhead for small
  * result sets), and start/processAllAvailable/stop discipline. The session
  * conf is restored immediately after start(): the running query keeps the
  * cloned session it captured at start. */
private[streaming] object MemorySinkRunner {
  private val counter = new AtomicInteger()

  def run(spark: SparkSession, df: DataFrame, namePrefix: String,
          shufflePartitions: Int): DataFrame = {
    val name = s"${namePrefix}_${counter.incrementAndGet()}"
    val prevParts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", shufflePartitions.toString)
    val q =
      try df.writeStream
        .format("memory").queryName(name)
        .outputMode("append")
        .start()
      finally spark.conf.set("spark.sql.shuffle.partitions", prevParts)
    try q.processAllAvailable() finally q.stop()
    spark.table(name)
  }
}
