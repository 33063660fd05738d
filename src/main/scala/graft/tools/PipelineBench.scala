package graft.tools

import java.nio.file.Files
import java.sql.DriverManager

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.GraftSession
import graft.sources.EventGenerator
import graft.streaming.{ClickstreamPipeline, Sinks}

/** End-to-end throughput benchmark of the PRODUCTION pipeline — generated
  * wire events → Parse → the 4 concurrent streaming queries → real sinks
  * (parquet for the raw audit + hourly rollup, embedded-Derby JDBC upsert
  * for sessions and overwrite for the dashboard, the reference's sink
  * shapes). Prints one JSON line with sustained events/s.
  *
  * Trigger note: the reference schedules its queries at 90 s / 3 m / 5 m /
  * 3 m ProcessingTime triggers — interval triggers only add IDLE time
  * between batches, they do not change per-batch processing cost, so
  * capacity is measured at Trigger.ProcessingTime(0) (process as fast as
  * batches form) and the JSON also reports per-query busy time, from which
  * the events/s sustainable at any trigger interval follows directly
  * (rows/batch ÷ busy-sec/batch). The reference's own envelope is 5
  * events/s from its single-core producer.
  *
  * `runMain graft.tools.PipelineBench [nEvents] [chunks]` — defaults
  * 100000 / 10; the feed is chunked so the queries chew through several
  * micro-batches rather than one monolith. Dev tool, not driver contract.
  */
object PipelineBench {
  def main(args: Array[String]): Unit = {
    val n      = args.headOption.map(_.toInt).getOrElse(100000)
    val chunks = args.drop(1).headOption.map(_.toInt).getOrElse(10)
    val spark  = GraftSession.build("graft-pipeline-bench")
    import spark.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext

    // generation is NOT part of the measured window
    val gen  = new EventGenerator(seed = 42)
    val wire = gen.asWire(spark, n).withColumn("timestamp", current_timestamp())
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getAs[java.sql.Timestamp](2)))

    val url  = "jdbc:derby:memory:pipebench;create=true"
    val conn = DriverManager.getConnection(url)
    conn.createStatement().execute(
      """CREATE TABLE sessions (
        |  session_id VARCHAR(64) PRIMARY KEY, user_id VARCHAR(64),
        |  start_time TIMESTAMP, end_time TIMESTAMP,
        |  total_events BIGINT, page_views BIGINT, add_to_cart_events BIGINT,
        |  purchases BIGINT, total_purchase_amount DECIMAL(10,2),
        |  session_duration_seconds INT, converted BOOLEAN)""".stripMargin)
    conn.close()
    val jdbc = Sinks.Jdbc(url, "", "", dialect = Sinks.AnsiMerge)
    val sessionCols = Seq("session_id", "user_id", "start_time", "end_time",
      "total_events", "page_views", "add_to_cart_events", "purchases",
      "total_purchase_amount", "session_duration_seconds", "converted")

    val outDir = Files.createTempDirectory("graft_pipebench_out")
    val ckpt   = Files.createTempDirectory("graft_pipebench_ckpt").toString
    val sinks = ClickstreamPipeline.SinkSet(
      raw = Sinks.parquetAppend(s"$outDir/raw"),
      sessions = jdbc.upsert("sessions", "session_id", sessionCols.filterNot(_ == "session_id"),
        stagingColumnTypes = Some("session_id VARCHAR(64), user_id VARCHAR(64)")),
      hourly = Sinks.parquetAppend(s"$outDir/hourly"),
      dashboard = jdbc.overwrite("dashboard"))

    val mem = MemoryStream[(String, String, java.sql.Timestamp)]
    val kafkaShaped = mem.toDF().toDF("key", "value", "timestamp")

    val t0 = System.nanoTime()
    val qs = ClickstreamPipeline.start(kafkaShaped, sinks,
      ClickstreamPipeline.Config(ckpt,
        rawTrigger = Trigger.ProcessingTime(0), sessionTrigger = Trigger.ProcessingTime(0),
        hourlyTrigger = Trigger.ProcessingTime(0), dashboardTrigger = Trigger.ProcessingTime(0)))
    try {
      wire.grouped(math.max(1, n / chunks)).foreach { chunk =>
        mem.addData(chunk.toSeq)
        Thread.sleep(20) // let concurrent triggers observe distinct offsets
      }
      qs.foreach(_.processAllAvailable())
      val wallSec = (System.nanoTime() - t0) / 1e9
      val perQuery = qs.map { q =>
        val ps = q.recentProgress
        val busyMs = ps.map(_.durationMs.getOrDefault("triggerExecution", 0L).toLong).sum
        s""""${q.name}":{"batches":${ps.length},"input_rows":${ps.map(_.numInputRows).sum},"busy_ms":$busyMs}"""
      }.mkString(",")
      println(f"""{"metric":"pipeline_events_per_sec","value":${n / wallSec}%.0f,"unit":"events/sec","events":$n,"wall_sec":$wallSec%.2f,"queries":{$perQuery}}""")
    } finally {
      qs.foreach(_.stop())
      spark.stop()
    }
  }
}
