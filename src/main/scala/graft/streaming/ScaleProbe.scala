package graft.streaming

import java.nio.file.{Files, Path, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.GraftSession

/** Streaming state-store scale probe (r14 verdict task 3): runs the
  * stateful streaming family on a SCALED events corpus (the ×16 fuzz
  * variant) delivered as time-ordered micro-batches, and records, per
  * query, wall-clock plus the per-micro-batch `stateOperators` curve
  * (rows total/updated/removed, memory/RocksDB bytes) from
  * StreamingQueryProgress. Launch under `SPARK_GRAFT_ROCKSDB=1` for the
  * RocksDB arm; default HDFS-backed store otherwise.
  *
  * Delivery shape: the corpus is sliced into `slices` TIME-ORDERED
  * single-file parquets with pinned modification times (the file source
  * processes oldest-first), `maxFilesPerTrigger=1` — so the watermark
  * advances batch by batch and state EVICTION is visible in the curve,
  * not just final state size. Time-ordered delivery keeps append-mode
  * results identical to the one-batch run (the StreamingSpec
  * slicing-independence invariant), so this probe measures machinery,
  * never different semantics. Dev-only; not part of the driver contract.
  *
  * Usage: runMain graft.streaming.ScaleProbe <sfDir> <outDir> [slices]
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val sfDir  = args.headOption.getOrElse("/tmp/fuzz_scale")
    val outDir = Paths.get(args.lift(1).getOrElse("/tmp/stream_scale"))
    val slices = args.lift(2).map(_.toInt).getOrElse(12)
    Files.createDirectories(outDir)
    val spark = GraftSession.build("graft-stream-scale")
    // the probe's whole point is the per-micro-batch curve: widen the
    // progress ring buffer well past slices + no-data batches (default 100
    // silently drops the OLDEST updates — r15 ADVICE), and turn on the
    // dev-only capture hook for the duration of the probe
    spark.conf.set("spark.sql.streaming.numRecentProgressUpdates",
      math.max(1000, slices * 8).toString)
    MemorySinkRunner.captureProgress = true

    val all = sliceTimeOrdered(spark,
      graft.sources.Tables.events(spark, sfDir), slices, "all", "ts_sec")
    def typed(t: String) = sliceTimeOrdered(spark,
      graft.sources.Tables.events(spark, sfDir).where(col("event_type") === t),
      math.max(slices / 2, 2), t, "ts_sec")
    val p = typed("purchase")
    val v = typed("view")
    // documents' ingest time is BaseSec + doc_id (StreamingNearDup), so
    // id-ordered slices ARE time-ordered slices
    val docs = sliceTimeOrdered(spark,
      graft.sources.Tables.documents(spark, sfDir).where(col("doc_id").isNotNull),
      slices, "docs", "doc_id")
    val mfpt = Map("maxFilesPerTrigger" -> "1")

    val runs: Seq[(String, () => DataFrame)] = Seq(
      "q_streaming_near_dup" -> (() =>
        StreamingNearDup.nearDupFlagsFrom(spark, docs, mfpt)),
      "q_streaming_hourly" -> (() =>
        StreamingHourly.closedHourlyMetricsFrom(spark, all, mfpt)),
      "q_streaming_sliding" -> (() =>
        StreamingHourly.slidingHourCountsFrom(spark, all, mfpt)),
      "q_streaming_sessions" -> (() =>
        StreamingSessions.closedSessionsFrom(spark, all, mfpt)),
      "q_streaming_update_mode" -> (() =>
        StreamingSessions.updatedUserHourlyFrom(spark, all, mfpt)),
      "q_streaming_dedup" -> (() =>
        StreamingDedup.dedupedTypeCountsFrom(spark, all, mfpt)),
      "q_streaming_full_outer_join" -> (() =>
        StreamingJoin.purchaseViewPairsFullFrom(spark, p, v, mfpt)),
      "q_streaming_join_hourly" -> (() =>
        StreamingJoin.purchaseViewPairsHourlyFrom(spark, p, v, mfpt)))

    for ((name, f) <- runs) {
      MemorySinkRunner.lastRunProgress = Nil // never attribute a stale curve
      val t0 = System.nanoTime()
      val rows = f().count()
      val wall = (System.nanoTime() - t0) / 1e9
      val lines = MemorySinkRunner.lastRunProgress
      Files.write(outDir.resolve(s"$name.jsonl"),
        lines.mkString("", "\n", "\n").getBytes("UTF-8"))
      println(f"""[sprobe] {"query":"$name","wall_s":$wall%.3f,"result_rows":$rows,"batches":${lines.size}}""")
    }
    MemorySinkRunner.captureProgress = false
    MemorySinkRunner.lastRunProgress = Nil
    spark.stop()
  }

  /** Write `k` time-ordered single-file parquet slices of `df` under a
    * fresh directory, modification times pinned ascending (the file
    * source's delivery order), and return the directory path. */
  private def sliceTimeOrdered(spark: SparkSession, df: DataFrame,
                               k: Int, tag: String, timeCol: String): String = {
    import scala.jdk.CollectionConverters._
    val events = df.select(col("*"))
    val r = events.agg(min(col(timeCol)), max(col(timeCol))).head()
    // an empty/filtered-to-nothing corpus yields null min/max — fail with
    // a message naming the real problem, not an NPE (r15 ADVICE)
    require(!r.isNullAt(0),
      s"sliceTimeOrdered($tag): events frame is empty — nothing to slice")
    val (lo, hi) = (r.getLong(0), r.getLong(1))
    val step = (hi - lo) / k + 1
    val srcDir = Files.createTempDirectory(s"graft_scale_slices_$tag")
    var written = 0
    for (i <- 0 until k) {
      val slice = events.where(col(timeCol) >= lo + i * step
        && col(timeCol) < lo + (i + 1) * step)
      // step rounding can leave trailing slices empty: an empty write would
      // still emit a zero-row part file and burn a no-op trigger per empty
      // slice — skip them up front, renumbering densely so delivery order
      // stays contiguous (r15 ADVICE)
      if (!slice.isEmpty) {
        val tmp = Files.createTempDirectory(s"graft_scale_slice_${tag}_$i")
        slice.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
        val part: Path = {
          val listing = Files.list(tmp)
          try listing.iterator().asScala
            .filter(_.getFileName.toString.endsWith(".parquet"))
            .nextOption()
            .getOrElse(throw new IllegalStateException(
              s"sliceTimeOrdered($tag): slice $i wrote no parquet part file under $tmp"))
          finally listing.close()
        }
        val dest = srcDir.resolve(f"slice_$written%02d.parquet")
        Files.move(part, dest)
        Files.setLastModifiedTime(dest,
          java.nio.file.attribute.FileTime.fromMillis(1000000000000L + written * 60000L))
        written += 1
      }
    }
    require(written > 0,
      s"sliceTimeOrdered($tag): all $k slices were empty — check the time-range math")
    srcDir.toString
  }
}
