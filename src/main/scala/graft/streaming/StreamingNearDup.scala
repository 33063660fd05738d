package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.functions.Cols
import graft.operators.Dedup

/** Streaming NEAR-duplicate suppression (r15 verdict task 2) — the online
  * corpus-ingest shape a 100 TB/day pipeline runs: an arriving document is
  * flagged as a near-duplicate when an LSH band bucket collides with an
  * in-horizon predecessor whose minhash signature verifies at ≥ the
  * Jaccard threshold. The batch near-dup family
  * ([[graft.operators.Dedup.nearDupMinhash]]) decides membership offline;
  * this operator makes the SAME decision rule incremental, with state
  * bounded by the watermark horizon.
  *
  * Decision rule (any-predecessor semantics — deterministic and
  * order-independent, so a batch oracle can recompute it exactly):
  * document `d` is flagged in band `b` iff some document `e` with
  * `t_e < t_d` and `t_d − t_e ≤ horizon` shares band `b`'s packed key and
  * `|{i : sig_e[i] = sig_d[i]}| ≥ ⌈τ·64⌉`. A document's overall flag is
  * "flagged in ≥ 1 band". (NOT chain semantics: `e` being itself a
  * duplicate does not exempt `d` — at ingest time every retained-or-not
  * predecessor within the horizon is evidence of duplication.)
  *
  * Shape, and why it scales:
  *  - The 64-component signature is computed ROW-LOCALLY in a typed map
  *    (one md5 per shingle, 64 affine-min folds in plain JVM code) — no
  *    shuffle, no streaming aggregation, and none of the CollapseProject
  *    duplication a 64-way higher-order-expression projection risks. The
  *    constants are [[Dedup.perms]]/[[Dedup.MinhashPrime]] and the hash is
  *    the portable 48-bit md5 value, so the SQL oracle reuses the batch
  *    minhash CTE verbatim.
  *  - Each document fans out to 32 (band, packed-key) rows; the ONLY
  *    shuffle is the hash exchange on those keys into the stateful
  *    operator — exactly the banded-join economics of the batch LSH, made
  *    incremental.
  *  - State per band bucket is the in-horizon entry list; entries are
  *    dropped as soon as the watermark passes `t + horizon` (event-time
  *    timeout), so total state is bounded by the horizon's document count
  *    × 32 bands regardless of stream length — the plateau property
  *    measured for the exact-dedup family in BENCH_streaming_scale_r15
  *    and for this operator at ×64 in BENCH_streaming_scale_r16.
  *  - Per-arrival verify cost is a scan of the bucket's in-horizon entry
  *    list with an EARLY EXIT on the first verifying predecessor — true
  *    duplicates (the common hot-bucket mass, e.g. the megadup gate's
  *    boilerplate) match on the first compare, so a hot bucket of m
  *    near-identical docs costs O(m) total, not O(m²); only an
  *    adversarial bucket of band-colliding NON-duplicates degrades to the
  *    horizon-bounded quadratic, the same worst case the batch banded
  *    join carries (and the LSH banding makes rare by construction).
  *
  * Documents carry no timestamp, so ingest time is pinned as
  * `t = BaseSec + doc_id` seconds (strictly increasing in doc_id — ties
  * impossible, which makes "predecessor" unambiguous and lets the oracle
  * write the horizon rule as an id-distance bound).
  */
object StreamingNearDup {

  /** Jaccard threshold τ = 0.5 (the batch dedup threshold): flag at ≥ 32
    * of 64 equal signature components. */
  val MinEqual = 32
  /** Ingest-time horizon: only predecessors within 300 s (= 300 doc_ids)
    * count as duplication evidence. */
  val HorizonSec = 300L
  /** Watermark delay for late documents. */
  val DelaySec = 600L
  /** Epoch base for the pinned per-document ingest time. */
  val BaseSec = 1600000000L

  private val bands = Dedup.NumHashes / Dedup.BandRows
  // flat constant arrays: the signature fold indexes these per distinct
  // shingle hash × 64 — tuple-Seq indexing in that loop would allocate
  private val permA = Dedup.perms.map(_._1).toArray
  private val permB = Dedup.perms.map(_._2).toArray

  /** One exploded band row of an arriving document. */
  case class BandRow(doc_id: Long, t_sec: Long, band: Int, bkey: Long,
                     sig: Array[Long], event_time: java.sql.Timestamp)

  /** Per-bucket state: the in-horizon predecessors. */
  case class Entry(doc_id: Long, t_sec: Long, sig: Array[Long])
  case class BucketState(entries: List[Entry])

  /** Per-(document, band) verdict emitted on arrival. */
  case class BandFlag(doc_id: Long, band: Int, is_dup: Boolean)

  /** Row-local portable minhash signature — the JVM mirror of
    * [[Dedup.signaturesOnShingles]] with [[Dedup.PortableHash]]: shingles
    * are word 3-grams over a literal-space split (`split(text, " ")`
    * semantics, short texts collapse to one whole-text shingle), the
    * shingle hash is the integer value of the first 12 md5 hex chars
    * mod p, and component i is `min((a_i·h + b_i) mod p)`. One md5 per
    * shingle, then 64 affine folds over the distinct hash values. */
  private[graft] def signature(text: String): Array[Long] = {
    val toks = text.split(" ", -1)
    val shingles =
      if (toks.length < 3) Array(text)
      else Array.tabulate(toks.length - 2)(i => s"${toks(i)} ${toks(i + 1)} ${toks(i + 2)}")
    val md = java.security.MessageDigest.getInstance("MD5")
    // distinct hash values: minimums are set functions, and hashing each
    // distinct shingle once is the row-local analogue of the batch path's
    // per-(doc, shingle) row it aggregates over
    val hs = new java.util.HashSet[Long]()
    shingles.foreach { s =>
      val d = md.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      val h48 = (0 until 6).foldLeft(0L)((acc, j) => (acc << 8) | (d(j) & 0xffL))
      hs.add(h48 % Dedup.MinhashPrime)
    }
    val sig = Array.fill(Dedup.NumHashes)(Long.MaxValue)
    val it = hs.iterator()
    while (it.hasNext) {
      val h = it.next()
      var i = 0
      while (i < Dedup.NumHashes) {
        val v = (permA(i) * h + permB(i)) % Dedup.MinhashPrime
        if (v < sig(i)) sig(i) = v
        i += 1
      }
    }
    sig
  }

  private def simCount(a: Array[Long], b: Array[Long]): Int = {
    var (i, n) = (0, 0)
    while (i < a.length) { if (a(i) == b(i)) n += 1; i += 1 }
    n
  }

  /** The stateful core: exploded band rows → per-bucket
    * flatMapGroupsWithState with event-time timeout eviction. */
  private[graft] def bandFlags(rows: Dataset[BandRow]): Dataset[BandFlag] = {
    val spark = rows.sparkSession
    import spark.implicits._
    rows
      .withWatermark("event_time", s"$DelaySec seconds")
      .groupByKey(r => (r.band, r.bkey))
      .flatMapGroupsWithState[BucketState, BandFlag](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (_: (Int, Long), it: Iterator[BandRow], state: GroupState[BucketState]) =>
          val wmSec = state.getCurrentWatermarkMs / 1000
          if (state.hasTimedOut) {
            // watermark passed the horizon of the youngest entry we timed
            // out on: drop what expired, keep (and re-arm for) the rest
            val live = state.getOption.map(_.entries).getOrElse(Nil)
              .filter(e => e.t_sec + HorizonSec >= wmSec)
            if (live.isEmpty) state.remove()
            else {
              state.update(BucketState(live))
              state.setTimeoutTimestamp((live.map(_.t_sec).max + HorizonSec) * 1000 + 1000)
            }
            Iterator.empty
          } else {
            // ingest order within the batch = event-time order (times are
            // strictly increasing in doc_id, so this is total)
            val sorted = it.toArray.sortBy(_.t_sec)
            var entries = state.getOption.map(_.entries).getOrElse(Nil)
            val out = sorted.map { r =>
              val dup = entries.exists(e =>
                e.t_sec < r.t_sec && r.t_sec - e.t_sec <= HorizonSec &&
                  simCount(e.sig, r.sig) >= MinEqual)
              entries = Entry(r.doc_id, r.t_sec, r.sig) :: entries
              BandFlag(r.doc_id, r.band, dup)
            }
            // horizon-expired entries can never flag a future arrival
            // (future t ≥ watermark under in-order delivery)
            val live = entries.filter(e => e.t_sec + HorizonSec >= wmSec)
            if (live.isEmpty) state.remove()
            else {
              state.update(BucketState(live))
              state.setTimeoutTimestamp((live.map(_.t_sec).max + HorizonSec) * 1000 + 1000)
            }
            out.iterator
          }
      }
  }

  /** Documents stream → exploded band rows (the row-local signature plus
    * the 32 packed band keys, one typed flatMap — no shuffle). */
  private[graft] def explodeBands(docs: DataFrame): Dataset[BandRow] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .where(col("doc_id").isNotNull && col("text").isNotNull)
      .select(col("doc_id").cast("long"), col("text"),
        timestamp_seconds(lit(BaseSec) + col("doc_id")).as("event_time"))
      .as[(Long, String, java.sql.Timestamp)]
      .flatMap { case (id, text, ts) =>
        val sig = signature(text)
        val t = BaseSec + id
        (0 until bands).iterator.map { b =>
          val bkey = sig(b * Dedup.BandRows) * 2147483648L + sig(b * Dedup.BandRows + 1)
          BandRow(id, t, b, bkey, sig, ts)
        }
      }
  }

  /** Oracle-facing run: the documents table as a file stream, flagged
    * in-stream, then profiled per document on the captured output (the
    * batch post-processing of the capture is the established
    * StreamingDedup precedent). Output per document: how many of its 32
    * bands saw an in-horizon verified predecessor, and the overall flag. */
  def nearDupFlags(spark: SparkSession, dir: String): DataFrame =
    nearDupFlagsFrom(spark, stagedDocsDir(spark, dir), Map.empty)

  /** [[nearDupFlags]] over an explicit staged source + options — the
    * slicing-independence / ScaleProbe hook. */
  private[graft] def nearDupFlagsFrom(spark: SparkSession, path: String,
                                      options: Map[String, String]): DataFrame = {
    val docs = spark.readStream.options(options)
      .schema(StreamingHourly.stagedSchema(spark, path)).parquet(path)
    val flags = bandFlags(explodeBands(docs))
    // flags emit in the data batch that carries the arrival; the no-data
    // batch would only evict state the run is about to discard
    MemorySinkRunner.run(spark, flags.toDF(), "graft_stream_neardup",
        shufflePartitions = 8, needNoDataBatch = false)
      .groupBy(col("doc_id"))
      .agg(Cols.countWhen(col("is_dup")).as("dup_bands"),
        max(col("is_dup")).as("is_dup"))
      .orderBy(col("doc_id"))
  }

  /** Staged single-table copy of documents.parquet for the file source
    * (same stamp/marker discipline as [[StreamingHourly.stagedEventsDir]]). */
  private[graft] def stagedDocsDir(spark: SparkSession, dir: String): String =
    synchronized {
      import java.nio.file.{Files, Paths}
      val src = Paths.get(s"$dir/documents.parquet")
      val d = Paths.get(System.getProperty("java.io.tmpdir"),
        s"graft_stream_docs_${Integer.toHexString(dir.hashCode)}")
      val marker = d.resolve("_staged")
      val stamp = s"${Files.size(src)}:${Files.getLastModifiedTime(src).toMillis}:4"
      val valid = Files.exists(marker) &&
        new String(Files.readAllBytes(marker), "UTF-8") == stamp
      if (!valid) {
        spark.read.parquet(src.toString).repartition(4)
          .write.mode("overwrite").parquet(d.toString)
        Files.write(marker, stamp.getBytes("UTF-8"))
      }
      d.toString
    }
}
