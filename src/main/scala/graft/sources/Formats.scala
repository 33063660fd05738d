package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** Alternate at-rest formats (§2.1 widened): the documents table staged once
  * as JSON-lines and as CSV, then read back through `spark.read.json/csv`
  * with an EXPLICIT schema (no inference pass — schema-on-read is declared,
  * exactly like the parquet footers and the streaming `from_json` contract).
  *
  * The oracle-facing queries aggregate a per-source census INCLUDING a
  * text-fidelity lane (sum of md5₄₈(text) per source): any mangling the
  * format round-trip could introduce — CSV quoting/escaping of embedded
  * delimiters, JSON unicode escapes — would shift the checksum, so equality
  * with the parquet-side oracle proves the format path is lossless, not
  * just row-count-preserving.
  *
  * Scale shape: staging is a one-time write (stamped by the source file's
  * (size, mtime), same doctrine as the streaming staging); reads are plain
  * declarative scans. JSON/CSV scans cannot push down column pruning the
  * way parquet does — which is precisely why this engine treats them as
  * ingest formats that land INTO parquet, never as the at-rest format; the
  * scaladoc here is the documented trade.
  */
object Formats {

  /** Explicit documents schema (matches the driver's parquet columns). */
  private val docSchema = StructType(Seq(
    StructField("doc_id", LongType), StructField("lang", StringType),
    StructField("source", StringType), StructField("n_chars", LongType),
    StructField("text", StringType)))

  private def stagedDir(spark: SparkSession, dir: String, fmt: String): String =
    synchronized {
      import java.nio.file.{Files, Paths, StandardCopyOption}
      val src = Paths.get(s"$dir/documents.parquet")
      // v2: the stamp carries a staging-format version so a WRITER-option
      // change (e.g. the r13 whitespace-trim fix) invalidates cached
      // stagings — (size, mtime) alone would happily reuse a staging
      // written under the old, lossy options
      val stamp = s"v4:${Files.size(src)}:${Files.getLastModifiedTime(src).toMillis}"
      // The source stamp is part of the directory NAME, and a staging is
      // written to a process-unique tmp dir then atomically renamed into
      // place — so a published staging is immutable and complete by
      // construction. Concurrent JVMs (bench + verify sweep share
      // java.io.tmpdir) either see the finished directory or stage their
      // own copy and lose the rename race; none can observe a partial
      // rewrite. A regenerated source lands under a NEW name; stale
      // stagings just become unreferenced.
      val d = Paths.get(System.getProperty("java.io.tmpdir"),
        s"graft_fmt_${Integer.toHexString((dir + "@" + stamp).hashCode)}_$fmt")
      if (!Files.exists(d)) {
        val tmp = Paths.get(
          s"$d.tmp_${ProcessHandle.current().pid()}_${System.nanoTime()}")
        val docs = spark.read.parquet(src.toString)
          .select(docSchema.fieldNames.map(col): _*)
        val w = docs.repartition(4).write.mode("overwrite")
        fmt match {
          case "json" => w.json(tmp.toString)
          // quoteAll: embedded commas/quotes/newlines survive by construction.
          // ignore*WhiteSpace=false: the WRITER defaults these to true and
          // silently trims padded fields. nullValue sentinel: with the
          // default ("" both ways) a quoted empty string reads back as
          // NULL, so "" and NULL collapse — a real null writes the
          // sentinel, everything else round-trips verbatim. Both were
          // found by the r13 text-shape fuzz variant (padded docs came
          // back trimmed, empty docs came back null, shifting the
          // checksum lane this census exists to guard).
          case "csv"  => w.option("header", "true").option("quoteAll", "true")
            .option("ignoreLeadingWhiteSpace", "false")
            .option("ignoreTrailingWhiteSpace", "false")
            .option("nullValue", CsvNullSentinel).csv(tmp.toString)
          case "orc"  => w.orc(tmp.toString)
        }
        try Files.move(tmp, d, StandardCopyOption.ATOMIC_MOVE)
        catch {
          case race: java.nio.file.FileSystemException =>
            // EITHER another JVM published the same stamp first (its
            // directory is complete — rename-after-write — so our copy is
            // redundant) OR the move failed for a non-race reason (e.g.
            // AtomicMoveNotSupported across filesystems). Discard the tmp
            // copy in both cases, then verify the target actually exists:
            // a swallowed non-race failure would otherwise surface later
            // as a confusing read-of-missing-directory downstream.
            val walk = Files.walk(tmp)
            try walk.sorted(java.util.Comparator.reverseOrder())
              .forEach(p => Files.deleteIfExists(p))
            finally walk.close()
            if (!Files.exists(d)) throw race
        }
      }
      d.toString
    }

  private def census(docs: DataFrame): DataFrame =
    docs.groupBy(col("source"))
      .agg(count(lit(1)).as("docs"),
        sum(col("n_chars")).as("total_chars"),
        min(col("doc_id")).as("min_doc_id"), max(col("doc_id")).as("max_doc_id"),
        sum(graft.operators.Dedup.PortableHash(col("text"))).as("text_checksum"))
      .orderBy(col("source"))

  /** Census over the JSON-lines staging of documents. */
  def jsonSourceCensus(spark: SparkSession, dir: String): DataFrame =
    census(spark.read.schema(docSchema).json(stagedDir(spark, dir, "json")))

  /** Shared null sentinel for the CSV lane: a string that cannot occur in
    * a document (the corpus contract is space-separated tokens; this is
    * picked to survive even hostile fuzz corpora). With Spark's default
    * nullValue of "" the reader maps a QUOTED empty field to NULL, so
    * empty-string and null text would collapse — the r13 text-fuzz find. */
  private[graft] val CsvNullSentinel = "__graft_csv_null__"

  /** Census over the CSV staging of documents. `multiLine` handles quoted
    * embedded newlines; the writer quotes every field so embedded commas
    * and quotes round-trip by construction; the shared nullValue sentinel
    * keeps empty string and NULL distinct both ways. */
  def csvSourceCensus(spark: SparkSession, dir: String): DataFrame =
    census(readCsvStaging(spark, dir))

  /** The CSV staging read path, shared with [[csvSourceCensus]] and its
    * spec so both exercise the identical option set: the sentinel
    * nullValue maps a written-out real null back to NULL, and — because
    * it is no longer the default "" — a quoted empty string stays an
    * empty string instead of collapsing to NULL. */
  private[graft] def readCsvStaging(spark: SparkSession, dir: String): DataFrame =
    spark.read.schema(docSchema)
      .option("header", "true").option("multiLine", "true")
      .option("nullValue", CsvNullSentinel)
      .csv(stagedDir(spark, dir, "csv"))

  /** Census over the ORC staging of documents — the OTHER columnar at-rest
    * format (footer statistics, column pruning, predicate pushdown — the
    * same scan contract as parquet, unlike the row-oriented ingest
    * formats above). Same losslessness proof: the text-checksum lane must
    * equal the parquet-side oracle's. */
  def orcSourceCensus(spark: SparkSession, dir: String): DataFrame =
    census(spark.read.schema(docSchema).orc(stagedDir(spark, dir, "orc")))
}
