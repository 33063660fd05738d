package graft

import org.apache.spark.sql.functions._

/** Round-trip fidelity of the JSON/CSV/ORC ingest stagings on HOSTILE text
  * shapes — the unit fixture behind the r13 text-fuzz finds: Spark's CSV
  * writer trims leading/trailing whitespace by default, and the default
  * nullValue ("") collapses a quoted empty string into NULL on read. The
  * census's checksum lane exists to catch exactly this class; these
  * fixtures pin it at the unit level so the fix can't regress silently. */
class FormatsSpec extends SparkSpec {
  import spark.implicits._

  // the text shapes the r13 fuzz variant carries, plus quote/newline cases
  // the variant can't (the oracle contract is single-line ASCII; the
  // STAGING must survive them anyway — quoteAll + multiLine)
  private val hostile = Seq(
    (1L, "en", "srcA", "plain tokens here"),
    (2L, "en", "srcA", ""),                       // empty string, NOT null
    (3L, "en", "srcA", "  padded  both  ends "),  // writer-trim trap
    (4L, "en", "srcB", "comma, separated, text"),
    (5L, "en", "srcB", "quote \"inside\" text"),
    (6L, "en", "srcB", "line\nbreak inside"),
    (7L, "en", "srcB", "x"),
    (8L, "en", "srcB", null.asInstanceOf[String])) // real NULL stays NULL

  private def staged(): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_fmt_spec").toString
    hostile.toDF("doc_id", "lang", "source", "text")
      .withColumn("n_chars", coalesce(length(col("text")).cast("long"), lit(0L)))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  private def censusOf(dir: String): Map[String, (Long, Long, Long)] =
    graft.sources.Tables.documents(spark, dir)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("docs"), sum(col("n_chars")).as("chars"),
        sum(graft.operators.Dedup.PortableHash(col("text"))).as("ck"))
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap

  test("json/csv/orc stagings round-trip hostile text bit-exactly (checksum lane)") {
    val dir = staged()
    val want = censusOf(dir)
    for ((name, census) <- Seq(
        "json" -> graft.sources.Formats.jsonSourceCensus(spark, dir),
        "csv"  -> graft.sources.Formats.csvSourceCensus(spark, dir),
        "orc"  -> graft.sources.Formats.orcSourceCensus(spark, dir))) {
      val got = census
        .select(col("source"), col("docs"), col("total_chars"), col("text_checksum"))
        .as[(String, Long, Long, Long)].collect()
        .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
      assert(got == want, s"$name staging mangled the corpus: got $got want $want")
    }
  }

  test("csv staging keeps empty string and NULL distinct") {
    val dir = staged()
    // the engine's own staging read path — same options the census uses
    val back = graft.sources.Formats.readCsvStaging(spark, dir)
    val byId = back.select(col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(byId(2L) == Some(""), s"empty string came back as ${byId(2L)}")
    assert(byId(8L).isEmpty, s"NULL came back as ${byId(8L)}")
    assert(byId(3L) == Some("  padded  both  ends "), s"padding lost: ${byId(3L)}")
    // the sentinel itself must never leak into user-visible text
    assert(!byId.values.flatten.exists(_.contains("graft_csv_null")),
      "null sentinel leaked into a text value")
  }
}
