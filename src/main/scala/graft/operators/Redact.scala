package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII / sensitive-token redaction — the scrubbing stage a training-data
  * pipeline runs before text leaves the ingest zone. Patterns are RE2-safe
  * (character classes and counted repetition only — no lookarounds, no
  * backreferences) so the same pattern text runs identically under
  * java.util.regex, RE2-based engines, and the DuckDB oracle.
  *
  * Scale shape: pure per-row projection inside WholeStageCodegen — no
  * shuffle, no UDF; redaction cost rides the scan.
  */
object Redact {

  /** name → (RE2-safe pattern, replacement tag). Order matters: URLs are
    * redacted before emails so a credentialed URL cannot leak its userinfo
    * through the email pass, and digit runs go last so structured numbers
    * (phones) keep their specific tag. */
  val Patterns: Seq[(String, (String, String))] = Seq(
    "url"   -> ("https?://[^ ]+", "<URL>"),
    "email" -> ("[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
    "phone" -> ("\\+?[0-9]{3}[- .][0-9]{3}[- .][0-9]{4}", "<PHONE>"),
    "digits" -> ("[0-9]{2,}", "<NUM>"))

  /** Apply every redaction pass, in order, to one text column. */
  def redactAll(c: Column): Column =
    Patterns.foldLeft(c) { case (acc, (_, (re, tag))) => regexp_replace(acc, re, tag) }

  /** Apply a single named pass. */
  def redactOne(c: Column, name: String): Column = {
    val (re, tag) = Patterns.toMap.apply(name)
    regexp_replace(c, re, tag)
  }

  /** Redaction profile over the events stream's raw `props` payload —
    * counts digit-run hits (the only PII-shaped content in this synthetic
    * corpus; the email/url/phone passes run too, proving out the full
    * stack) and measures the size delta redaction causes. */
  def eventsProfile(events: DataFrame): DataFrame = {
    val redacted = redactAll(col("props"))
    events.select(col("event_type"),
        size(regexp_extract_all(col("props"), lit("[0-9]{2,}"), lit(0))).cast("long").as("runs"),
        length(col("props")).cast("long").as("raw_len"),
        length(redacted).cast("long").as("red_len"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("events"),
        sum(col("runs")).as("digit_runs"),
        sum(col("raw_len")).as("raw_chars"),
        sum(col("red_len")).as("redacted_chars"))
      .orderBy(col("event_type"))
  }
}
