package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.Cols

/** Data-quality checks — the reference declares "Data quality checks" and
  * "Data validation and schema enforcement" as capabilities
  * (/root/reference/PROJECT_SUMMARY.md:36,47) but ships no implementation;
  * this operator realizes them as a single-pass validation report.
  *
  * One whole-table aggregation (conditional counts — A2 machinery), emitted
  * in a tall (check_name, violations, total, violation_pct) layout. At
  * 100 TB this is exactly one scan with map-side partial aggregation; checks
  * compose as columns, not extra passes.
  */
object DataQuality {

  /** Validation report for the generic events table. */
  def eventsReport(events: DataFrame): DataFrame = {
    val validTypes = Seq("view", "click", "purchase", "signup", "error")
    val checks: Seq[(String, org.apache.spark.sql.Column)] = Seq(
      "null_event_id"    -> col("event_id").isNull,
      "null_user_id"     -> col("user_id").isNull,
      "null_ts"          -> col("ts").isNull,
      "invalid_type"     -> !col("event_type").isin(validTypes: _*),
      "negative_value"   -> (col("value") < 0),
      "unparseable_props" -> get_json_object(col("props"), "$.k").isNull,
      "ts_before_2020"   -> (col("ts_sec") < lit(1577836800L)),
      "duplicate_event_id" -> lit(false)) // counted separately below
    val aggCols = countDistinct(col("event_id")).as("distinct_ids") +:
      checks.map { case (n, c) => Cols.countWhen(c).as(n) }
    val wide = events.agg(count(lit(1)).as("total"), aggCols: _*)
    val stacked = checks.map(_._1).filterNot(_ == "duplicate_event_id")
      .map(n => s"'$n', $n").mkString(", ")
    wide
      .withColumn("duplicate_event_id", col("total") - col("distinct_ids"))
      .selectExpr("total",
        s"stack(${checks.size}, $stacked, 'duplicate_event_id', duplicate_event_id) as (check_name, violations)")
      .select(col("check_name"), col("violations"),
        col("total"), Cols.pct4(col("violations"), col("total")).as("violation_pct"))
      .orderBy(col("check_name"))
  }

  /** Validation report for the documents corpus. */
  def documentsReport(docs: DataFrame): DataFrame = {
    val checks: Seq[(String, org.apache.spark.sql.Column)] = Seq(
      "null_text"     -> col("text").isNull,
      "empty_text"    -> (length(col("text")) === 0),
      "nchar_mismatch" -> (col("n_chars") =!= length(col("text"))),
      "unknown_lang"  -> !col("lang").isin("en", "es", "de", "fr", "zh"))
    val wide = docs.agg(count(lit(1)).as("total"),
      checks.map { case (n, c) => Cols.countWhen(c).as(n) }: _*)
    val stacked = checks.map(_._1).map(n => s"'$n', $n").mkString(", ")
    wide
      .selectExpr("total", s"stack(${checks.size}, $stacked) as (check_name, violations)")
      .select(col("check_name"), col("violations"),
        col("total"), Cols.pct4(col("violations"), col("total")).as("violation_pct"))
      .orderBy(col("check_name"))
  }
}
