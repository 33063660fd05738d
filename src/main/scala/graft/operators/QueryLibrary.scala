package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.sources.Tables

/** SQL-string query surface (reference entry point 3, SURVEY.md §3: the
  * Grafana/notebook/psql queries users run against the pipeline's outputs).
  * These go through `spark.sql` on temp views — the same Catalyst path as
  * the DataFrame DSL, exercised explicitly because the reference's consumer
  * surface is SQL text (data_analysis.ipynb cells 2–5, dashboard panels).
  */
object QueryLibrary {

  private def viewName(dir: String, table: String): String =
    s"graft_${table}_${Integer.toHexString(dir.hashCode)}"

  /** Register (idempotently) a normalized events view with ts_sec. */
  private def eventsView(spark: SparkSession, dir: String): String = {
    val name = viewName(dir, "events")
    Tables.events(spark, dir).createOrReplaceTempView(name)
    name
  }

  /** Notebook cell-2 parity: whole-pipeline stats with FILTER counts. */
  def pipelineStats(spark: SparkSession, dir: String): DataFrame = {
    val v = eventsView(spark, dir)
    spark.sql(
      s"""SELECT
         |  count(*) AS total_events,
         |  count(DISTINCT user_id) AS unique_users,
         |  count(*) FILTER (WHERE event_type = 'view') AS page_views,
         |  count(*) FILTER (WHERE event_type = 'click') AS clicks,
         |  count(*) FILTER (WHERE event_type = 'purchase') AS purchases,
         |  count(*) FILTER (WHERE event_type = 'signup') AS signups,
         |  count(*) FILTER (WHERE event_type = 'error') AS errors,
         |  min(ts_sec) AS first_event_sec,
         |  max(ts_sec) AS last_event_sec
         |FROM $v""".stripMargin)
  }

  /** Dashboard "latest conversion rate" parity (ecommerce-dashboard.json:48:
    * ORDER BY hour DESC LIMIT 1) — planned as TakeOrderedAndProject. */
  def latestHour(spark: SparkSession, dir: String): DataFrame = {
    val v = eventsView(spark, dir)
    spark.sql(
      s"""SELECT * FROM (
         |  SELECT (CAST(FLOOR(ts_sec / 3600.0) AS BIGINT) * 3600) AS hour_sec,
         |    count(*) AS total_events,
         |    count(*) FILTER (WHERE event_type = 'purchase') AS purchases
         |  FROM $v GROUP BY 1
         |) ORDER BY hour_sec DESC LIMIT 1""".stripMargin)
  }
}
