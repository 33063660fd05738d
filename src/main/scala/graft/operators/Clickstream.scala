package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Cols
import graft.sources.EventGenerator

/** Operators over the reference wire-schema clickstream (page_view /
  * add_to_cart / purchase with page_url, product_id, purchase_amount) —
  * the parts of the reference surface that need its own columns rather than
  * the driver's generic events table. Inputs come from the streaming
  * pipeline's parsed stream or the seeded [[EventGenerator]].
  */
object Clickstream {

  /** page_url → page_type classification (reference §2.9: URL patterns are
    * generated at producer/data_generator.py:35-42; regexp_extract is the
    * declared-but-unused text operator the reference imports). Pure codegen
    * regexp work, no shuffle until the count. */
  def pageTypeDistribution(events: DataFrame): DataFrame =
    events
      .withColumn("page_type",
        when(col("page_url") === "/", "homepage")
          .when(col("page_url").startsWith("/category/"), "category")
          .when(col("page_url").startsWith("/product/"), "product")
          .when(col("page_url").startsWith("/search"), "search")
          .when(col("page_url") === "/cart", "cart")
          .when(col("page_url") === "/checkout", "checkout")
          .otherwise("other"))
      .withColumn("entity",
        when(col("page_type") === "category", regexp_extract(col("page_url"), "^/category/(.+)$", 1))
          .when(col("page_type") === "product", regexp_extract(col("page_url"), "^/product/(.+)$", 1))
          .when(col("page_type") === "search", regexp_extract(col("page_url"), "q=(.+)$", 1)))
      .groupBy(col("page_type"))
      .agg(count(lit(1)).as("views"),
        countDistinct(col("entity")).as("distinct_entities"))
      .orderBy(col("page_type"))

  /** J1: stream–static broadcast enrichment populating the reference's dead
    * analytics.product_metrics table (db/init.sql:39-49 — created but never
    * written by any reference code). The product dimension is derived
    * deterministically from the catalog ids; in production it would be a
    * real dimension table — the plan shape (broadcast hash join, fact side
    * never shuffles for the join) is the point. */
  def productMetrics(events: DataFrame): DataFrame = {
    val spark = events.sparkSession
    val dim = broadcast(
      events.select(col("product_id")).where(col("product_id").isNotNull).distinct()
        .withColumn("product_name", concat(lit("Product "), regexp_extract(col("product_id"), "([0-9]+)", 1)))
        .withColumn("category",
          element_at(typedlit(Seq("electronics", "clothing", "home", "sports",
            "books", "beauty", "toys", "automotive")),
            (pmod(crc32(col("product_id")), lit(8)) + 1).cast("int"))))
    events.where(col("product_id").isNotNull)
      .join(dim, Seq("product_id"), "left")
      .groupBy(col("product_id"), col("product_name"), col("category"))
      .agg(
        Cols.countWhen(col("event_type") === "page_view").as("total_views"),
        Cols.countWhen(col("event_type") === "add_to_cart").as("total_cart_adds"),
        Cols.countWhen(col("event_type") === "purchase").as("total_purchases"),
        Cols.pct4(
          Cols.countWhen(col("event_type") === "purchase"),
          Cols.countWhen(col("event_type") === "page_view")).as("conversion_rate"),
        Cols.sumDec2When(col("event_type") === "purchase", col("purchase_amount"))
          .as("revenue"))
      .orderBy(col("product_id"))
  }

  /** Deterministic generated corpus for the clickstream-only queries (the
    * driver tables carry no URLs/product ids). Seeded → stable rows. */
  def generated(spark: SparkSession, n: Int = 2000): DataFrame = {
    import spark.implicits._
    spark.createDataset(new EventGenerator(seed = 42).events(n))(
      org.apache.spark.sql.Encoders.product[graft.model.ClickstreamEvent]).toDF()
  }
}
