package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table support — the co-located-join pattern for 100 TB fact
  * tables (SURVEY.md steering: "bucketing for co-located joins").
  *
  * Writing both join sides bucketed by the join key with the same bucket
  * count lets every subsequent join/aggregation on that key run with ZERO
  * exchanges: each task reads matching buckets from both sides. At scale
  * this converts the dominant repeated cost (shuffling the fact table per
  * query) into a one-time write-layout cost. Verified by BucketingSpec,
  * which asserts the bucketed join plan contains no shuffle.
  */
object Bucketing {

  /** Write a DataFrame as a bucketed managed table (parquet, in-catalog). */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
                    buckets: Int = 8, sortCol: Option[String] = None): Unit = {
    val w = df.write.mode("overwrite").format("parquet").bucketBy(buckets, bucketCol)
    sortCol.fold(w)(c => w.sortBy(c)).saveAsTable(table)
  }

  /** Bucket-join two managed tables on their bucket key: no Exchange when
    * bucket specs line up (Spark requires bucketing-aware scan, on by
    * default via spark.sql.sources.bucketing.enabled). */
  def bucketedJoin(spark: SparkSession, left: String, right: String,
                   key: String): DataFrame =
    spark.table(left).join(spark.table(right), Seq(key))
}
