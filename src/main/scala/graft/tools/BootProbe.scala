package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.GraftSession
import graft.functions.Cols
import graft.operators.Stats
import graft.sources.Tables

/** Dev-only stage-level timer for bootstrapMedianCi: isolates the ×R
  * explode+hash, the histogram aggregation, and the crossing-row window
  * so the 100-TB-shape claim ("explosion collapses map-side") can be
  * checked against where wall-clock actually goes. Not driver contract. */
object BootProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.build("graft-boot-probe")
    val orders = Tables.orders(spark, sfDir)
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }
    for (rep <- 1 to 2) {
      println(s"[probe] --- rep $rep")
      val resamples = 32
      val width = 1000.0
      val rows = orders.select(col("o_orderkey"),
          Cols.cents(col("o_totalprice")).as("cents"),
          floor(col("o_totalprice") / width).cast("long").as("bucket"))
        .withColumn("r", explode(sequence(lit(0), lit(resamples - 1))))
        .withColumn("u",
          expr("(((o_orderkey % 2147483647) * 48271 % 2147483647" +
            " + r * 1000003 + 12345) * 48271 % 2147483647) % 1000000"))
      val w = Stats.PoissonCdf1e6.zipWithIndex
        .foldLeft(when(lit(false), 0L)) { case (acc, (tt, k)) =>
          acc.when(col("u") < tt, k.toLong)
        }.otherwise(Stats.PoissonCdf1e6.length.toLong)
      val weighted = rows.withColumn("w", w).where(col("w") > 0)
      t("explode+hash+weight count")(weighted.count())
      val hist = weighted.groupBy(col("r"), col("bucket")).agg(sum(col("w")).as("bw"))
      t("hist agg")(hist.count())
      val wPrev = Window.partitionBy(col("r")).orderBy(col("bucket"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val offsets = hist.select(col("r"), col("bucket"),
        coalesce(sum(col("bw")).over(wPrev), lit(0L)).as("off"),
        sum(col("bw")).over(Window.partitionBy(col("r"))).as("wtot"))
      t("offsets")(offsets.count())
      val wBucket = Window.partitionBy(col("r"), col("bucket"))
        .orderBy(col("cents"), col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val thr = expr("(wtot + 1) div 2")
      val med = weighted.join(broadcast(offsets), Seq("r", "bucket"))
        .select(col("r"), col("cents"), col("w"), col("wtot"),
          (col("off") + sum(col("w")).over(wBucket)).as("cw"))
        .where(col("cw") >= thr && col("cw") - col("w") < thr)
        .groupBy(col("r")).agg(min(col("cents")).as("med_cents"))
      t("crossing-row window + med")(med.count())
      t("full query")(Stats.bootstrapMedianCi(orders).count())
    }
    spark.stop()
  }
}
