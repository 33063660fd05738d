package graft.tools

import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.operators.{Dedup, TextAnalysis}
import graft.sources.Tables

/** Dev-only stage-level timer for the CC dedup pipeline: times pair
  * generation, clustering, and survivor selection separately (warm reps)
  * so barrier-count work targets the right stage. Not part of the driver
  * contract. */
object StageProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.drop(1).headOption.map(_.toInt).getOrElse(3)
    val spark = GraftSession.build("graft-stage-probe")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }
    for (i <- 1 to reps) {
      println(s"[probe] --- rep $i")
      val docs = Tables.documents(spark, sfDir)
      val pairs = t("pair gen (single-pass nearDupVerified)")(
        Dedup.nearDupVerifiedPairs(docs, 0.3, 0.5, Dedup.PortableHash)
          .select(col("doc_a"), col("doc_b")).localCheckpoint())
      val clusters = t("cc")(Dedup.dedupClusters(pairs).localCheckpoint())
      t("survivors")(
        Dedup.clusterSurvivors(clusters, TextAnalysis.qualityUnits(docs)).count())
      println(s"[probe] checkpoint drives observation: ${Dedup.checkpointDrivesObservation}")
      if (i == 1) {
        val sums = (1 to 6).map(k =>
          Dedup.dedupClustersFixedRounds(pairs, k)
            .agg(sum(col("cluster_id"))).head().getLong(0))
        println(s"[probe] fixed-round label sums 1..6: ${sums.mkString(", ")} " +
          s"(first repeat = converged one round earlier)")
      }
    }
    spark.stop()
  }
}
