package graft.tools

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import graft.{GraftSession, SparkEntry}

/** Dev-only plan snapshotter: `runMain graft.tools.PlanDump <sfDir> <outDir>
  * [q1,q2,...]` — writes each query's `.explain("formatted")` output to
  * `<outDir>/<query>.txt` and prints a one-line plan census (Exchange /
  * join-strategy / scan counts) per query to stdout. With no query list it
  * sweeps the whole registry. Not part of the driver contract; used by the
  * optimization rounds to commit before/after plans under plans/r16/. */
object PlanDump {
  /** Renumber expression ids (`#NNNN`) and plan ids (`plan_id=NNNN`) by
    * first appearance so two dumps of the SAME plan shape are byte-equal
    * regardless of the session's expression-id counter (r16 verdict item
    * 9: 34 of 126 committed before/after pairs differed only in id churn,
    * inflating the "plan changed" census). First-appearance renumbering —
    * not blanket replacement — preserves which attributes are the same
    * attribute, so a REAL rewiring still diffs. */
  private[tools] def normalizeIds(plan: String): String = {
    def renumber(s: String, pat: scala.util.matching.Regex,
                 fmt: Int => String): String = {
      val ids = scala.collection.mutable.LinkedHashMap[String, Int]()
      pat.replaceAllIn(s, m => {
        val id = ids.getOrElseUpdate(m.group(1), ids.size)
        scala.util.matching.Regex.quoteReplacement(fmt(id))
      })
    }
    val a = renumber(plan, "#(\\d+)".r, i => s"#x$i")
    val b = renumber(a, "plan_id=(\\d+)".r, i => s"plan_id=x$i")
    // checkpoint RDD ids and operator source LINES also churn run-to-run
    // (ids with session history, lines with unrelated edits above the
    // call site) — normalize both so only structure diffs
    val c = renumber(b, "MapPartitionsRDD\\[(\\d+)\\]".r, i => s"MapPartitionsRDD[x$i]")
    c.replaceAll("\\.scala:\\d+", ".scala:_")
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = Paths.get(args(1))
    Files.createDirectories(outDir)
    val wanted = args.drop(2).headOption
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val spark = GraftSession.build("graft-plandump")
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => wanted.forall(_.contains(n)))
    for (name <- names) {
      try {
        val df = SparkEntry.queries(name)(spark, sfDir)
        val plan = normalizeIds(df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode))
        Files.write(outDir.resolve(s"$name.txt"),
          plan.getBytes(StandardCharsets.UTF_8))
        def c(pat: String): Int = pat.r.findAllIn(plan).length
        println(f"[plandump] $name exch=${c("Exchange")} " +
          f"bhj=${c("BroadcastHashJoin")} smj=${c("SortMergeJoin")} " +
          f"shj=${c("ShuffledHashJoin")} bnl=${c("BroadcastNestedLoopJoin")} " +
          f"cart=${c("CartesianProduct")} scan=${c("Scan parquet")} " +
          f"wsc=${c("WholeStageCodegen")}")
      } catch {
        case e: Throwable =>
          // streaming plans can't be explained unstarted; record and move on
          println(s"[plandump] $name SKIPPED: ${e.getClass.getSimpleName}: " +
            String.valueOf(e.getMessage).replaceAll("\\s+", " ").take(120))
      }
    }
    spark.stop()
  }
}
