package graft

import java.nio.file.{Files, Paths}

/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    // optional third arg (dev only; the driver always passes two): restrict
    // to a comma-separated query subset for fast local iteration
    val only = args.drop(2).headOption
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    only.foreach { names =>
      names.diff(SparkEntry.queries.keySet).foreach(n =>
        System.err.println(s"[verify] WARNING: unknown query name '$n' (typo?)"))
      if (names.intersect(SparkEntry.queries.keySet).isEmpty) {
        // a filter matching nothing would write an empty oracle_sql.json
        // and exit 0 — a silent no-op that reads as success downstream
        System.err.println(s"[verify] ERROR: filter matches no registered query: $names")
        sys.exit(2)
      }
    }
    val spark = GraftSession.build("graft-verify")
    new java.io.File(outDir).mkdirs()
    // a query that throws writes no parquet and would silently VANISH from
    // the driver's correctness record (the round-7 events-schema break hid
    // 28 queries this way) — so failures are also recorded explicitly in
    // outDir/errors.json, where "this round checked fewer queries" becomes
    // "these named queries errored with these messages"
    val errors = scala.collection.mutable.LinkedHashMap[String, String]()
    // per-query wall clock on stderr: Verify is the only artifact that runs
    // EVERY query on arbitrary fuzz/scale variants, so it doubles as the
    // coarse profile locating a variant's super-linear queries (the r13
    // scale gate found its first stall exactly this blind way — three done,
    // one in flight, nothing to name it)
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
      val t0 = System.nanoTime()
      try {
        fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        System.err.println(f"[verify] $name ok in ${(System.nanoTime() - t0) / 1e9}%.1f s")
      } catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
        errors(name) = e.getClass.getName + ": " + String.valueOf(e.getMessage)
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .filter { case (k, _) => only.forall(_.contains(k)) }
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    val errJson = errors.map { case (k, v) => s"${q(k)}: ${q(v)}" }
      .mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/errors.json"), errJson)
    if (errors.nonEmpty)
      System.err.println(s"[verify] ${errors.size} quer(ies) FAILED: " +
        errors.keys.mkString(", "))
    spark.stop()
  }
}
