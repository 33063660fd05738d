package graft.tools

import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.functions.Cols

/** BMP completeness audit for [[graft.functions.Cols.foldCase]] (r14
  * verdict task 6): emit, for EVERY BMP codepoint (U+0020..U+FFFF minus
  * the surrogate block), this engine's `lower(s)` and `foldCase(s)` so
  * `tools/foldcase_sweep.py` can run the byte-identical chain in DuckDB
  * and enumerate any codepoint classes where the two engines still
  * disagree. Each codepoint is swept in two forms: bare, and prefixed
  * with a Greek capital letter ("Α" + c) so context-sensitive lowering
  * rules (Java's final-sigma rule is the known one) get a letter context
  * to fire in. Dev-only; not part of the driver contract.
  *
  * Usage: runMain graft.tools.FoldSweep <outParquet>
  */
object FoldSweep {
  def main(args: Array[String]): Unit = {
    val out = args(0)
    val spark = GraftSession.build("graft-foldsweep")
    import spark.implicits._
    val cps = (0x20 to 0xFFFF).filterNot(c => c >= 0xD800 && c <= 0xDFFF)
    val rows = cps.flatMap { c =>
      val s = new String(Character.toChars(c))
      Seq((c.toLong, "single", s), (c.toLong, "ctx", "Α" + s))
    }
    rows.toDF("cp", "form", "s")
      .repartition(8)
      .select(col("cp"), col("form"), col("s"),
        lower(col("s")).as("lowered"),
        Cols.foldCase(col("s")).as("folded"))
      .write.mode("overwrite").parquet(out)
    spark.stop()
  }
}
