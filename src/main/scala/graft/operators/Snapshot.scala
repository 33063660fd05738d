package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus snapshot diff — the added / removed / changed / unchanged census
  * between two states of a document collection. This is the audit step of
  * every incremental-ingest pipeline (which docs did the new crawl add,
  * which vanished, which changed content under a stable id) and the input
  * to incremental re-processing: only `added ∪ changed` needs re-embedding,
  * re-deduping, or re-scoring.
  *
  * Scale shape: one full-outer hash join on the document key (both sides
  * shuffle once on the key they're already keyed by) comparing content
  * fingerprints — md5 in-plan, so neither snapshot ships its text anywhere;
  * the diff rides on 16-byte fingerprints. Status is a projection, the
  * census a bounded per-source aggregate.
  */
object Snapshot {

  /** Per-document diff of two snapshots sharing a `doc_id` key: columns
    * (doc_id, source, status) with status ∈ added | removed | changed |
    * unchanged. Content identity is md5 of the text — engine-portable. */
  def snapshotDiff(oldSnap: DataFrame, newSnap: DataFrame): DataFrame = {
    val o = oldSnap.select(col("doc_id"), col("source").as("src_old"),
      md5(col("text")).as("fp_old"))
    val n = newSnap.select(col("doc_id"), col("source").as("src_new"),
      md5(col("text")).as("fp_new"))
    o.join(n, Seq("doc_id"), "full_outer")
      .select(col("doc_id"), coalesce(col("src_old"), col("src_new")).as("source"),
        when(col("fp_old").isNull, "added")
          .when(col("fp_new").isNull, "removed")
          .when(col("fp_old") =!= col("fp_new"), "changed")
          .otherwise("unchanged").as("status"))
  }

  /** Oracle-facing fixture over one documents table: derives two
    * deterministic snapshot states (membership and mutation are pure
    * functions of md5₄₈(doc_id), mirrored verbatim in SQL — the same
    * content-addressed doctrine as the sampling operators), diffs them,
    * and reports the per-source census. The derivation simulates a
    * re-crawl: ~90% membership each side with independent drops, and
    * ~1/8 of retained docs carrying revised text. */
  def snapshotDiffProfile(docs: DataFrame): DataFrame = {
    def member(tag: String) =
      Dedup.PortableHash(concat(lit(tag), col("doc_id").cast("string"))) % 10 < 9
    val oldSnap = docs.where(member("snapA:"))
    val mutated = Dedup.PortableHash(concat(lit("mut:"), col("doc_id").cast("string"))) % 8 < 1
    val newSnap = docs.where(member("snapB:"))
      .withColumn("text", when(mutated, concat(col("text"), lit(" rev2")))
        .otherwise(col("text")))
    snapshotDiff(oldSnap, newSnap)
      .groupBy(col("source"))
      .agg(graft.functions.Cols.countWhen(col("status") === "added").as("added"),
        graft.functions.Cols.countWhen(col("status") === "removed").as("removed"),
        graft.functions.Cols.countWhen(col("status") === "changed").as("changed"),
        graft.functions.Cols.countWhen(col("status") === "unchanged").as("unchanged"))
      .orderBy(col("source"))
  }
}
