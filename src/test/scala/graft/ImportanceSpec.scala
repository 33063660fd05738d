package graft

import org.apache.spark.sql.functions._

import graft.operators.Importance

class ImportanceSpec extends SparkSpec {
  import spark.implicits._

  test("importance: target-vocabulary docs outscore off-target docs, bounds hold") {
    // disjoint vocabularies: every 'alpha*' bucket is pure target mass,
    // every 'beta*' bucket pure raw (collisions can only blur, not invert)
    val docs = Seq(
      (1L, "en", "s", (1 to 12).map(i => s"alpha$i").mkString(" ")),
      (2L, "en", "s", (1 to 12).map(i => s"alpha$i").mkString(" ")),
      (3L, "fr", "s", (1 to 12).map(i => s"beta$i").mkString(" ")),
      (4L, "fr", "s", "alpha1 alpha2 alpha3 beta1 beta2 beta3")
    ).toDF("doc_id", "lang", "source", "text")
    val m = Importance.importanceProfile(docs, col("lang") === "en")
      .select(col("doc_id"), col("dsir_score")).as[(Long, Double)].collect().toMap
    m.values.foreach(s => assert(s >= 0.0 && s <= 1.0, s"score $s out of [0,1]"))
    assert(m(1L) > m(3L), s"target doc ${m(1L)} must outscore off-target ${m(3L)}")
    // the mixed doc sits strictly between the pure ones
    assert(m(4L) > m(3L) && m(4L) < m(1L), s"mixed ${m(4L)} vs ${m(1L)}/${m(3L)}")
  }

  test("importance: empty-token docs absent; score exact for a known split") {
    // one bucketed token shared 1:3 between target and raw ⇒ every doc's
    // score_u is exactly floor(1·10⁴/3) = 3333 per occurrence
    val docs = Seq(
      (1L, "en", "s", "tok"),
      (2L, "fr", "s", "tok tok"),
      (3L, "fr", "s", "")
    ).toDF("doc_id", "lang", "source", "text")
    val out = Importance.importanceProfile(docs, col("lang") === "en")
      .select(col("doc_id"), col("dsir_score")).as[(Long, Double)].collect().toMap
    assert(!out.contains(3L), "tokenless doc must be absent")
    assert(out(1L) == 0.3333 && out(2L) == 0.3333, s"got $out")
  }
}
