package graft

/** The custom Catalyst expressions are SQL-addressable (consumers that only
  * speak SQL get the same codegen'd operators as the Column API). */
class SqlFunctionsSpec extends SparkSpec {

  test("ivec_dot / fvec_dot / fvec_norm evaluate from SQL") {
    val r = spark.sql(
      """SELECT ivec_dot(array(1L, 2L, 3L), array(4L, 5L, 6L)) AS i,
        |  fvec_dot(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)),
        |           array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS f,
        |  fvec_norm(array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS n""".stripMargin)
      .head()
    assert(r.getLong(0) == 32L && r.getDouble(1) == 11.0 && r.getDouble(2) == 5.0)
  }

  test("bloom_build / bloom_might_contain round-trip from SQL") {
    spark.range(0, 1000).createOrReplaceTempView("bloom_keys")
    val misses = spark.sql(
      """WITH f AS (SELECT bloom_build(xxhash64(id), 65536, 5) AS b FROM bloom_keys)
        |SELECT count(*) AS misses FROM bloom_keys, f
        |WHERE NOT bloom_might_contain(f.b, xxhash64(id))""".stripMargin)
      .head().getLong(0)
    assert(misses == 0L)
  }

  test("mg_frequent returns the heavy key from SQL") {
    spark.sql("SELECT explode(array(1L,1L,1L,1L,1L,2L,3L,4L,5L,6L)) AS k")
      .createOrReplaceTempView("mg_keys")
    val cands = spark.sql("SELECT mg_frequent(k, 3) AS c FROM mg_keys")
      .head().getSeq[Long](0)
    assert(cands.contains(1L), s"heavy key missing from $cands")
  }

  test("wrong-typed arguments fail at analysis, not with a runtime class cast") {
    import org.apache.spark.sql.AnalysisException
    spark.sql("SELECT 'x' AS s, 1 AS i, array('a','b') AS sa")
      .createOrReplaceTempView("typeprobe")
    val bad = Seq(
      "SELECT bloom_build(s, 64, 2) FROM typeprobe",       // string key
      "SELECT bloom_might_contain(s, 1L) FROM typeprobe",  // string filter
      "SELECT bloom_might_contain(CAST('ab' AS BINARY), s) FROM typeprobe", // string key
      "SELECT mg_frequent(s, 3) FROM typeprobe",           // string item
      "SELECT ivec_dot(sa, sa) FROM typeprobe")            // string arrays
    bad.foreach { q =>
      val e = intercept[AnalysisException](spark.sql(q).collect())
      assert(e.getMessage.toLowerCase.contains("data type mismatch"),
        s"$q should fail the type check, got: ${e.getMessage}")
    }
  }
}
