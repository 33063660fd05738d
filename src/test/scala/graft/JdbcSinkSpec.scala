package graft

import java.sql.DriverManager

import graft.streaming.Sinks

/** JDBC sink flows against a real database — the embedded Derby that ships
  * with Spark. Append and overwrite go through Spark's JDBC writer; upsert
  * exercises the stage-then-merge flow (AnsiMerge dialect here; the
  * reference-parity PostgresOnConflict emits the same flow with ON CONFLICT
  * syntax). */
class JdbcSinkSpec extends SparkSpec {
  import spark.implicits._

  private val url = "jdbc:derby:memory:graftdb;create=true"

  private def query[A](sql: String)(f: java.sql.ResultSet => A): A = {
    val conn = DriverManager.getConnection(url)
    try f(conn.createStatement().executeQuery(sql)) finally conn.close()
  }

  test("append sink accumulates batches; overwrite sink replaces") {
    val sink = Sinks.Jdbc(url, "", "")
    val b1 = Seq((1L, 10.0), (2L, 20.0)).toDF("id", "v")
    val b2 = Seq((3L, 30.0)).toDF("id", "v")
    // Spark JDBC append requires the table to exist or creates it
    b1.limit(0).write.mode("overwrite").jdbc(url, "audit", new java.util.Properties())
    sink.append("audit")(b1, 0L)
    sink.append("audit")(b2, 1L)
    assert(query("SELECT count(*) FROM audit") { rs => rs.next(); rs.getLong(1) } == 3)

    sink.overwrite("dash")(b1, 0L)
    sink.overwrite("dash")(b2, 1L)
    assert(query("SELECT count(*) FROM dash") { rs => rs.next(); rs.getLong(1) } == 1)
  }

  test("upsert sink: replayed and updated batches converge by primary key") {
    val sink = Sinks.Jdbc(url, "", "", dialect = Sinks.AnsiMerge)
    val conn = DriverManager.getConnection(url)
    try conn.createStatement().execute(
      "CREATE TABLE sessions (id BIGINT PRIMARY KEY, v DOUBLE)")
    catch { case _: java.sql.SQLException => () } // exists from prior run
    finally conn.close()
    val b1 = Seq((1L, 10.0), (2L, 20.0)).toDF("id", "v")
    sink.upsert("sessions", "id", Seq("v"))(b1, 0L)
    sink.upsert("sessions", "id", Seq("v"))(b1, 1L) // replay: idempotent
    val b2 = Seq((2L, 25.0), (3L, 30.0)).toDF("id", "v")
    sink.upsert("sessions", "id", Seq("v"))(b2, 2L)
    val rows = query("SELECT id, v FROM sessions ORDER BY id") { rs =>
      val b = Seq.newBuilder[(Long, Double)]
      while (rs.next()) b += (rs.getLong(1) -> rs.getDouble(2))
      b.result()
    }
    assert(rows == Seq(1L -> 10.0, 2L -> 25.0, 3L -> 30.0))
  }
}
