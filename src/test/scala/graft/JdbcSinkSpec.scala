package graft

import java.sql.DriverManager

import org.apache.spark.SparkException
import graft.model.{SchemaField, TableSchema}
import graft.sinks.JdbcSink

/** Transactional JDBC delivery against in-JVM embedded Derby — the
  * closest this container gets to the reference's Postgres
  * destination (integrations/postgres/main.go). */
class JdbcSinkSpec extends SparkSpec {
  import spark.implicits._

  private val url = "jdbc:derby:memory:graftjdbc;create=true"

  private def query(sql: String): Seq[Seq[Any]] =
    JdbcSink.withConnection(url) { conn =>
      val st = conn.createStatement()
      try {
        val rs = st.executeQuery(sql)
        val n = rs.getMetaData.getColumnCount
        val out = Seq.newBuilder[Seq[Any]]
        while (rs.next()) out += (1 to n).map(rs.getObject)
        out.result()
      } finally st.close()
    }

  private def count(table: String): Long =
    query(s"SELECT COUNT(*) FROM $table").head.head.asInstanceOf[Number].longValue

  test("createTable from catalogue schema, idempotent on re-run") {
    val schema = TableSchema("jobs_t1", Seq(
      SchemaField("id", "INT", primaryKey = true),
      SchemaField("name", "STRING"), SchemaField("score", "FLOAT")))
    JdbcSink.createTable(url, schema, "derby")
    JdbcSink.createTable(url, schema, "derby") // second call must not throw
    assert(count("jobs_t1") == 0L)
  }

  test("insertPayloadInTransaction: all-or-nothing, null fields skipped") {
    val schema = TableSchema("jobs_t2", Seq(
      SchemaField("id", "INT", primaryKey = true), SchemaField("name", "STRING")))
    JdbcSink.createTable(url, schema, "derby")
    val n = JdbcSink.insertPayloadInTransaction(url, "jobs_t2", Seq(
      Map("id" -> 1L, "name" -> "a"),
      Map("id" -> 2L, "name" -> null))) // null skipped per reference semantics
    assert(n == 2L && count("jobs_t2") == 2L)
    assert(query("SELECT name FROM jobs_t2 WHERE id = 2").head.head == null)

    // mid-batch failure (PK violation on the 2nd row) rolls back the 1st
    intercept[java.sql.SQLException] {
      JdbcSink.insertPayloadInTransaction(url, "jobs_t2", Seq(
        Map("id" -> 3L, "name" -> "c"),
        Map("id" -> 1L, "name" -> "dup")))
    }
    assert(count("jobs_t2") == 2L, "rollback must erase the pre-failure insert")
  }

  test("stagedWrite append: partition-parallel load, atomic publish, stage dropped") {
    val schema = TableSchema("events_t3", Seq(
      SchemaField("id", "INT", primaryKey = true), SchemaField("v", "STRING")))
    JdbcSink.createTable(url, schema, "derby")
    val df = spark.range(0, 1000).selectExpr("id", "concat('v', id) AS v")
      .repartition(4)
    val n = JdbcSink.stagedWrite(df, url, "events_t3", batchSize = 100)
    assert(n == 1000L && count("events_t3") == 1000L)
    // no staging table left behind
    JdbcSink.withConnection(url) { conn =>
      val rs = conn.getMetaData.getTables(null, null, "EVENTS_T3_STAGE_%", null)
      assert(!rs.next(), "staging table must be dropped after publish")
    }
  }

  test("stagedWrite upsert merges on the primary key") {
    val schema = TableSchema("led_t4", Seq(
      SchemaField("id", "INT", primaryKey = true), SchemaField("state", "STRING")))
    JdbcSink.createTable(url, schema, "derby")
    JdbcSink.stagedWrite(Seq((1L, "waiting"), (2L, "waiting")).toDF("id", "state"),
      url, "led_t4", pk = Seq("id"))
    // second batch: update id=2, insert id=3
    JdbcSink.stagedWrite(Seq((2L, "succeeded"), (3L, "waiting")).toDF("id", "state"),
      url, "led_t4", pk = Seq("id"))
    assert(query("SELECT id, state FROM led_t4 ORDER BY id")
      .map(r => (r(0).asInstanceOf[Number].longValue, r(1))) ==
      Seq((1L, "waiting"), (2L, "succeeded"), (3L, "waiting")))
  }

  test("stagedWrite publish failure leaves the target untouched and drops the stage") {
    val schema = TableSchema("aud_t5", Seq(
      SchemaField("id", "INT", primaryKey = true), SchemaField("v", "STRING")))
    JdbcSink.createTable(url, schema, "derby")
    JdbcSink.stagedWrite(Seq((1L, "keep")).toDF("id", "v"), url, "aud_t5")
    // append (no pk merge) of a batch violating the target PK: the
    // publish transaction must roll back atomically — target unchanged
    intercept[Exception] {
      JdbcSink.stagedWrite(Seq((1L, "dup"), (9L, "new")).toDF("id", "v"),
        url, "aud_t5")
    }
    assert(count("aud_t5") == 1L)
    assert(query("SELECT v FROM aud_t5").head.head == "keep")
    JdbcSink.withConnection(url) { conn =>
      val rs = conn.getMetaData.getTables(null, null, "AUD_T5_STAGE_%", null)
      assert(!rs.next())
    }
  }

  test("stagedWrite partition failure aborts before publish") {
    val schema = TableSchema("nn_t6", Seq(
      SchemaField("id", "INT", primaryKey = true), SchemaField("v", "STRING")))
    JdbcSink.createTable(url, schema, "derby")
    // v VARCHAR(4000) in the stage; 5000-char value fails the stage
    // insert inside a task -> job aborts -> target never sees the batch
    val poison = Seq((1L, "ok"), (2L, "x" * 5000)).toDF("id", "v")
    intercept[SparkException] {
      JdbcSink.stagedWrite(poison, url, "nn_t6")
    }
    assert(count("nn_t6") == 0L)
  }
}
