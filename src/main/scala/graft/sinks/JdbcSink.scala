package graft.sinks

import java.sql.{Connection, DriverManager, Types}

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._
import graft.model.TableSchema

/** Transactional JDBC delivery — the reference's default destination
  * (integrations/postgres/main.go): `Connect` creates the destination
  * table from the catalogue schema (createDestinationTable, :32) and
  * each payload batch lands inside ONE transaction
  * (InsertPayloadInTransaction, :108: Begin → prepared insert →
  * Commit, rollback on any failure).
  *
  * Re-expressed for Spark's execution model in two tiers:
  *  - [[insertPayloadInTransaction]] is the literal reference shape —
  *    one driver-side transaction per micro-batch of payload maps,
  *    per-row dynamic column lists (the reference skips null fields).
  *    Right for the streaming foreachBatch egress where a micro-batch
  *    is small.
  *  - [[stagedWrite]] is the bulk path: executors insert partitions in
  *    parallel (each partition its own connection + transaction —
  *    prepared statement, addBatch/executeBatch) into a STAGING
  *    table, then ONE driver-side transaction publishes
  *    staging → target (plain INSERT..SELECT, or MERGE when a primary
  *    key is given — upsert). Readers of the target never observe a
  *    partial batch: per-partition failures abort before publish, a
  *    publish failure rolls back atomically, and the staging table is
  *    dropped either way. This is the same stage-then-swap discipline
  *    as warehouseutils' staging loads, applied to JDBC.
  *
  * Tested against in-JVM embedded Derby (the container has no server
  * database); the SQL sticks to portable prepared-statement inserts +
  * ANSI MERGE so a Postgres/warehouse URL behaves the same.
  */
object JdbcSink {

  def withConnection[T](url: String)(f: Connection => T): T = {
    val conn = DriverManager.getConnection(url)
    try f(conn) finally conn.close()
  }

  /** Create the destination table from the catalogue schema if absent
    * (createDestinationTable analogue; existence via JDBC metadata —
    * Derby has no IF NOT EXISTS). The probe tries the identifier in
    * both fold directions: Derby/Oracle store unquoted names upper,
    * Postgres lower — a single-case probe would miss on the other
    * family and the unconditional CREATE would throw on re-run. */
  def createTable(url: String, schema: TableSchema, dialect: String): Unit =
    withConnection(url) { conn =>
      def probe(name: String): Boolean = {
        val rs = conn.getMetaData.getTables(null, null, name, null)
        try rs.next() finally rs.close()
      }
      val t = schema.tableName
      val exists = probe(t.toUpperCase) || probe(t.toLowerCase) || probe(t)
      if (!exists) {
        val st = conn.createStatement()
        try st.executeUpdate(WarehouseWriter.ddl(schema, dialect, ifNotExists = false))
        finally st.close()
      }
    }

  private def sqlType(dt: DataType): Int = dt match {
    case LongType => Types.BIGINT
    case IntegerType | ShortType | ByteType => Types.INTEGER
    case DoubleType => Types.DOUBLE
    case FloatType => Types.FLOAT
    case BooleanType => Types.BOOLEAN
    case TimestampType => Types.TIMESTAMP
    case DateType => Types.DATE
    case _: DecimalType => Types.DECIMAL
    case StringType => Types.VARCHAR
    case other => throw new IllegalArgumentException(
      s"JdbcSink does not map $other to a JDBC type")
  }

  /** Insert an iterator of rows inside one transaction on `conn` —
    * prepared multi-row batches, commit at the end, rollback on ANY
    * failure (the all-or-nothing contract of
    * InsertPayloadInTransaction, per connection). `preamble` runs
    * first INSIDE the same transaction (stagedWrite uses it to delete
    * a retried task's previous rows — idempotent re-insert). The
    * caller's autoCommit setting is restored on exit. Returns rows
    * written. */
  def insertRows(conn: Connection, table: String, schema: StructType,
                 rows: Iterator[Row], batchSize: Int = 500,
                 preamble: Option[String] = None): Long = {
    val cols = schema.fieldNames
    val prevAutoCommit = conn.getAutoCommit
    conn.setAutoCommit(false)
    val ps = conn.prepareStatement(
      s"INSERT INTO $table (${cols.mkString(",")}) VALUES (${cols.map(_ => "?").mkString(",")})")
    try {
      preamble.foreach { sql =>
        val st = conn.createStatement()
        try st.executeUpdate(sql) finally st.close()
      }
      var n = 0L
      var inBatch = 0
      rows.foreach { r =>
        schema.fields.zipWithIndex.foreach { case (f, i) =>
          if (r.isNullAt(i)) ps.setNull(i + 1, sqlType(f.dataType))
          else ps.setObject(i + 1, r.get(i))
        }
        ps.addBatch()
        inBatch += 1; n += 1
        if (inBatch >= batchSize) { ps.executeBatch(); inBatch = 0 }
      }
      if (inBatch > 0) ps.executeBatch()
      conn.commit()
      n
    } catch {
      case t: Throwable => conn.rollback(); throw t
    } finally {
      ps.close()
      conn.setAutoCommit(prevAutoCommit)
    }
  }

  /** The reference shape verbatim: one transaction for a batch of
    * payload maps, per-row dynamic columns (null fields skipped —
    * main.go:108 builds the field list per payload). Driver-side by
    * design: the streaming egress calls this per micro-batch. */
  def insertPayloadInTransaction(url: String, table: String,
                                 payloads: Seq[Map[String, Any]]): Long =
    withConnection(url) { conn =>
      conn.setAutoCommit(false)
      try {
        var n = 0L
        payloads.foreach { p =>
          val fields = p.toSeq.filter(_._2 != null)
          if (fields.nonEmpty) {
            val ps = conn.prepareStatement(
              s"INSERT INTO $table (${fields.map(_._1).mkString(",")}) " +
                s"VALUES (${fields.map(_ => "?").mkString(",")})")
            try {
              fields.zipWithIndex.foreach { case ((_, v), i) =>
                ps.setObject(i + 1, v)
              }
              ps.executeUpdate()
              n += 1
            } finally ps.close()
          }
        }
        conn.commit()
        n
      } catch {
        case t: Throwable => conn.rollback(); throw t
      }
    }

  private def stageDdl(stage: String, schema: StructType): String = {
    val cols = schema.fields.map { f =>
      val t = f.dataType match {
        case LongType => "BIGINT"
        case IntegerType | ShortType | ByteType => "INTEGER"
        case DoubleType => "DOUBLE"
        case FloatType => "REAL"
        case BooleanType => "BOOLEAN"
        case TimestampType => "TIMESTAMP"
        case DateType => "DATE"
        case d: DecimalType => s"DECIMAL(${d.precision},${d.scale})"
        case StringType => "VARCHAR(4000)"
        case other => throw new IllegalArgumentException(
          s"JdbcSink does not map $other to a DDL type")
      }
      s"${f.name} $t"
    }
    // graft_task_part keys each Spark partition's rows so a retried
    // task can delete-then-insert its own slice (idempotent under task
    // retry); publish never selects it. Letter-leading on purpose:
    // Derby rejects unquoted identifiers starting with '_'.
    s"CREATE TABLE $stage (${cols.mkString(", ")}, graft_task_part INTEGER)"
  }

  /** Distributed transactional load: partition-parallel staged insert,
    * then one atomic publish (INSERT..SELECT, or MERGE upsert on
    * `pk`). Returns rows published. The staging table is dropped on
    * every exit path.
    *
    * Idempotent under task RETRY: each task's transaction first
    * deletes its own partition's rows (`graft_task_part` key) before
    * re-inserting, so a retried task replaces rather than duplicates
    * its slice. (CONCURRENT duplicate attempts — speculative
    * execution — could still interleave; leave `spark.speculation`
    * at its default `false` for JDBC loads.) */
  def stagedWrite(df: DataFrame, url: String, target: String,
                  pk: Seq[String] = Nil, batchSize: Int = 500): Long = {
    val stage = s"${target}_STAGE_${java.util.UUID.randomUUID.toString.take(8).replace("-", "")}"
    val schema = df.schema
    withConnection(url) { conn =>
      val st = conn.createStatement()
      try st.executeUpdate(stageDdl(stage, schema)) finally st.close()
    }
    try {
      // graft_task_part is the RUNTIME task partition id, read inside
      // the task via TaskContext — NOT a plan-level
      // spark_partition_id() column: over a LocalRelation, Catalyst's
      // ConvertToLocalRelation evaluates projections on the driver
      // with nondeterministic expressions initialized at partition 0,
      // baking part=0 into EVERY row — two concurrent write tasks
      // then share a slice key and the retry-guard DELETE below can
      // erase a sibling task's committed rows (a real observed race:
      // ~1/40 on a 2-row local frame).
      val stageSchema = org.apache.spark.sql.types.StructType(
        schema.fields :+ org.apache.spark.sql.types.StructField(
          "graft_task_part", org.apache.spark.sql.types.IntegerType, nullable = false))
      // inside an ACTION, accumulator updates apply exactly once per
      // successful task — a retried task re-deletes its slice and
      // does not double-count
      val acc = df.sparkSession.sparkContext.longAccumulator("graft_staged_rows")
      df.foreachPartition { (rows: Iterator[Row]) =>
        if (rows.hasNext) {
          val part = org.apache.spark.TaskContext.getPartitionId()
          val it = rows.map(r => Row.fromSeq(r.toSeq :+ part))
          val n = withConnection(url)(conn => insertRows(conn, stage, stageSchema, it,
            batchSize, preamble = Some(s"DELETE FROM $stage WHERE graft_task_part = $part")))
          acc.add(n)
        }
      }
      // integrity gate before the atomic publish: every row a task
      // reported inserted must be visible in the stage — a silently
      // short stage must fail loudly here (retryable), never publish
      // less than the frame
      val staged = withConnection(url) { conn =>
        val st = conn.createStatement()
        try {
          val rs = st.executeQuery(s"SELECT COUNT(*) FROM $stage")
          rs.next(); rs.getLong(1)
        } finally st.close()
      }
      require(staged == acc.value,
        s"stagedWrite integrity: $staged rows visible in $stage but " +
          s"${acc.value} reported inserted — refusing to publish a short stage")
      withConnection(url) { conn =>
        conn.setAutoCommit(false)
        val cols = schema.fieldNames
        val sql =
          if (pk.isEmpty)
            s"INSERT INTO $target (${cols.mkString(",")}) " +
              s"SELECT ${cols.mkString(",")} FROM $stage"
          else {
            val nonPk = cols.filterNot(pk.contains)
            val on = pk.map(c => s"t.$c = s.$c").mkString(" AND ")
            val set = nonPk.map(c => s"$c = s.$c").mkString(", ")
            val matched =
              if (nonPk.isEmpty) "" else s" WHEN MATCHED THEN UPDATE SET $set"
            s"MERGE INTO $target t USING $stage s ON $on$matched " +
              s"WHEN NOT MATCHED THEN INSERT (${cols.mkString(",")}) " +
              s"VALUES (${cols.map(c => s"s.$c").mkString(",")})"
          }
        val st = conn.createStatement()
        try {
          val n = st.executeUpdate(sql).toLong
          conn.commit()
          n
        } catch {
          case t: Throwable => conn.rollback(); throw t
        } finally st.close()
      }
    } finally {
      try withConnection(url) { conn =>
        val st = conn.createStatement()
        try st.executeUpdate(s"DROP TABLE $stage") finally st.close()
      } catch { case _: Throwable => () }
    }
  }
}
