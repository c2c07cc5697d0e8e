package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sinks.JdbcSink.withConnection

/** The durable config store behind the control plane — the
  * reference's backendconfig Postgres CRUD
  * (backendconfig/configdb.go:99-180 table bootstrap, :264/:435/:527
  * inserts, :277/:369/:495 portal list queries) re-expressed as a
  * JDBC-backed dimension source for the engine:
  *
  *  - [[bootstrap]] creates the four tables (`service_catalogue`,
  *    `source`, `destination`, `connection`) with the reference's
  *    column shape in portable ANSI DDL (JSONB → VARCHAR: Derby — the
  *    test database — and every warehouse dialect accept it; ids are
  *    caller-assigned instead of BIGSERIAL so inserts are
  *    deterministic and portable).
  *  - the insert/update helpers are the configdb CRUD surface the
  *    portal uses (prepared statements, not string-spliced SQL).
  *  - [[sources]]/[[destinations]]/[[connections]] read the tables
  *    back through the SAME pluggable [[CatalogReader]] JDBC path as
  *    any other source — config is just another dimension frame.
  *  - [[enabledWriteKeys]] is the gateway auth dim
  *    (gateway.go getPayloadAndWriteKey ← configdb.go:566 write-key
  *    lookup): feed it to `authFilterStream` for a static gate, or as
  *    the `resolveKeys` thunk of `authFilterRefreshing` for the
  *    hot-reload loop — an UPDATE here lands on the very next
  *    micro-batch, which closes the reference's config-poll →
  *    hot-apply cycle end to end.
  *  - [[routingTable]] joins connection → source/destination into the
  *    router fan-out dim (enabled rows only, both sides).
  *
  * Scale shape: config tables are control-plane-tiny (thousands of
  * rows, not data-plane volume) — they read in one JDBC partition and
  * join into streams/jobs as broadcast dims, never shuffling the fact
  * side.
  */
object ConfigStore {

  /** configdb.go:99-180, portable DDL. Idempotent via JDBC metadata
    * probe (same both-fold-directions discipline as
    * JdbcSink.createTable — Derby stores unquoted names upper). */
  def bootstrap(url: String): Unit = withConnection(url) { conn =>
    def exists(name: String): Boolean = {
      def probe(n: String): Boolean = {
        val rs = conn.getMetaData.getTables(null, null, n, null)
        try rs.next() finally rs.close()
      }
      probe(name.toUpperCase) || probe(name.toLowerCase) || probe(name)
    }
    val ddl = Seq(
      """CREATE TABLE "service_catalogue" (
        | id BIGINT PRIMARY KEY, name VARCHAR(255) NOT NULL,
        | type VARCHAR(255) NOT NULL, access VARCHAR(255) NOT NULL,
        | category VARCHAR(255) NOT NULL, url VARCHAR(2048) NOT NULL,
        | notes VARCHAR(2048) NOT NULL, metadata VARCHAR(4096),
        | iconurl VARCHAR(2048) NOT NULL)""".stripMargin,
      """CREATE TABLE "source" (
        | id BIGINT PRIMARY KEY, name VARCHAR(255) NOT NULL,
        | service_id INT, write_key VARCHAR(255) NOT NULL,
        | customer_id INT, config VARCHAR(4096) NOT NULL,
        | status VARCHAR(255) NOT NULL)""".stripMargin,
      """CREATE TABLE "destination" (
        | id BIGINT PRIMARY KEY, name VARCHAR(255) NOT NULL,
        | service_id INT, customer_id INT, config VARCHAR(4096) NOT NULL,
        | status VARCHAR(255) NOT NULL)""".stripMargin,
      """CREATE TABLE "connection" (
        | id BIGINT PRIMARY KEY, source_id INT, destination_id INT,
        | transforms VARCHAR(4096) NOT NULL)""".stripMargin)
    val names = Seq("service_catalogue", "source", "destination", "connection")
    names.zip(ddl).foreach { case (n, d) =>
      if (!exists(n)) {
        val st = conn.createStatement()
        try st.executeUpdate(d) finally st.close()
      }
    }
  }

  // ---- CRUD surface (configdb.go CreateNewSource / CreateNewDestination /
  // CreateNewConnection / portal status updates), prepared statements

  def insertSource(url: String, id: Long, name: String, serviceId: Int,
                   writeKey: String, customerId: Int, config: String,
                   status: String = "enabled"): Unit =
    withConnection(url) { conn =>
      val ps = conn.prepareStatement(
        "INSERT INTO \"source\" (id, name, service_id, write_key, customer_id, config, status) VALUES (?,?,?,?,?,?,?)")
      try {
        ps.setLong(1, id); ps.setString(2, name); ps.setInt(3, serviceId)
        ps.setString(4, writeKey); ps.setInt(5, customerId)
        ps.setString(6, config); ps.setString(7, status)
        ps.executeUpdate()
      } finally ps.close()
    }

  def insertDestination(url: String, id: Long, name: String, serviceId: Int,
                        customerId: Int, config: String,
                        status: String = "enabled"): Unit =
    withConnection(url) { conn =>
      val ps = conn.prepareStatement(
        "INSERT INTO \"destination\" (id, name, service_id, customer_id, config, status) VALUES (?,?,?,?,?,?)")
      try {
        ps.setLong(1, id); ps.setString(2, name); ps.setInt(3, serviceId)
        ps.setInt(4, customerId); ps.setString(5, config); ps.setString(6, status)
        ps.executeUpdate()
      } finally ps.close()
    }

  def insertConnection(url: String, id: Long, sourceId: Int,
                       destinationId: Int, transforms: String = "[]"): Unit =
    withConnection(url) { conn =>
      val ps = conn.prepareStatement(
        "INSERT INTO \"connection\" (id, source_id, destination_id, transforms) VALUES (?,?,?,?)")
      try {
        ps.setLong(1, id); ps.setInt(2, sourceId); ps.setInt(3, destinationId)
        ps.setString(4, transforms)
        ps.executeUpdate()
      } finally ps.close()
    }

  def insertCatalogue(url: String, id: Long, name: String, typ: String,
                      access: String, category: String, catUrl: String,
                      notes: String, metadata: String,
                      iconUrl: String): Unit =
    withConnection(url) { conn =>
      val ps = conn.prepareStatement(
        "INSERT INTO \"service_catalogue\" (id, name, type, access, category, url, notes, metadata, iconurl) VALUES (?,?,?,?,?,?,?,?,?)")
      try {
        ps.setLong(1, id); ps.setString(2, name); ps.setString(3, typ)
        ps.setString(4, access); ps.setString(5, category)
        ps.setString(6, catUrl); ps.setString(7, notes)
        ps.setString(8, metadata); ps.setString(9, iconUrl)
        ps.executeUpdate()
      } finally ps.close()
    }

  // portal update/delete surface (configdb.go:342 UpdateSource, :355
  // DeleteSource and the destination/connection twins) — prepared
  // statements where the reference splices strings; true = no error,
  // matching the reference's success contract (an UPDATE matching no
  // row still "succeeds")

  def updateSource(url: String, id: Long, name: String, serviceId: Int,
                   writeKey: String, customerId: Int, config: String,
                   status: String): Boolean =
    try withConnection(url) { conn =>
      val ps = conn.prepareStatement(
        "UPDATE \"source\" SET name=?, service_id=?, write_key=?, customer_id=?, config=?, status=? WHERE id=?")
      try {
        ps.setString(1, name); ps.setInt(2, serviceId)
        ps.setString(3, writeKey); ps.setInt(4, customerId)
        ps.setString(5, config); ps.setString(6, status); ps.setLong(7, id)
        ps.executeUpdate(); true
      } finally ps.close()
    } catch { case _: java.sql.SQLException => false }

  def deleteSource(url: String, id: Long): Boolean =
    deleteById(url, "source", id)

  def updateDestination(url: String, id: Long, name: String, serviceId: Int,
                        customerId: Int, config: String,
                        status: String): Boolean =
    try withConnection(url) { conn =>
      val ps = conn.prepareStatement(
        "UPDATE \"destination\" SET name=?, service_id=?, customer_id=?, config=?, status=? WHERE id=?")
      try {
        ps.setString(1, name); ps.setInt(2, serviceId)
        ps.setInt(3, customerId); ps.setString(4, config)
        ps.setString(5, status); ps.setLong(6, id)
        ps.executeUpdate(); true
      } finally ps.close()
    } catch { case _: java.sql.SQLException => false }

  def deleteDestination(url: String, id: Long): Boolean =
    deleteById(url, "destination", id)

  def updateConnection(url: String, id: Long, sourceId: Int,
                       destinationId: Int, transforms: String): Boolean =
    try withConnection(url) { conn =>
      val ps = conn.prepareStatement(
        "UPDATE \"connection\" SET source_id=?, destination_id=?, transforms=? WHERE id=?")
      try {
        ps.setInt(1, sourceId); ps.setInt(2, destinationId)
        ps.setString(3, transforms); ps.setLong(4, id)
        ps.executeUpdate(); true
      } finally ps.close()
    } catch { case _: java.sql.SQLException => false }

  def deleteConnection(url: String, id: Long): Boolean =
    deleteById(url, "connection", id)

  private def deleteById(url: String, table: String, id: Long): Boolean =
    try withConnection(url) { conn =>
      val ps = conn.prepareStatement(s"""DELETE FROM "$table" WHERE id=?""")
      try { ps.setLong(1, id); ps.executeUpdate(); true } finally ps.close()
    } catch { case _: java.sql.SQLException => false }

  /** Portal login check (configdb.go:565 Authenticate): does ANY
    * source row carry this write key — status ignored, exactly the
    * reference's `count(*) WHERE write_key = …`. */
  def authenticate(url: String, writeKey: String): Boolean =
    withConnection(url) { conn =>
      val ps = conn.prepareStatement(
        "SELECT COUNT(*) FROM \"source\" WHERE write_key = ?")
      try {
        ps.setString(1, writeKey)
        val rs = ps.executeQuery()
        try { rs.next(); rs.getLong(1) > 0 } finally rs.close()
      } finally ps.close()
    }

  /** The portal's enable/disable toggle — what the hot-reload loop
    * observes between micro-batches. */
  def setSourceStatus(url: String, id: Long, status: String): Unit =
    withConnection(url) { conn =>
      val ps = conn.prepareStatement("UPDATE \"source\" SET status = ? WHERE id = ?")
      try { ps.setString(1, status); ps.setLong(2, id); ps.executeUpdate() }
      finally ps.close()
    }

  // ---- dimension reads (portal list queries), via the pluggable
  // CatalogReader JDBC path — one partition, broadcast-sized

  private def table(spark: SparkSession, url: String, name: String): DataFrame =
    CatalogReader.read(spark, CatalogReader.SourceSpec("jdbc",
      options = Map("url" -> url, "dbtable" -> s"\"$name\"")))

  def sources(spark: SparkSession, url: String): DataFrame =
    table(spark, url, "source")

  def destinations(spark: SparkSession, url: String): DataFrame =
    table(spark, url, "destination")

  def connections(spark: SparkSession, url: String): DataFrame =
    table(spark, url, "connection")

  /** Enabled write keys — the gateway auth dim (status filter pushes
    * down to the database through the JDBC source). */
  def enabledWriteKeys(spark: SparkSession, url: String): DataFrame =
    sources(spark, url).filter(col("status") === "enabled")
      .select(col("write_key"))

  /** Point lookup for the HTTP handler's per-request auth
    * (configdb.go:566 `SELECT count(*) FROM source WHERE write_key=…`)
    * — the socket path cannot afford a Spark job per request; the
    * streaming paths use [[enabledWriteKeys]] as a broadcast dim
    * instead. */
  def isWriteKeyEnabled(url: String, writeKey: String): Boolean =
    withConnection(url) { conn =>
      val ps = conn.prepareStatement(
        "SELECT COUNT(*) FROM \"source\" WHERE write_key = ? AND status = 'enabled'")
      try {
        ps.setString(1, writeKey)
        val rs = ps.executeQuery()
        try { rs.next(); rs.getLong(1) > 0 } finally rs.close()
      } finally ps.close()
    }

  /** connection ⋈ source ⋈ destination, enabled rows only on both
    * sides — the router's fan-out dim: which destination(s) each
    * write key routes to, with the per-connection transform config. */
  def routingTable(spark: SparkSession, url: String): DataFrame =
    connections(spark, url).alias("c")
      .join(sources(spark, url).filter(col("status") === "enabled").alias("s"),
        col("c.source_id") === col("s.id"))
      .join(destinations(spark, url).filter(col("status") === "enabled").alias("d"),
        col("c.destination_id") === col("d.id"))
      .select(col("s.write_key").as("write_key"),
        col("s.name").as("source_name"),
        col("d.name").as("destination_name"),
        col("c.transforms").as("transforms"))
}
