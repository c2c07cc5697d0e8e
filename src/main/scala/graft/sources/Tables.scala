package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Parquet table catalogue over an sf directory (TESTDATA.md).
  *
  * Mirrors the reference's source catalogue (kassette-server
  * `backendconfig/configdb.go` keeps a DB-backed catalogue of sources;
  * here the catalogue is a parquet lakehouse directory). All reads are
  * plain `spark.read.parquet` so Catalyst sees a relation it can push
  * filters/projections into — verify with `.explain("formatted")`
  * (`PushedFilters`, `ReadSchema`).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    graft.GraftSession.tune(spark)
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events") normalizeEvents(df) else df
  }

  /** events.parquet stores ts as INT64 TIMESTAMP(NANOS); with
    * `nanosAsLong` it surfaces as epoch-nanos LongType. Normalize to:
    *  - `ts_ms`  epoch millis (BIGINT, floor) — the canonical event
    *    time used by every pipeline operator (ns→ms floor matches the
    *    DuckDB oracle's `epoch_ns(ts)//1000000`),
    *  - `ts` TimestampType (micros) for windowing/watermarks.
    * Idempotent: a corpus WRITTEN from this frame (the replicated
    * scale-smoke tables) already carries ts_ms + a micros ts — the
    * double floor ns→µs→ms equals the single ns→ms floor, so reading
    * it back unchanged keeps every oracle consistent. */
  private def normalizeEvents(df: DataFrame): DataFrame =
    if (df.columns.contains("ts_ms")) df
    else df.withColumn("ts_ms", expr("ts div 1000000"))
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))

  def region(s: SparkSession, d: String): DataFrame = apply(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = apply(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = apply(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = apply(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = apply(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = apply(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = apply(s, d, "lineitem")
  def events(s: SparkSession, d: String): DataFrame = apply(s, d, "events")
  def documents(s: SparkSession, d: String): DataFrame = apply(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = apply(s, d, "embeddings")
}
