package graft

/** Driver-contract smoke: every declared query runs and every oracle
  * key has a query (the inverse is allowed — rows-only checks). */
class EntrySpec extends SparkSpec {

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("oracleSql keys are a subset of queries keys") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle without query: $missing")
  }

  test("every query runs non-empty at sf0.001") {
    val empty = SparkEntry.queries.collect {
      case (name, fn) if fn(spark, sf).limit(1).count() == 0 => name
    }
    assert(empty.isEmpty, s"empty results: $empty")
  }

  test("multimodal decode stub emits plausible features") {
    val feats = graft.operators.Multimodal.features(
      spark.read.parquet(s"$sf/documents.parquet"))
    val r = feats.agg(
      org.apache.spark.sql.functions.min("byte_len"),
      org.apache.spark.sql.functions.max("mean_byte")).head()
    assert(r.getInt(0) == 16) // md5 payload = 16 bytes
    assert(r.getDouble(1) <= 255.0)
  }
}
