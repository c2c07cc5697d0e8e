package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.udf
import org.apache.spark.sql.types._
import org.apache.spark.util.sketch.BloomFilter

/** Bloom-filter membership gate — the writeKey-auth path when the
  * enabled-key set is too large to broadcast as a join side
  * (gateway.go Authenticate at fleet scale). A semi-join needs the
  * whole key set on every executor or a shuffle of the fact stream; a
  * bloom filter compresses 10⁹ keys into a few hundred MB that
  * broadcasts once and answers membership row-locally with NO false
  * negatives (authorized traffic always passes) and a bounded
  * false-positive rate (a sliver of junk survives to the next,
  * exact, stage — the standard two-phase filter, same pattern Spark's
  * own runtime row-level filtering uses).
  *
  * The probe is a closure over the broadcast sketch (a UDF — the one
  * place the functions-over-UDFs rule yields, since no Column algebra
  * can express sketch membership; the sketch lookup is branch-free
  * hashing, not per-row interpretation).
  */
object BloomAuth {

  /** Build the sketch from the enabled-keys frame (driver-side
    * collect of the SKETCH ONLY — executors stream their partials,
    * `expectedKeys`/`fpp` size it). */
  def build(keys: DataFrame, keyCol: String,
            expectedKeys: Long, fpp: Double = 0.01): BloomFilter =
    keys.stat.bloomFilter(keyCol, expectedKeys, fpp)

  /** Row-local membership probe column, dispatched on the key's type:
    * `DataFrame.stat.bloomFilter` inserts strings as UTF-8 bytes and
    * integral keys as longs, so the probe MUST hash the same way — a
    * long-typed probe against a string-built sketch never matches (and
    * the analyzer's string→bigint cast nulls the key first), which
    * would silently drop every row. Anything non-string/non-integral
    * fails fast instead of failing empty. */
  def mightContain(filter: BloomFilter, key: Column, keyType: DataType): Column =
    keyType match {
      case StringType =>
        udf((k: String) => k != null && filter.mightContainString(k))
          .apply(key)
      case ByteType | ShortType | IntegerType | LongType =>
        udf((k: java.lang.Long) => k != null && filter.mightContainLong(k))
          .apply(key.cast(LongType))
      case other => throw new IllegalArgumentException(
        s"BloomAuth supports string and integral keys, got $other")
    }

  /** Two-phase gate: bloom pre-filter (row-local, no shuffle) then
    * exact semi-join on the survivors — the exact join now processes
    * only `fpp` of the unauthorized volume. */
  def filterAuthorized(events: DataFrame, keys: DataFrame, keyCol: String,
                       expectedKeys: Long, fpp: Double = 0.01): DataFrame = {
    val bf = build(keys, keyCol, expectedKeys, fpp)
    events.filter(mightContain(bf, events(keyCol), events.schema(keyCol).dataType))
      .join(keys.select(keyCol).distinct(), Seq(keyCol), "left_semi")
  }
}
