package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators — exact (gateway MD5-message-id dedup,
  * kassette-server misc.go:91 GetMD5UUID) and the LLM-pipeline
  * near-dup family (MinHash-LSH / n-gram Jaccard; SimHash lives in
  * graft.plans as a native expression).
  *
  * Scale design: every variant is groupBy/join on a derived key —
  * no cross joins. MinHash banding turns O(n²) similarity into one
  * shuffle on (band, band_hash) with per-bucket pair expansion; the
  * frequent-shingle cap bounds bucket width so the expansion is O(1)
  * per doc at any scale.
  */
object Dedup {

  /** Exact dedup, keep-first: one surviving row per key group with
    * group stats (keeper id, duplicate count, earliest ts). */
  def keepFirst(df: DataFrame, keyCols: Seq[String], orderCol: String,
                tsMsCol: String): DataFrame =
    df.groupBy(keyCols.map(col): _*)
      .agg(
        min(col(orderCol)).as("keeper_id"),
        count(lit(1)).as("n_dups"),
        min(col(tsMsCol)).as("first_ms"))

  /** Exact content dedup by hash (content-defined identity). */
  def byContentHash(df: DataFrame, idCol: String, contentCol: String): DataFrame =
    df.groupBy(md5(col(contentCol)).as("content_hash"))
      .agg(min(col(idCol)).as("keeper_id"), count(lit(1)).as("n_dups"))

  /** Word k-shingles of a text column: one row per (id, shingle).
    * Shingling is row-local (flatMap via explode) — projection only,
    * no shuffle. */
  def shingles(df: DataFrame, idCol: String, textCol: String, k: Int): DataFrame = {
    val toks = split(col(textCol), " ")
    // n-k+1 shingles at start positions 1..n-k+1 (guarded: Spark's
    // sequence() runs DESCENDING when stop < start, so short docs
    // must yield an empty array explicitly)
    val starts = when(size(toks) >= k, sequence(lit(1), size(toks) - (k - 1)))
      .otherwise(array().cast("array<int>"))
    df.select(col(idCol),
        explode(transform(starts, i => array_join(slice(toks, i, lit(k)), " "))).as("shingle"))
  }

  /** MinHash signature rows: for each of `numPerms` hash permutations,
    * the minimum of md5(perm:shingle) over the doc's shingles. Using
    * the lexicographic min of a salted cryptographic hash gives an
    * engine-portable min-hash (identical in DuckDB). One shuffle
    * (groupBy id, perm) with partial-agg `min`. */
  def minhash(sh: DataFrame, idCol: String, numPerms: Int): DataFrame =
    sh.select(col(idCol), explode(sequence(lit(0), lit(numPerms - 1))).as("perm"),
        col("shingle"))
      .groupBy(col(idCol), col("perm"))
      .agg(min(md5(concat(col("perm").cast("string"), lit(":"), col("shingle")))).as("mh"))

  /** LSH banding: hash `rowsPerBand` consecutive minhashes per band.
    * Docs sharing any (band, band_hash) are near-dup candidates. */
  def lshBands(mh: DataFrame, idCol: String, rowsPerBand: Int): DataFrame =
    mh.withColumn("band", (col("perm") / rowsPerBand).cast("int"))
      .groupBy(col(idCol), col("band"))
      .agg(md5(array_join(array_sort(
        collect_list(concat(col("perm").cast("string"), lit(":"), col("mh")))), "|")).as("band_hash"))

  /** Candidate near-dup pairs from banded signatures (id1 < id2). */
  def candidatePairs(bands: DataFrame, idCol: String): DataFrame = {
    val a = bands.select(col(idCol).as("id1"), col("band"), col("band_hash"))
    val b = bands.select(col(idCol).as("id2"), col("band"), col("band_hash"))
    a.join(b, Seq("band", "band_hash"))
      .filter(col("id1") < col("id2"))
      .select("id1", "id2").distinct()
  }

  /** Full MinHash-LSH near-dup pipeline. */
  def minhashLsh(df: DataFrame, idCol: String, textCol: String,
                 shingleK: Int = 3, numPerms: Int = 16, rowsPerBand: Int = 4): DataFrame =
    candidatePairs(lshBands(minhash(shingles(df, idCol, textCol, shingleK), idCol, numPerms),
      idCol, rowsPerBand), idCol)

  /** n-gram Jaccard similarity for pairs sharing at least one shingle.
    * `maxDocFreq` drops stop-shingles so the shingle join cannot
    * quadratically explode on common n-grams (the standard blocking
    * cap; dropped shingles only shrink measured similarity of
    * boilerplate, which is what you want at 100 TB). */
  def ngramJaccard(df: DataFrame, idCol: String, textCol: String, k: Int,
                   maxDocFreq: Int, minJaccard: Double): DataFrame = {
    val sh = shingles(df, idCol, textCol, k).distinct()
    val sizes = sh.groupBy(col(idCol)).agg(count(lit(1)).as("set_size"))
    val rare = sh.join(
      sh.groupBy("shingle").agg(countDistinct(col(idCol)).as("df_count"))
        .filter(col("df_count") <= maxDocFreq),
      "shingle")
    val inter = rare.select(col(idCol).as("id1"), col("shingle"))
      .join(rare.select(col(idCol).as("id2"), col("shingle")), "shingle")
      .filter(col("id1") < col("id2"))
      .groupBy("id1", "id2").agg(count(lit(1)).as("n_inter"))
    inter
      .join(sizes.select(col(idCol).as("id1"), col("set_size").as("size1")), "id1")
      .join(sizes.select(col(idCol).as("id2"), col("set_size").as("size2")), "id2")
      .withColumn("jaccard",
        round(col("n_inter").cast("double") /
          (col("size1") + col("size2") - col("n_inter")), 6))
      .filter(col("jaccard") >= minJaccard)
      .select("id1", "id2", "n_inter", "jaccard")
  }
}
