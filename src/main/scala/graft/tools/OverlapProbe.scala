package graft.tools

import org.apache.spark.sql.functions._
import graft.operators.Dedup
import graft.sources.Tables

/** Dev probe: stage attribution for the `_store_overlap` build
  * (Dedup.shingleOverlapStats via ngramJaccard) — the r16→r17 watch
  * item (53 s r15 → 72 s r16 → ~108 s r17 dedicated, untouched code).
  * Times cumulative plan prefixes in one JVM (each stage recomputes
  * its predecessors — deltas attribute), mirroring the operator's own
  * algebra with the public building blocks; stage boundaries cite
  * Dedup.scala so drift is visible in review.
  *   runMain graft.tools.OverlapProbe [sfDir]
  */
object OverlapProbe {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/tmp/graft_sf_x100")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Tables.documents(spark, sf).select(col("doc_id"), col("text"))

    def timed(label: String)(mk: => org.apache.spark.sql.DataFrame): Unit =
      for (run <- 1 to 2) {
        val t0 = System.nanoTime()
        val n = mk.count()
        println(f"OVL $label%-18s run$run ${(System.nanoTime() - t0) / 1e9}%7.2f s rows=$n")
      }

    // stage 1: shingle explode (tokenize + slide) — Dedup.shingles
    timed("shingles")(Dedup.shingles(docs, "doc_id", "text", 3))
    // stage 2: + md5-prefix hash — Dedup.shingleHash
    def hashed = Dedup.shingles(docs, "doc_id", "text", 3)
      .select(col("doc_id"), Dedup.shingleHash(col("shingle")).as("sh"))
    timed("+hash")(hashed)
    // stage 3: + per-doc distinct (hashedShingles' distinct)
    def dist = hashed.distinct()
    timed("+distinct")(dist)
    // stage 4: + groupBy shingle collect_set (the perShingle frame)
    def perShingle = dist.groupBy("sh")
      .agg(sort_array(collect_set(col("doc_id"))).as("ids"))
    timed("+collect_set")(perShingle)
    // stage 5: + pair expansion + pair groupBy (the inter frame)
    timed("+pairs") {
      val ids = col("ids")
      perShingle.filter(size(ids) <= 50)
        .select(explode(flatten(transform(ids, (x, i) =>
          transform(slice(ids, i + 2, size(ids)),
            y => struct(x.as("id1"), y.as("id2")))))).as("p"))
        .groupBy(col("p.id1").as("id1"), col("p.id2").as("id2"))
        .agg(count(lit(1)).as("n_inter"))
    }
    // full operator (joins + jaccard filter), memo OFF so it times
    timed("full ngramJaccard")(Dedup.ngramJaccard(docs, "doc_id", "text",
      k = 3, maxDocFreq = 50, minJaccard = 0.1, cacheKey = None))
    // the BENCH path: cacheKey on → hashedShingles materializes into
    // the session signature store (26M-row localCheckpoint) and the
    // overlap stats checkpoint too — the delta over cacheKey=None is
    // the store-materialization cost the _store_overlap key carries
    for (run <- 1 to 2) {
      graft.operators.Dedup.clearStore()
      val t0 = System.nanoTime()
      val n = Dedup.ngramJaccard(docs, "doc_id", "text",
        k = 3, maxDocFreq = 50, minJaccard = 0.1,
        cacheKey = Some("ovlprobe")).count()
      println(f"OVL full+store      run$run ${(System.nanoTime() - t0) / 1e9}%7.2f s rows=$n")
    }
    spark.stop()
  }
}
