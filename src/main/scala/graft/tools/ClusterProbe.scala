package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: time the semantic pair build and the min-label closure
  * separately over an arbitrary embeddings corpus (the 10× gate
  * exposed a cap-out here — keep the two costs attributable).
  *   sbt "runMain graft.tools.ClusterProbe <embeddings-parquet-dir>"
  */
object ClusterProbe {
  def main(args: Array[String]): Unit = {
    val path = args.headOption.getOrElse("/tmp/graft_scale_x10/embeddings")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"PROBE $label ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val emb = spark.read.parquet(path)
    val pairs = time("pairs") {
      graft.operators.Similarity.semanticDedup(emb, "vec_id", "embedding",
          numPlanes = 6, dim = 64, minCos = 0.35)
        .localCheckpoint(eager = true)
    }
    println(s"PROBE n_pairs ${pairs.count()}")
    // instrumented replica of the clusterPairs loop: per-pass changed
    // counts show whether the pointer jumps actually shrink distance
    val edges = pairs.select(col("id1").as("src"), col("id2").as("dst"))
      .unionAll(pairs.select(col("id2").as("src"), col("id1").as("dst")))
    val e = edges.localCheckpoint(eager = true)
    var labels = e.select(col("src").as("id")).distinct()
      .withColumn("cluster", col("id"))
      .localCheckpoint(eager = true)
    for (it <- 0 until 14) {
      val neighborMin = e
        .join(labels.withColumnRenamed("id", "dst"), "dst")
        .groupBy(col("src").as("id"))
        .agg(min(col("cluster")).as("nmin"))
      var cur = labels.withColumnRenamed("cluster", "prev")
        .join(neighborMin, Seq("id"), "left_outer")
        .select(col("id"), col("prev"),
          least(col("prev"), coalesce(col("nmin"), col("prev"))).as("cluster"))
        .localCheckpoint(eager = true)
      for (_ <- 0 until 3) {
        cur = cur
          .join(cur.select(col("id").as("cluster"), col("cluster").as("cc")),
            Seq("cluster"), "left_outer")
          .select(col("id"), col("prev"),
            least(col("cluster"), coalesce(col("cc"), col("cluster"))).as("cluster"))
          .localCheckpoint(eager = true)
      }
      val changed = cur.filter(col("cluster") =!= col("prev")).count()
      val nclusters = cur.select("cluster").distinct().count()
      println(s"PROBE iter=$it changed=$changed clusters=$nclusters")
      val clean = cur.drop("prev")
      labels = clean.sparkSession.createDataFrame(clean.rdd, clean.schema)
    }
    spark.stop()
  }
}
