package graft

import org.apache.spark.sql.functions._

class SketchSpec extends SparkSpec {

  test("HLL distinct estimates land within 5% of exact") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    val r = li.agg(
      approx_count_distinct(col("l_partkey"), rsd = 0.02).as("est"),
      countDistinct(col("l_partkey")).as("exact")).head()
    val est = r.getLong(0).toDouble
    val exact = r.getLong(1).toDouble
    assert(math.abs(est - exact) / exact < 0.05, s"est=$est exact=$exact")
  }

  test("q30/q32 in-query sketch verdicts hold per group") {
    // the 5% accuracy claim is part of the gate row now — assert the
    // verdict column is TRUE for every group at the spec SF too
    for (name <- Seq("q30_sketch_distinct", "q32_approx_percentiles")) {
      val rows = SparkEntry.queries(name)(spark, sf).collect()
      assert(rows.nonEmpty, name)
      rows.foreach { r =>
        assert(r.getAs[Boolean]("sketch_within_5pct"), s"$name: $r")
      }
    }
  }

  test("approx percentile tracks exact percentile") {
    val ord = spark.read.parquet(s"$sf/orders.parquet")
    val r = ord.agg(
      expr("approx_percentile(o_totalprice, 0.5, 1000)").as("approx"),
      expr("percentile(o_totalprice, 0.5)").as("exact")).head()
    val approx = r.getDouble(0)
    val exact = r.getDouble(1)
    assert(math.abs(approx - exact) / exact < 0.05, s"approx=$approx exact=$exact")
  }
}
