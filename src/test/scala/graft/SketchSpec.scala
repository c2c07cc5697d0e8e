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

  test("q32 grouped sketch percentiles track exact within 5% per group") {
    val q = SparkEntry.queries("q32_approx_percentiles")(spark, sf)
    val exact = spark.read.parquet(s"$sf/orders.parquet")
      .groupBy("o_orderstatus")
      .agg(expr("percentile(o_totalprice, 0.9)").as("e90"))
    val joined = q.join(exact, "o_orderstatus").collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      val a = r.getAs[Double]("p90"); val e = r.getAs[Double]("e90")
      assert(math.abs(a - e) / e < 0.05, s"${r.get(0)}: approx=$a exact=$e")
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
