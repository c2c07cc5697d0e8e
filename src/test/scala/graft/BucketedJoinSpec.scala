package graft

import org.apache.spark.sql.functions._
import graft.sinks.BucketedWriter

class BucketedJoinSpec extends SparkSpec {

  test("bucketed tables join co-located: no Exchange in the plan") {
    val orders = spark.read.parquet(s"$sf/orders.parquet")
    val lineitem = spark.read.parquet(s"$sf/lineitem.parquet")
    BucketedWriter.writeBucketed(orders, "b_orders", "o_orderkey", 8)
    BucketedWriter.writeBucketed(
      lineitem.withColumnRenamed("l_orderkey", "o_orderkey"), "b_lineitem", "o_orderkey", 8)

    val joined = spark.table("b_orders")
      .join(spark.table("b_lineitem").hint("merge"), "o_orderkey")
      .groupBy("o_orderstatus").agg(count(lit(1)).as("n"))

    // force the join itself (pre-agg) to plan: check executed plan of
    // the join stage for shuffle exchanges
    val plan = spark.table("b_orders")
      .join(spark.table("b_lineitem").hint("merge"), "o_orderkey")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")

    // and the result is still correct
    val n = joined.agg(sum("n")).head().getLong(0)
    assert(n == lineitem.count())
  }
}
