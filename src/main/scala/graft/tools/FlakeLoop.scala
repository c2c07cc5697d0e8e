package graft.tools

import graft.sinks.JdbcSink
import graft.model.{TableSchema, SchemaField}

/** Stress loop for the stagedWrite task-slice race (regression tool
  * for the LocalRelation spark_partition_id fold bug). */
object FlakeLoop {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.builder("local[4]")
      .config("spark.sql.shuffle.partitions", "4").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val url = s"jdbc:derby:memory:flake${System.nanoTime};create=true"
    JdbcSink.createTable(url, TableSchema("led_f", Seq(
      SchemaField("id", "INT", primaryKey = true),
      SchemaField("state", "STRING"))), "derby")
    val n = args.headOption.map(_.toInt).getOrElse(100)
    var i = 0
    while (i < n) {
      JdbcSink.stagedWrite(Seq((1L, "waiting"), (2L, "waiting")).toDF("id", "state"),
        url, "led_f", pk = Seq("id"))
      JdbcSink.stagedWrite(Seq((2L, "succeeded"), (3L, "waiting")).toDF("id", "state"),
        url, "led_f", pk = Seq("id"))
      i += 1
      if (i % 50 == 0) println(s"iter $i ok")
    }
    println(s"DONE no flake in $n iterations")
    spark.stop()
  }
}
