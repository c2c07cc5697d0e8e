package graft

import java.net.{DatagramPacket, DatagramSocket}
import java.nio.charset.StandardCharsets

import graft.sinks.StatsEmitter

/** Runtime metrics emission (services/stats.go) received wire-level:
  * a UDP "daemon" socket collects statsd lines while the engine runs
  * batch and streaming work. */
class StatsEmitterSpec extends SparkSpec {

  /** Collect statsd datagrams until `enough` says stop or the deadline
    * passes. */
  private def collect(socket: DatagramSocket, deadlineMs: Long)(
      enough: Seq[String] => Boolean): Seq[String] = {
    val got = scala.collection.mutable.ArrayBuffer[String]()
    socket.setSoTimeout(200)
    val t0 = System.currentTimeMillis()
    while (!enough(got.toSeq) && System.currentTimeMillis() - t0 < deadlineMs) {
      val buf = new Array[Byte](1500)
      val p = new DatagramPacket(buf, buf.length)
      try {
        socket.receive(p)
        got += new String(p.getData, 0, p.getLength, StandardCharsets.UTF_8)
      } catch { case _: java.net.SocketTimeoutException => () }
    }
    got.toSeq
  }

  test("statsd lines for pipeline counters, scheduler events and micro-batches") {
    val daemon = new DatagramSocket(0)
    val (client, detach) = StatsEmitter.attach(spark, "localhost",
      daemon.getLocalPort, prefix = "graft")
    try {
      // the reference's own counter surface (gateway.go:209
      // source.success, router.go:392 dest.failure)
      client.count("source.success")
      client.count("dest.failure", 3)
      client.gauge("queue.depth", 7.5)
      client.timing("deliver.ms", 42)
      val direct = collect(daemon, 5000)(g =>
        g.count(_.startsWith("graft.")) >= 4)
      assert(direct.contains("graft.source.success:1|c"), direct.toString)
      assert(direct.contains("graft.dest.failure:3|c"))
      assert(direct.contains("graft.queue.depth:7.5|g"))
      assert(direct.contains("graft.deliver.ms:42|ms"))

      // scheduler events: one real job → task.end + job.end counters
      spark.range(1000).groupBy((org.apache.spark.sql.functions.col("id") % 7)
        .as("k")).count().collect()
      val sched = collect(daemon, 10000)(g =>
        g.exists(_.startsWith("graft.job.end")) &&
          g.exists(_.startsWith("graft.task.end")))
      assert(sched.exists(_ == "graft.job.end:1|c"), sched.toString)
      assert(sched.exists(_.startsWith("graft.task.end:1|c")))

      // streaming micro-batch progress → input rows + batch timing
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      import spark.implicits._
      implicit val sqlCtx = spark.sqlContext
      val input = MemoryStream[Long]
      input.addData(1L to 50L: _*)
      val q = input.toDF().writeStream.format("noop").start()
      q.processAllAvailable(); q.stop()
      val stream = collect(daemon, 10000)(g =>
        g.exists(_.startsWith("graft.stream.input_rows")))
      assert(stream.exists(_ == "graft.stream.input_rows:50|c"), stream.toString)
    } finally { detach(); daemon.close() }
  }
}
