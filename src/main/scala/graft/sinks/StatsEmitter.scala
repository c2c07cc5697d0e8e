package graft.sinks

import java.net.{DatagramPacket, DatagramSocket, InetSocketAddress}
import java.nio.charset.StandardCharsets
import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener

/** Engine-runtime metrics emission — the reference's stats service
  * (services/stats.go: a metrics sink the gateway and router feed
  * counters like source.success / dest.failure into; gateway.go:209,
  * router.go:392-394). The reference pushes to an in-memory
  * go-metrics sink; the wire-protocol twin of that design is statsd
  * datagrams, and Spark's own idiom for runtime counters is a
  * SparkListener — so this composes both:
  *
  *  - [[Client]] is the counter surface the pipeline code calls
  *    (count/gauge/timing → `prefix.name:value|type` statsd lines
  *    over UDP, fire-and-forget like the reference's Increment);
  *  - [[attach]] wires a SparkListener + StreamingQueryListener that
  *    push the ENGINE's own runtime counters (tasks, stage shuffle
  *    volumes, job ends, micro-batch rates) through the same client —
  *    the counters a fleet dashboard actually graphs.
  *
  * Emission is driver-side only and O(scheduler events), never
  * O(rows): no listener touches data, so the metrics path adds zero
  * load to the query plan at any scale. Lines follow the statsd text
  * protocol, so any statsd-compatible daemon (or a test's UDP socket)
  * can receive them.
  */
object StatsEmitter {

  /** Minimal statsd UDP client (fire-and-forget; a lost datagram is a
    * lost sample, exactly the protocol's contract). Thread-safe: a
    * DatagramSocket send is atomic per packet. */
  final class Client(host: String, port: Int, prefix: String) extends AutoCloseable {
    private val socket = new DatagramSocket()
    private val target = new InetSocketAddress(host, port)
    val dropped = new AtomicLong(0L)

    private def send(line: String): Unit =
      try {
        val bytes = line.getBytes(StandardCharsets.UTF_8)
        socket.send(new DatagramPacket(bytes, bytes.length, target))
      } catch { case _: Exception => dropped.incrementAndGet() }

    def count(name: String, n: Long = 1L): Unit = send(s"$prefix.$name:$n|c")
    def gauge(name: String, v: Double): Unit = send(s"$prefix.$name:$v|g")
    def timing(name: String, ms: Long): Unit = send(s"$prefix.$name:$ms|ms")
    override def close(): Unit = socket.close()
  }

  /** Attach runtime emission to a session: scheduler counters (task
    * count + time, shuffle bytes, records read/written, job ends) and
    * streaming micro-batch progress (input rows, processed rows/sec,
    * batch duration) flow to `host:port` as they happen. Returns the
    * client plus a detach handle. */
  def attach(spark: SparkSession, host: String, port: Int,
             prefix: String = "graft"): (Client, () => Unit) = {
    val client = new Client(host, port, prefix)
    val taskListener = new SparkListener {
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
        client.count("task.end")
        if (e.taskInfo != null && e.taskInfo.successful)
          client.timing("task.duration_ms", e.taskInfo.duration)
        val m = e.taskMetrics
        if (m != null) {
          if (m.inputMetrics != null)
            client.count("records.read", m.inputMetrics.recordsRead)
          if (m.shuffleWriteMetrics != null && m.shuffleWriteMetrics.bytesWritten > 0)
            client.count("shuffle.bytes_written", m.shuffleWriteMetrics.bytesWritten)
        }
      }
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit =
        client.count("stage.complete")
      override def onJobEnd(e: SparkListenerJobEnd): Unit =
        client.count("job.end")
    }
    val streamListener = new StreamingQueryListener {
      override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit =
        client.count("stream.start")
      override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
        client.count("stream.input_rows", e.progress.numInputRows)
        client.gauge("stream.rows_per_sec", e.progress.processedRowsPerSecond)
        val d = e.progress.durationMs
        if (d != null && d.containsKey("triggerExecution"))
          client.timing("stream.batch_ms", d.get("triggerExecution"))
      }
      override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit =
        client.count("stream.stop")
    }
    spark.sparkContext.addSparkListener(taskListener)
    spark.streams.addListener(streamListener)
    val detach = () => {
      spark.sparkContext.removeSparkListener(taskListener)
      spark.streams.removeListener(streamListener)
      client.close()
    }
    (client, detach)
  }
}
