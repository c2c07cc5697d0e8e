package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger
import graft.operators.Router
import graft.sinks.RestBatcher
import graft.sources.Tables
import graft.streaming.StreamingPipeline

/** The reference's FULL router delivery loop composed end to end
  * (router.go JobsRequestWorker): events → deterministic micro-batch
  * assignment → `{"payload":[...]}` envelope bodies → POST (stubbed —
  * the egress socket is the one externalized seam) → response acks →
  * Router.ackLedger → retry / dead-letter / waiting queue views. The
  * same ack stream also replays through ackLedgerStream and the final
  * per-batch states must MATCH the batch ledger row for row — the
  * batch/streaming twins are one state machine, not two. */
class DeliveryLoopSpec extends SparkSpec {
  import spark.implicits._

  test("envelope → POST-stub → acks → ledger → queue views, batch and streaming agree") {
    val ev = Tables.events(spark, sf)
    val env = Router.batchSummary(ev, "event_type", "event_id", size = 25)
      .localCheckpoint(eager = true)
    val envRows = env.collect().map(r => (r.getString(0), r.getLong(1),
      r.getLong(2), r.getLong(3)))
    assert(envRows.nonEmpty)

    // the POST bodies the egress layer would send — one per envelope,
    // with exactly n_in_batch events serialized into the payload array
    val bodies = RestBatcher.envelopes(ev, "event_type", "event_id", size = 25)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getString(2)).toMap
    assert(bodies.keySet == envRows.map(r => (r._1, r._2)).toSet,
      "every micro-batch gets exactly one POST body")
    envRows.foreach { case (dest, bid, n, firstId) =>
      val body = bodies((dest, bid))
      assert(body.startsWith("""{"payload":["""))
      assert("\"event_id\"".r.findAllIn(body).size == n,
        s"$dest/$bid: body must carry all $n events")
    }

    // POST-stub: the destination's response log, deterministic per
    // batch (first_id decides the scenario — every ledger path covered)
    val acks = envRows.flatMap { case (dest, bid, _, firstId) =>
      val t = (bid + 1) * 10000L
      def ack(a: Long, code: Long) = (dest, bid, a, code, t + a * 1000L)
      ((firstId % 10).toInt) match {
        case m if m <= 2 => // immediate 2xx; m==0 also gets a LATE 503
          // after the terminal 200 — must not reopen the batch
          if (m == 0) Seq(ack(1, 200), ack(2, 503)) else Seq(ack(1, 200))
        case 3 => Seq.empty // no response yet → waiting
        case 4 => Seq(ack(1, 400)) // non-retryable → aborted
        case 5 | 6 => Seq(ack(1, 503), ack(2, 200)) // recovered retry
        case 7 | 8 => Seq(ack(1, 503), ack(2, 503)) // in backoff
        case _ => Seq(ack(1, 503), ack(2, 503), ack(3, 503)) // ceiling
      }
    }
    val ackDf = acks.toSeq.toDF("event_type", "batch_id", "attempt", "code", "ack_ms")

    val ledger = Router.ackLedger(env, ackDf, Seq("event_type", "batch_id"),
        "attempt", "code", "ack_ms", maxRetry = 3, baseBackoffMs = 1000L)
      .localCheckpoint(eager = true)
    val got = ledger.collect().map { r =>
      (r.getAs[String]("event_type"), r.getAs[Long]("batch_id")) ->
        ((r.getAs[Long]("n_attempts"), r.getAs[String]("state"),
          Option(r.getAs[java.lang.Long]("next_retry_ms")).map(_.toLong)))
    }.toMap

    // driver-side oracle: expected ledger row per scenario
    envRows.foreach { case (dest, bid, _, firstId) =>
      val t = (bid + 1) * 10000L
      val expected = ((firstId % 10).toInt) match {
        case m if m <= 2 => (1L, "succeeded", None)
        case 3 => (0L, "waiting", None)
        case 4 => (1L, "aborted", None)
        case 5 | 6 => (2L, "succeeded", None)
        case 7 | 8 => (2L, "waiting_retry", Some(t + 2000L + 1000L * 2L))
        case _ => (3L, "aborted", None)
      }
      assert(got((dest, bid)) == expected, s"$dest/$bid (first_id=$firstId)")
    }

    // queue views over the ledger — what JobsRequestWorker polls
    val retryQueue = ledger.filter(col("state") === "waiting_retry")
    val deadLetter = ledger.filter(col("state") === "aborted")
    val waiting = ledger.filter(col("state") === "waiting")
    def keys(df: org.apache.spark.sql.DataFrame) =
      df.select("event_type", "batch_id").collect()
        .map(r => (r.getString(0), r.getLong(1))).toSet
    def expectKeys(p: Long => Boolean) =
      envRows.filter(r => p(r._4 % 10)).map(r => (r._1, r._2)).toSet
    assert(keys(retryQueue) == expectKeys(m => m == 7 || m == 8))
    assert(keys(deadLetter) == expectKeys(m => m == 4 || m == 9))
    assert(keys(waiting) == expectKeys(m => m == 3))
    // a scheduled retry always has a future timestamp beyond its ack
    assert(retryQueue.filter(col("next_retry_ms") <= col("last_ack_ms")).count() == 0)

    // streaming twin over the SAME response log: final per-batch state
    // must equal the batch ledger (acked batches only — an envelope
    // with no acks never enters the stream)
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, Long, Long, Long, Long)]
    input.addData(acks.toSeq)
    val out = StreamingPipeline.ackLedgerStream(
      input.toDF().toDF("dest", "batch_id", "attempt", "code", "ack_ms"),
      maxRetry = 3, baseBackoffMs = 1000L)
    val query = out.writeStream.format("memory").queryName("delivery_loop")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    query.processAllAvailable()
    query.stop()
    val streamFinal = spark.table("delivery_loop")
      .groupBy("dest", "batch_id")
      .agg(max(struct(col("n_attempts"), col("state"), col("next_retry_ms")))
        .as("f"))
      .collect().map { r =>
        (r.getString(0), r.getLong(1)) ->
          ((r.getAs[org.apache.spark.sql.Row]("f").getLong(0),
            r.getAs[org.apache.spark.sql.Row]("f").getString(1),
            r.getAs[org.apache.spark.sql.Row]("f").getLong(2)))
      }.toMap
    val ackedKeys = acks.map(a => (a._1, a._2)).toSet
    assert(streamFinal.keySet == ackedKeys)
    ackedKeys.foreach { k =>
      val (bn, bs, bnext) = got(k)
      val (sn, ss, snext) = streamFinal(k)
      assert(sn == bn && ss == bs && snext == bnext.getOrElse(-1L),
        s"$k: batch=(${got(k)}) stream=(${streamFinal(k)})")
    }
  }
}
