package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import graft.streaming.IngestStream
import graft.streaming.IngestStream.{AttemptEvent, MsgVerdict}

/** h41 — the streaming redelivery monitor's terminal verdicts must
  * roll up to EXACTLY a31's delivery-count table on the same message
  * population, under any batching; post-terminal echoes are no-ops. */
class RedeliveryStreamSpec extends SparkTestBase {

  /** the a31 closed form rendered as an attempt stream: message m with
    * attempts_raw = ceil(proc/300) gets min(raw, 5) attempts, the last
    * acked iff raw ≤ 5 (raw > 5 dead-letters at the 5th failure). */
  private def attempts(): Array[AttemptEvent] = {
    import org.apache.spark.sql.functions._
    Tables.events(spark, sfDir).select(col("event_id")).collect()
      .map(_.getLong(0)).flatMap { id =>
        val raw = (id * 37 % 3600 + 60 + 299) / 300
        val k = math.min(raw, 5L)
        (1L to k).map(s => AttemptEvent(id, s, s == k && raw <= 5L))
      }
  }

  test("h41: terminal verdicts roll up to a31's table, any batching; echoes are no-ops") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val evs = attempts().sortBy(e => (e.seq, e.msgId)) // attempts interleave across messages
    val batches = Seq(evs.take(1000), evs.slice(1000, 1001), evs.drop(1001))
    val input = MemoryStream[AttemptEvent]
    val q = IngestStream.streamingRedelivery(input.toDS())
      .writeStream.format("memory").queryName("h41_redeliver")
      .outputMode(OutputMode.Append()).start()
    val outs =
      try {
        batches.foreach { b => input.addData(b.toSeq); q.processAllAvailable() }
        // post-terminal ECHO: redeliver an already-dead-lettered
        // message's attempt — must produce no second verdict
        val dead = spark.table("h41_redeliver").as[MsgVerdict].collect()
          .find(_.outcome == "deadletter")
        dead.foreach { d =>
          input.addData(Seq(AttemptEvent(d.msgId, 99L, false)))
          q.processAllAvailable()
        }
        spark.table("h41_redeliver").as[MsgVerdict].collect().toSeq
      } finally q.stop()
    assert(outs.map(_.msgId).distinct.length == outs.length,
      "a message must verdict exactly once (echoes included)")
    // bucket rollup == a31
    val got = outs.groupBy(_.deliveries).view.mapValues { vs =>
      (vs.size.toLong, vs.count(_.outcome == "deadletter").toLong)
    }.toMap
    val want = operators.IngestOps.qRedelivery(spark, sfDir).collect()
      .map(r => r.getAs[Long]("deliveries") ->
        (r.getAs[Long]("messages"), r.getAs[Long]("deadlettered"))).toMap
    assert(got == want, s"stream rollup $got != a31 $want")
  }
}
