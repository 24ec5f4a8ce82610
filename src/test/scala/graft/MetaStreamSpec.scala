package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import graft.streaming.IngestStream
import graft.streaming.IngestStream.{MetaView, MetaWrite}

/** h40 — the lease-serialized streaming metadata merge must converge
  * to EXACTLY a29's per-key last-writer-wins columns on the same
  * write log, under any batching — including a straggler delivered a
  * batch late. */
class MetaStreamSpec extends SparkTestBase {

  private def writes(): Array[MetaWrite] = {
    import org.apache.spark.sql.functions._
    import graft.functions.Synth
    Tables.events(spark, sfDir).select(
        Synth.userUrl(col("user_id")).as("asset"),
        expr("""CASE CAST(event_id % 4 AS INT) WHEN 0 THEN 'stage'
                WHEN 1 THEN 'tiles' WHEN 2 THEN 'bbox'
                ELSE 'license' END""").as("key"),
        unix_millis(col("ts")).as("ms"), col("event_id"),
        (col("event_id") % 5).cast("int").as("writer"))
      .collect().map(r => MetaWrite(r.getString(0), r.getString(1),
        r.getLong(2), r.getLong(3), r.getInt(4)))
  }

  private def finalState(outs: Seq[MetaView]): Map[(String, String), (Long, Long, Int)] =
    outs.groupBy(v => (v.asset, v.key)).view
      .mapValues(vs => vs.maxBy(v => (v.ms, v.eventId)))
      .mapValues(v => (v.ms, v.eventId, v.writer)).toMap

  private def lww(): Map[(String, String), (Long, Long, Int)] =
    operators.IngestOps.qMetaMerge(spark, sfDir).collect()
      .map(r => (r.getAs[String]("asset"), r.getAs[String]("key")) ->
        (r.getAs[Long]("lww_ms"), r.getAs[Long]("lww_event"),
          r.getAs[Int]("lww_writer"))).toMap

  test("h40: serialized merge converges to a29's lww columns, any batching") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ws = writes().sortBy(w => (w.ms, w.eventId))
    val batches = Seq(ws.take(313), ws.slice(313, 314), ws.drop(314))
    val input = MemoryStream[MetaWrite]
    val q = IngestStream.streamingMetaMerge(input.toDS())
      .writeStream.format("memory").queryName("h40_meta")
      .outputMode(OutputMode.Update()).start()
    val (outs, stateRows) =
      try {
        batches.foreach { b => input.addData(b.toSeq); q.processAllAvailable() }
        (spark.table("h40_meta").as[MetaView].collect().toSeq,
          q.lastProgress.stateOperators.map(_.numRowsTotal).sum)
      } finally q.stop()
    assert(finalState(outs) == lww(), "streamed dict != a29 lww")
    assert(stateRows == ws.map(_.asset).distinct.length.toLong,
      "state = one dict per asset")
  }

  test("h40: a cross-batch straggler older than the key's winner is a no-op") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ws = writes().sortBy(w => (w.ms, w.eventId))
    // deliver the globally OLDEST write last, alone in its own batch —
    // the serialized merge must not regress any key
    val straggler = ws.head
    val batches = Seq(ws.tail, Array(straggler))
    val input = MemoryStream[MetaWrite]
    val q = IngestStream.streamingMetaMerge(input.toDS())
      .writeStream.format("memory").queryName("h40_meta_straggler")
      .outputMode(OutputMode.Update()).start()
    val outs =
      try {
        batches.foreach { b => input.addData(b.toSeq); q.processAllAvailable() }
        spark.table("h40_meta_straggler").as[MetaView].collect().toSeq
      } finally q.stop()
    assert(finalState(outs) == lww(),
      "a stale straggler must not displace a newer winner")
  }
}
