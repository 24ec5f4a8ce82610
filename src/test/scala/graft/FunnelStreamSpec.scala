package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import graft.streaming.IngestStream
import graft.streaming.IngestStream.{FunnelEvent, FunnelUpdate}

/** h15 — the streaming funnel must agree with the c45 batch funnel on
  * the REAL events table, carry state across micro-batches, and hold
  * exactly one state row per seen user.
  */
class FunnelStreamSpec extends SparkTestBase {

  test("h15: stream/batch funnel parity on the events table, bounded per-user state") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    // the full event log, in event-time order, split into 3 batches at
    // time boundaries (cross-batch per-key order preserved — the queue
    // contract); funnels WILL straddle batch boundaries
    val all = Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_id"),
        unix_millis(col("ts")).as("ms"), col("event_type"))
      .collect()
      .map(r => FunnelEvent(r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .sortBy(e => (e.tMs, e.eventId))
    val cut1 = all(all.length / 3).tMs
    val cut2 = all(2 * all.length / 3).tMs
    val batches = Seq(
      all.filter(_.tMs <= cut1),
      all.filter(e => e.tMs > cut1 && e.tMs <= cut2),
      all.filter(_.tMs > cut2))
    assert(batches.forall(_.nonEmpty))

    val input = MemoryStream[FunnelEvent]
    val q = IngestStream.streamingFunnel(input.toDS())
      .writeStream.format("memory").queryName("h15_funnel")
      .outputMode(OutputMode.Append()).start()
    val (updates, stateRows) =
      try {
        batches.foreach { b => input.addData(b.toSeq); q.processAllAvailable() }
        (spark.table("h15_funnel").as[FunnelUpdate].collect().toSeq,
          q.lastProgress.stateOperators.map(_.numRowsTotal).sum)
      } finally q.stop()

    // ONE state row per seen user — regardless of event volume
    val seenUsers = all.map(_.userId).distinct.length
    assert(stateRows == seenUsers.toLong,
      s"state rows $stateRows != users $seenUsers")

    // at most one update per (user, stage); stages advance 1→2→3
    val byUser = updates.groupBy(_.userId)
    byUser.foreach { case (u, us) =>
      val stages = us.map(_.stage).sorted
      assert(stages == (1 to stages.length), s"user $u emitted $stages")
    }

    // parity with the batch funnel (c45) on the same data
    val batch = graft.operators.AnalyticsExt.qFunnel(spark, sfDir).collect()
      .map(r => r.getLong(0) -> ((r.getInt(1),
        (2 to 4).map(i => if (r.isNullAt(i)) None else Some(r.getLong(i)))))).toMap
    assert(batch.size == seenUsers)
    batch.foreach { case (u, (stage, ts)) =>
      val us = byUser.getOrElse(u, Seq.empty)
      assert(us.length == stage, s"user $u: stream reached ${us.length}, batch $stage")
      // each advance carries the exact stage timestamp of the batch op
      us.sortBy(_.stage).zipWithIndex.foreach { case (upd, i) =>
        assert(ts(i).contains(upd.tMs),
          s"user $u stage ${i + 1}: stream t=${upd.tMs} batch t=${ts(i)}")
      }
    }
  }

  test("h15: a funnel straddling batches advances only when the order rule allows") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[FunnelEvent]
    val q = IngestStream.streamingFunnel(input.toDS())
      .writeStream.format("memory").queryName("h15_edge")
      .outputMode(OutputMode.Append()).start()
    try {
      // batch 1: click BEFORE any view (must not count), then the view;
      // same-ms click with LOWER event id than the view (row-order
      // strictly-before ⇒ must not count)
      input.addData(Seq(
        FunnelEvent(7L, 1L, 100L, "click"),
        FunnelEvent(7L, 3L, 200L, "view"),
        FunnelEvent(7L, 2L, 200L, "click")))
      q.processAllAvailable()
      // batch 2: same-ms click with HIGHER id (counts), purchase after
      input.addData(Seq(
        FunnelEvent(7L, 4L, 200L, "click"),
        FunnelEvent(7L, 5L, 300L, "purchase")))
      q.processAllAvailable()
      val got = spark.table("h15_edge").as[FunnelUpdate].collect()
        .sortBy(_.stage).map(u => (u.stage, u.tMs)).toSeq
      assert(got == Seq((1, 200L), (2, 200L), (3, 300L)), s"got $got")
    } finally q.stop()
  }
}
