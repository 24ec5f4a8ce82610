package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import graft.streaming.IngestStream
import graft.streaming.IngestStream.{Scd2Event, Scd2Row}

/** h19 — streaming SCD2 must maintain exactly the dimension c44
  * rebuilds from scratch: closed versions, open versions, no-op
  * collapse — with versions straddling micro-batch boundaries and
  * in-batch disorder, and one state row per key.
  */
class Scd2StreamSpec extends SparkTestBase {

  test("h19: streaming SCD2 equals the c44 batch rebuild on the real change log") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val changes = Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_id"), unix_millis(col("ts")).as("ms"),
        get_json_object(col("props"), "$.k").cast("int").as("attr"))
      .collect()
      .map(r => Scd2Event(r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3)))
    // batches split on GLOBAL time order (the CDC monotone-feed
    // contract); WITHIN a batch, adversarially shuffled
    val sorted = changes.sortBy(e => (e.ms, e.eventId))
    val cut1 = sorted.length / 3
    val cut2 = 2 * sorted.length / 3
    val batches = Seq(sorted.take(cut1), sorted.slice(cut1, cut2), sorted.drop(cut2))
      .map(_.sortBy(e => Integer.rotateLeft(e.eventId.hashCode, 11)).toSeq)

    val input = MemoryStream[Scd2Event]
    val q = IngestStream.streamingScd2(input.toDS())
      .writeStream.format("memory").queryName("h19_scd2")
      .outputMode(OutputMode.Update()).start()
    val (outs, stateRows) =
      try {
        batches.foreach { b => input.addData(b); q.processAllAvailable() }
        (spark.table("h19_scd2").as[Scd2Row].collect().toSeq,
          q.lastProgress.stateOperators.map(_.numRowsTotal).sum)
      } finally q.stop()

    val nKeys = changes.map(_.userId).distinct.length
    assert(stateRows == nKeys.toLong, s"state rows $stateRows != keys $nKeys")

    // upsert semantics: for each (user, version) the LAST emission
    // (closed beats open) is the dimension row
    val dim = outs.zipWithIndex
      .groupBy(o => (o._1.userId, o._1.version)).view
      .mapValues(_.maxBy(_._2)._1).values.toSeq
      .map(r => (r.userId, r.version, r.attr, r.validFromMs,
        r.validToMs.getOrElse(-1L), r.isCurrent))
      .sortBy(t => (t._1, t._2))

    val want = operators.AnalyticsExt.qScd2Dim(spark, sfDir).collect().toSeq
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3),
        if (r.isNullAt(4)) -1L else r.getLong(4), r.getBoolean(5)))
    assert(dim == want, "streaming dimension diverged from the c44 rebuild")
    // exactly one current row per key
    assert(dim.count(_._6) == nKeys)
  }
}
