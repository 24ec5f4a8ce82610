package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import graft.streaming.IngestStream
import graft.streaming.IngestStream.{LogRecord, LogRotation}

/** h42 — streaming append-blob rotation vs a33's batch accounting.
  * The batch op orders records globally by (ts, event_id); the stream
  * sorts within each batch and appends across batches in arrival
  * order (the real handler's call order) — so when batches split the
  * (ts, event_id)-sorted record stream into consecutive chunks, the
  * two views MUST agree exactly on every closed rotation, and the
  * open tails must equal the batch op's final (non-full) rotations. */
class LogRotationStreamSpec extends SparkTestBase {

  test("h42: closed rotations match a33 under order-respecting re-batchings; open tails reconcile") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val batch = operators.IngestOps.qAzlogRotation(spark, sfDir).collect()
    // the same record stream the batch op meters, in its global order
    val recs = graft.Tables.events(spark, sfDir)
      .selectExpr("user_id AS user", "event_id AS eventId",
        "unix_millis(ts) AS ms",
        """CAST(19 + 27 + length(CASE WHEN event_type = 'error' THEN 'ERROR'
             WHEN event_type = 'purchase' THEN 'INFO' ELSE 'DEBUG' END)
             + length(event_type) AS INT) AS bytes""")
      .as[LogRecord].collect().sortBy(r => (r.ms, r.eventId))

    val input = MemoryStream[LogRecord]
    val q = IngestStream.streamingLogRotation(input.toDS())
      .writeStream.format("memory").queryName("h42_rotations")
      .outputMode(OutputMode.Append()).start()
    val closed =
      try {
        // three uneven consecutive chunks of the sorted stream
        val cuts = Seq(recs.length / 5, recs.length / 2, recs.length)
        var from = 0
        cuts.foreach { to =>
          input.addData(recs.slice(from, to).toIndexedSeq); from = to
          q.processAllAvailable()
        }
        spark.table("h42_rotations").as[LogRotation].collect()
      } finally q.stop()

    val closedBatch = batch.filter(_.getAs[Boolean]("at_capacity"))
    assert(closed.nonEmpty, "rotation must close at sf0.001")
    assert(closed.length == closedBatch.length)
    val got = closed.map(r => (r.user, r.rotation) ->
      (r.nBlocks, r.nBytes, r.firstMs, r.lastMs)).toMap
    closedBatch.foreach { b =>
      val k = (b.getAs[Long]("user_id"), b.getAs[Int]("rotation"))
      assert(got.get(k).contains((b.getAs[Long]("n_blocks"),
        b.getAs[Long]("n_bytes"), b.getAs[Long]("first_ms"),
        b.getAs[Long]("last_ms"))), s"closed rotation diverged at $k")
    }
    // open tails: batch records per user minus closed blocks
    val perUser = batch.groupBy(_.getAs[Long]("user_id"))
    perUser.foreach { case (u, rs) =>
      val open = rs.filterNot(_.getAs[Boolean]("at_capacity"))
      val closedU = closed.count(_.user == u)
      assert(rs.count(_.getAs[Boolean]("at_capacity")) == closedU,
        s"user $u closed-rotation count diverged")
      assert(open.length <= 1, s"at most one open tail per blob (user $u)")
    }
  }
}
