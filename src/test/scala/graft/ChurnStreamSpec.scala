package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import graft.streaming.IngestStream
import graft.streaming.IngestStream.{Delivery, GroupEvent}

/** h39 — the streaming group-membership churn must converge to EXACTLY
  * a30's [join, leave) window algebra on the same corpus under an
  * event-time-ordered feed, under any batching. */
class ChurnStreamSpec extends SparkTestBase {

  private def feed(): (Array[GroupEvent], Map[Long, (Long, Long, Long)]) = {
    import org.apache.spark.sql.functions._
    val msgs = Tables.events(spark, sfDir)
      .select(col("user_id"), unix_millis(col("ts")).as("ms")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val minMs = msgs.map(_._2).min
    val subs = Tables(spark, sfDir, "customer")
      .select(col("c_custkey")).collect().map(_.getLong(0))
      .map { ck =>
        val join = minMs + (ck * 7919L) % 1296000000L
        (ck, ck % 1500L, join, join + 432000000L + (ck * 104729L) % 1296000000L)
      }
    val watched = msgs.map(_._1).toSet
    val evs =
      subs.filter(s => watched.contains(s._2)).flatMap { case (id, wu, j, l) =>
        Seq(GroupEvent("join", id, wu, j), GroupEvent("leave", id, wu, l))
      } ++ msgs.map { case (wu, ms) => GroupEvent("msg", -1L, wu, ms) }
    // expected per sub from the BATCH op (n_delivered, first, last)
    val want = operators.IngestOps.qPubsubMembership(spark, sfDir).collect()
      .map(r => r.getAs[Long]("sub_id") ->
        (r.getAs[Long]("n_delivered"), r.getAs[Long]("first_ms"),
          r.getAs[Long]("last_ms"))).toMap
    (evs.sortBy(e => (e.ms, e.kind match {
      case "join" => 0; case "leave" => 1; case _ => 2
    }, e.subId)), want)
  }

  test("h39: event-time feed equals a30's window algebra, any batching") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val (evs, want) = feed()
    val batches = Seq(evs.take(700), evs.slice(700, 701), evs.drop(701))
    val input = MemoryStream[GroupEvent]
    val q = IngestStream.streamingGroupChurn(input.toDS())
      .writeStream.format("memory").queryName("h39_churn")
      .outputMode(OutputMode.Append()).start()
    val outs =
      try {
        batches.foreach { b => input.addData(b.toSeq); q.processAllAvailable() }
        spark.table("h39_churn").as[Delivery].collect().toSeq
      } finally q.stop()
    val got = outs.groupBy(_.subId).view
      .mapValues(ds => (ds.size.toLong, ds.map(_.ms).min, ds.map(_.ms).max))
      .toMap
    // every subscriber the batch op says received something must match
    // count/first/last exactly; zero-delivery subscribers must be absent
    want.foreach { case (sub, (n, first, last)) =>
      if (n == 0L) assert(!got.contains(sub), s"sub $sub delivered but batch says 0")
      else assert(got.get(sub).contains((n, first, last)),
        s"sub $sub: stream ${got.get(sub)} != batch ($n, $first, $last)")
    }
    // and the stream must not deliver to subscribers the batch op
    // never saw (no watched messages at all → absent from `want`)
    assert(got.keySet.subsetOf(want.keySet))
  }

  test("h39: mid-batch ordering — a message at the join instant delivers, at the leave instant does not") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val evs = Seq(
      GroupEvent("msg", -1L, 9L, 100L),  // before join: dropped
      GroupEvent("join", 5L, 9L, 200L),
      GroupEvent("msg", -1L, 9L, 200L),  // AT join ms: delivered
      GroupEvent("msg", -1L, 9L, 300L),  // inside: delivered
      GroupEvent("leave", 5L, 9L, 400L),
      GroupEvent("msg", -1L, 9L, 400L),  // AT leave ms: dropped
      GroupEvent("msg", -1L, 9L, 500L))  // after: dropped
    val input = MemoryStream[GroupEvent]
    val q = IngestStream.streamingGroupChurn(input.toDS())
      .writeStream.format("memory").queryName("h39_edge")
      .outputMode(OutputMode.Append()).start()
    val outs =
      try {
        input.addData(evs); q.processAllAvailable()
        spark.table("h39_edge").as[Delivery].collect().toSeq
      } finally q.stop()
    assert(outs.map(_.ms).sorted == Seq(200L, 300L),
      s"[join, leave) boundary semantics violated: $outs")
  }

  test("h39: a malformed kind cannot kill the stream — it ranks and folds as a message (r15 ADVICE)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val evs = Seq(
      GroupEvent("join", 10L, 1L, 100L),
      GroupEvent("JOIN?", -1L, 1L, 150L), // unknown kind mid-stream
      GroupEvent("msg", -1L, 1L, 200L),
      GroupEvent("leave", 10L, 1L, 300L))
    val input = MemoryStream[GroupEvent]
    val q = IngestStream.streamingGroupChurn(input.toDS())
      .writeStream.format("memory").queryName("h39_malformed")
      .outputMode(OutputMode.Append()).start()
    val outs =
      try {
        // pre-fix this batch threw NoSuchElementException inside the
        // sort key and failed the WHOLE query; now the unknown kind
        // sorts after join/leave at its instant and delivers like a
        // message to the open roster
        input.addData(evs); q.processAllAvailable()
        spark.table("h39_malformed").as[Delivery].collect().toSeq
      } finally q.stop()
    assert(outs.map(_.ms).sorted == Seq(150L, 200L),
      s"unknown kind must deliver as a message, got $outs")
    assert(outs.forall(d => d.subId == 10L && d.watchUser == 1L))
  }
}
