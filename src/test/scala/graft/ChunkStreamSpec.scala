package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import graft.streaming.IngestStream
import graft.streaming.IngestStream.{ChunkMsg, ChunkOut}

/** h37 — mid-transform cooperative cancellation: a cancel arriving
  * MID-ASSET must mask the asset's remaining chunk outputs (same
  * micro-batch AND later ones), the abort verdict must freeze progress
  * at the last completed chunk with a5's exact formula, and the output
  * set must be batching-invariant and survive a kill/restart. */
class ChunkStreamSpec extends SparkTestBase {

  // asset plans: (url, nchunks, cancel-after-chunk index or -1)
  private def msgs: Seq[ChunkMsg] = {
    val plans = Seq(("asset-a", 5, 2), ("asset-b", 3, -1), ("asset-c", 4, 0),
      ("asset-d", 5, -1), ("asset-e", 2, 1))
    plans.flatMap { case (url, n, cancelAfter) =>
      val chunks = (0 until n).map(i => ChunkMsg(url, "chunk", i, n, 1000L * (i + 1)))
      if (cancelAfter < 0) chunks
      // the cancel fires between chunk `cancelAfter` and the next one
      else chunks :+ ChunkMsg(url, "cancel", -1, n, 1000L * (cancelAfter + 1) + 500L)
    }
  }

  private def run(batches: Seq[Seq[ChunkMsg]]): Seq[ChunkOut] = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[ChunkMsg]
    val name = s"h37_${System.nanoTime()}"
    val q = IngestStream.streamingChunkAbort(input.toDS())
      .writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Append()).start()
    try {
      batches.foreach { b => input.addData(b); q.processAllAvailable() }
      spark.table(name).as[ChunkOut].collect().toSeq
    } finally q.stop()
  }

  test("h37: a mid-asset cancel masks the remaining chunks of the SAME micro-batch; accounting and a5 progress exact") {
    // everything in ONE batch: the abort must take effect inside it
    val outs = run(Seq(msgs))
    val byUrl = outs.groupBy(_.url)
    // asset-a: 5 chunks, cancel after chunk 2 → chunks 0,1,2 emitted,
    // 3,4 masked, one cancelled row frozen at chunk 2's progress
    val a = byUrl("asset-a").sortBy(o => (o.kind, o.idx))
    assert(a.count(_.kind == "chunk") == 3, s"asset-a chunks: $a")
    assert(a.map(_.idx).filter(_ >= 3).isEmpty || a.filter(_.kind == "chunk").forall(_.idx <= 2),
      s"masked chunk leaked: $a")
    val ac = a.filter(_.kind == "cancelled")
    assert(ac.length == 1 && ac.head.idx == 2 && ac.head.nMasked == 2, s"asset-a abort row: $ac")
    // a5's formula: n=5 → chunk i<4: 30 + 14*(i+1)
    assert(a.filter(_.kind == "chunk").map(o => o.idx -> o.progress).toMap ==
      Map(0 -> 44, 1 -> 58, 2 -> 72))
    assert(ac.head.progress == 72, "abort must freeze at the last completed chunk")
    // asset-c: cancel after chunk 0 → 1 chunk out, 3 masked
    val c = byUrl("asset-c")
    assert(c.count(_.kind == "chunk") == 1 && c.count(_.kind == "cancelled") == 1)
    assert(c.find(_.kind == "cancelled").get.nMasked == 3)
    // asset-b (no cancel): runs to completion, last chunk hits 100
    val b = byUrl("asset-b")
    assert(b.forall(_.kind == "chunk") && b.length == 3)
    assert(b.maxBy(_.idx).progress == 100)
    // chunk progress composes a5: equal to qProgressPlan's values for
    // the same (nchunks, i) — the plan and the live transform agree
    val plan = operators.IngestOps.qProgressPlan(spark, sfDir).collect()
      .map(r => (r.getInt(1), r.getInt(2)) -> r.getInt(3)).toMap
    outs.filter(_.kind == "chunk").foreach { o =>
      val n = msgs.find(m => m.url == o.url).get.nchunks
      plan.get((n, o.idx)).foreach { want =>
        assert(o.progress == want, s"${o.url} chunk ${o.idx}: ${o.progress} != a5 $want")
      }
    }
  }

  test("h37: output set is identical under any batching (cancel and victims split across batches)") {
    val all = msgs
    val one = run(Seq(all)).toSet
    // split so asset-a's cancel lands one batch BEFORE its chunks 3,4
    // and asset-e's cancel lands in the batch AFTER its second chunk
    val byTime = all.sortBy(m => (m.eventTimeMs, m.url))
    val split = Seq(byTime.take(6), byTime.slice(6, 11), byTime.drop(11))
    val three = run(split).toSet
    assert(one == three, s"batching changed the output:\n$one\nvs\n$three")
  }

  test("h37: tombstone survives a kill/restart — post-kill chunks of a cancelled asset stay masked") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ckpt = java.nio.file.Files.createTempDirectory("h37_ckpt").toString
    val out = java.nio.file.Files.createTempDirectory("h37_out").toString
    val input = MemoryStream[ChunkMsg]
    def start() = IngestStream.streamingChunkAbort(input.toDS())
      .writeStream
      .option("checkpointLocation", ckpt)
      .outputMode(OutputMode.Append())
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[ChunkOut], _: Long) =>
        batch.write.mode("append").parquet(out)
      }
      .start()
    // batch 1: chunks 0,1 then the cancel; kill; batch 2: chunks 2,3,4
    val n = 5
    val pre = Seq(ChunkMsg("asset-k", "chunk", 0, n, 1000L),
      ChunkMsg("asset-k", "chunk", 1, n, 2000L),
      ChunkMsg("asset-k", "cancel", -1, n, 2500L))
    val post = (2 until n).map(i => ChunkMsg("asset-k", "chunk", i, n, 1000L * (i + 1)))
    val q1 = start()
    try { input.addData(pre); q1.processAllAvailable() } finally q1.stop()
    val q2 = start()
    try { input.addData(post); q2.processAllAvailable() } finally q2.stop()
    val got = spark.read.parquet(out).as[ChunkOut].collect().toSeq
    assert(got.count(_.kind == "chunk") == 2,
      s"post-kill chunks of the cancelled asset leaked: $got")
    assert(got.count(_.kind == "cancelled") == 1)
    assert(got.find(_.kind == "cancelled").get.nMasked == 3)
  }
}
