package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import graft.streaming.IngestStream
import graft.streaming.IngestStream.{ParaOcc, ParaVerdict}

/** h35 — the streaming paragraph-dedup guard must converge to EXACTLY
  * d25's batch keep-first on the same corpus under an in-order feed
  * (any batching), and stay exactly-once under any feed order. */
class ParaStreamSpec extends SparkTestBase {

  private def occs() = {
    import org.apache.spark.sql.functions._
    operators.CorpusClean.paragraphOccurrences(
      Tables(spark, sfDir, "documents").select(col("doc_id"), col("text")))
      .collect()
      .map(r => ParaOcc(r.getAs[Long]("doc_id"),
        r.getAs[Long]("packed") % 4294967296L, r.getAs[String]("h"), r.getAs[Long]("pw")))
  }

  test("h35: in-order feed equals the d25 batch keep-first, any batching") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ordered = occs().sortBy(p => p.docId * 4294967296L + p.idx)
    // order-preserving adversarial splits (uneven, mid-document cuts)
    val batches = Seq(ordered.take(317), ordered.slice(317, 1000),
      ordered.slice(1000, 1001), ordered.drop(1001))
    val input = MemoryStream[ParaOcc]
    val q = IngestStream.streamingParagraphGuard(input.toDS())
      .writeStream.format("memory").queryName("h35_para")
      .outputMode(OutputMode.Append()).start()
    val (outs, stateRows) =
      try {
        batches.foreach { b => input.addData(b.toSeq); q.processAllAvailable() }
        (spark.table("h35_para").as[ParaVerdict].collect().toSeq,
          q.lastProgress.stateOperators.map(_.numRowsTotal).sum)
      } finally q.stop()

    assert(outs.length == ordered.length, "every occurrence gets a verdict")
    assert(stateRows == ordered.map(_.h).distinct.length.toLong,
      "state = one row per distinct paragraph")

    val got = outs.groupBy(_.docId).view
      .mapValues(vs => (vs.count(_.kept).toLong, vs.size.toLong)).toMap
    val want = operators.CorpusClean.qDedupParagraph(spark, sfDir).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("kept_para"), r.getAs[Long]("n_para"))).toMap
    assert(got.keySet == want.keySet)
    want.foreach { case (d, w) =>
      assert(got(d) == w, s"doc $d diverged: stream ${got(d)} batch $w")
    }
    // the admitted OCCURRENCE is the batch min-packed one, not just the count
    val keptSet = outs.filter(_.kept).map(p => (p.h, p.docId * 4294967296L + p.idx)).toMap
    val minPacked = ordered.groupBy(_.h).view
      .mapValues(_.map(p => p.docId * 4294967296L + p.idx).min).toMap
    assert(keptSet == minPacked.toMap)
  }

  test("h35: exactly-once per paragraph under ANY feed order") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val shuffled = occs().sortBy(p => Integer.rotateLeft((p.docId * 31 + p.idx).toInt, 13))
    val batches = Seq(shuffled.take(900), shuffled.drop(900))
    val input = MemoryStream[ParaOcc]
    val q = IngestStream.streamingParagraphGuard(input.toDS())
      .writeStream.format("memory").queryName("h35_para_shuffled")
      .outputMode(OutputMode.Append()).start()
    val outs =
      try {
        batches.foreach { b => input.addData(b.toSeq); q.processAllAvailable() }
        spark.table("h35_para_shuffled").as[ParaVerdict].collect().toSeq
      } finally q.stop()
    // keep-first under arrival order: exactly one admit per distinct key
    val byKey = outs.groupBy(_.h).view.mapValues(_.count(_.kept)).toMap
    assert(byKey.values.forall(_ == 1), "some paragraph admitted != once")
    assert(byKey.keySet == shuffled.map(_.h).toSet)
  }

  test("h35: admitted occurrence is selected by key, not iterator position") {
    // One batch fed in REVERSE packed order — the stand-in for the
    // nondeterministic shuffle-fetch interleaving a multi-partition
    // run produces (same-key group-iterator order is NOT guaranteed).
    // A head-of-iterator admit would crown the MAX-packed occurrence
    // here; the guard must still admit the min-packed one per key.
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val reversed = occs().sortBy(p => -(p.docId * 4294967296L + p.idx))
    val input = MemoryStream[ParaOcc]
    val q = IngestStream.streamingParagraphGuard(input.toDS())
      .writeStream.format("memory").queryName("h35_para_rev")
      .outputMode(OutputMode.Append()).start()
    val outs =
      try {
        input.addData(reversed.toSeq)
        q.processAllAvailable()
        spark.table("h35_para_rev").as[ParaVerdict].collect().toSeq
      } finally q.stop()
    val keptSet = outs.filter(_.kept).map(p => (p.h, p.docId * 4294967296L + p.idx)).toMap
    val minPacked = reversed.groupBy(_.h).view
      .mapValues(_.map(p => p.docId * 4294967296L + p.idx).min).toMap
    assert(keptSet == minPacked.toMap,
      "admitted occurrence must be the min-packed one under a reversed feed")
  }
}
