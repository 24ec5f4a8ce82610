package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import graft.streaming.IngestStream
import graft.streaming.IngestStream.{DocVerdict, SourceCard}

/** h36 — the streaming per-source data card must converge to EXACTLY
  * f49's batch card on the same corpus, under any batching (every
  * counter is a monotone mergeable fold). */
class CardStreamSpec extends SparkTestBase {

  test("h36: streaming source cards equal the f49 batch card, any batching") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    implicit val sqlCtx = spark.sqlContext

    // per-doc verdicts off the REGISTERED f46/f47 operators + doc words
    val d = Tables(spark, sfDir, "documents")
      .select(col("doc_id"), col("source"),
        expr("CAST(size(split(text, ' ')) AS BIGINT)").as("words"))
    val g = operators.CorpusClean.qGopherRules(spark, sfDir).select("doc_id", "pass")
    val c = operators.CorpusClean.qC4Filters(spark, sfDir).select("doc_id", "doc_kept")
    val verdicts = d.join(g, "doc_id").join(c, "doc_id").collect()
      .map(r => DocVerdict(r.getAs[Long]("doc_id"), r.getAs[String]("source"),
        r.getAs[Long]("words"), r.getAs[Boolean]("pass"), r.getAs[Boolean]("doc_kept")))

    // adversarial batching: shuffled, uneven splits
    val mixed = verdicts.sortBy(v => Integer.rotateLeft(v.docId.hashCode, 7))
    val batches = Seq(mixed.take(123), mixed.slice(123, 380), mixed.drop(380))

    val input = MemoryStream[DocVerdict]
    val q = IngestStream.streamingSourceCards(input.toDS())
      .writeStream.format("memory").queryName("h36_cards")
      .outputMode(OutputMode.Update()).start()
    val (outs, stateRows) =
      try {
        batches.foreach { b => input.addData(b.toSeq); q.processAllAvailable() }
        (spark.table("h36_cards").as[SourceCard].collect().toSeq,
          q.lastProgress.stateOperators.map(_.numRowsTotal).sum)
      } finally q.stop()

    assert(stateRows == verdicts.map(_.source).distinct.length.toLong,
      "state = one row per source")
    // final card per source (highest version wins)
    val got = outs.groupBy(_.source).view.mapValues(_.maxBy(_.version)).toMap

    val want = operators.CorpusClean.qDataCard(spark, sfDir).collect()
      .map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("docs"), r.getAs[Long]("words"),
          r.getAs[Long]("gopher_pass_ppm"), r.getAs[Long]("c4_keep_ppm"))).toMap
    assert(got.keySet == want.keySet)
    want.foreach { case (src, (docs, words, gp, ck)) =>
      val o = got(src)
      assert((o.docs, o.words, o.gopherPassPpm, o.c4KeepPpm) == (docs, words, gp, ck),
        s"source $src diverged: stream $o batch ($docs,$words,$gp,$ck)")
    }
    // monotone growth: per source, docs never decrease across versions
    outs.groupBy(_.source).foreach { case (_, vs) =>
      vs.sortBy(_.version).map(_.docs).sliding(2).foreach {
        case Seq(a, b) => assert(b >= a); case _ => ()
      }
    }
  }
}
