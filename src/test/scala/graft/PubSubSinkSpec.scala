package graft

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.Row
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.unsafe.types.UTF8String

import graft.sources.{PubSubBatchWrite, PubSubSink, PubSubStreamingWrite}

/** i5 — the V2 pub/sub progress sink's commit protocol: staged task
  * files, manifest-gated visibility, loser-attempt invisibility,
  * exactly-once epoch replay.
  */
class PubSubSinkSpec extends SparkTestBase {

  private val schema = PubSubSink.progressSchema

  private def progressRow(u: String, stage: String, p: Int): InternalRow =
    new GenericInternalRow(Array[Any](
      UTF8String.fromString(u),
      UTF8String.fromString(s"https://acct/userdata/$u/raw/f.tif"),
      UTF8String.fromString(stage), p))

  private def tmpLeftovers(dir: String): Seq[String] = {
    val t = Paths.get(dir, ".tmp")
    if (!Files.exists(t)) Seq.empty
    else Files.list(t).iterator().asScala.map(_.getFileName.toString).toSeq
  }

  test("batch write publishes through a manifest and reads back exactly") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_pubsub_batch").toString
    val df = (0 until 100).map(i =>
        (s"user${i % 7}", s"https://acct/u/raw/f$i.tif", "processing", i % 101))
      .toDF("user", "url", "stage", "progress")
    df.write.format("graft-pubsub").mode("append").save(dir)

    val manifests = Files.list(Paths.get(dir)).iterator().asScala
      .map(_.getFileName.toString).filter(_.startsWith("_graft_manifest")).toSeq
    assert(manifests.size == 1, s"one job manifest expected, got $manifests")
    assert(tmpLeftovers(dir).isEmpty, "staging dir must be drained after commit")

    val back = PubSubSink.readPublished(spark, dir, schema)
    assert(back.count() == 100)
    assert(back.collect().toSet == df.collect().toSet)
  }

  test("a loser task attempt that aborts can never surface rows") {
    val dir = Files.createTempDirectory("graft_pubsub_retry").toString
    val bw = new PubSubBatchWrite(dir, schema, "qretry")
    val factory = bw.createBatchWriterFactory(null)
    // two attempts of partition 0 race (speculation / retry)
    val loser = factory.createWriter(0, 0L)
    val winner = factory.createWriter(0, 1L)
    loser.write(progressRow("u1", "downloaded", 30))
    winner.write(progressRow("u1", "downloaded", 30))
    val winnerMsg = winner.commit()
    loser.abort() // Spark always aborts the attempt whose commit lost
    bw.commit(Array(winnerMsg))

    assert(tmpLeftovers(dir).isEmpty, "loser's staged file must be deleted")
    val back = PubSubSink.readPublished(spark, dir, schema)
    assert(back.count() == 1, "exactly the winner's row is visible")
  }

  test("job abort leaves zero visible rows") {
    val dir = Files.createTempDirectory("graft_pubsub_abort").toString
    val bw = new PubSubBatchWrite(dir, schema, "qabort")
    val factory = bw.createBatchWriterFactory(null)
    val w = factory.createWriter(0, 0L)
    w.write(progressRow("u2", "processing", 55))
    val msg = w.commit()
    bw.abort(Array(msg)) // driver-side job failure after task success
    assert(tmpLeftovers(dir).isEmpty)
    assert(PubSubSink.readPublished(spark, dir, schema).count() == 0)
    assert(!Files.list(Paths.get(dir)).iterator().asScala
      .exists(_.getFileName.toString.startsWith("_graft_manifest")))
  }

  test("replaying a committed epoch is exactly-once (manifest is the idempotence key)") {
    val dir = Files.createTempDirectory("graft_pubsub_epoch").toString
    val sw = new PubSubStreamingWrite(dir, schema, "query-A")
    val factory = sw.createStreamingWriterFactory(null)

    val w1 = factory.createWriter(0, 0L, 5L)
    w1.write(progressRow("u3", "processed", 100))
    sw.commit(5L, Array(w1.commit()))
    assert(PubSubSink.readPublished(spark, dir, schema).count() == 1)

    // micro-batch retry replays epoch 5 end-to-end (at-least-once
    // upstream): the second commit must discard, not duplicate
    val w2 = factory.createWriter(0, 7L, 5L)
    w2.write(progressRow("u3", "processed", 100))
    sw.commit(5L, Array(w2.commit()))
    assert(PubSubSink.readPublished(spark, dir, schema).count() == 1,
      "epoch 5 republished rows must be discarded")
    assert(tmpLeftovers(dir).isEmpty)

    // a DIFFERENT query reusing the same epoch number (second writer on
    // the path, or a restart from a fresh checkpoint where epochs start
    // over at 0) is NOT a replay — its commit must publish, not discard
    val swB = new PubSubStreamingWrite(dir, schema, "query-B")
    val w3 = swB.createStreamingWriterFactory(null).createWriter(0, 9L, 5L)
    w3.write(progressRow("u4", "downloaded", 30))
    swB.commit(5L, Array(w3.commit()))
    assert(PubSubSink.readPublished(spark, dir, schema).count() == 2,
      "a different query's epoch 5 must not be mistaken for a replay")
    assert(tmpLeftovers(dir).isEmpty)
  }

  test("writeStream end-to-end: every input row published exactly once across epochs") {
    import spark.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = Files.createTempDirectory("graft_pubsub_stream").toString
    val ckpt = Files.createTempDirectory("graft_pubsub_ckpt").toString
    val input = MemoryStream[(String, String, String, Int)]
    val q = input.toDF().toDF("user", "url", "stage", "progress")
      .writeStream.format("graft-pubsub")
      .option("checkpointLocation", ckpt)
      .start(dir)
    try {
      input.addData(("u1", "url1", "downloaded", 30))
      q.processAllAvailable()
      input.addData(("u1", "url1", "processing", 65), ("u2", "url2", "downloaded", 30))
      q.processAllAvailable()
    } finally q.stop()

    val back = PubSubSink.readPublished(spark, dir, schema)
    assert(back.count() == 3)
    assert(back.where("stage = 'processing'").count() == 1)
    assert(tmpLeftovers(dir).isEmpty)
  }

  test("unsupported payload types fail at plan time, not mid-task") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_pubsub_badtype").toString
    val df = Seq((1, Seq("a"))).toDF("id", "arr")
    val e = intercept[Exception] {
      df.write.format("graft-pubsub").mode("append").save(dir)
    }
    assert(e.getMessage != null)
  }
}
