package graft

import graft.sources.{IngestQueueSource, PubSubSink}
import graft.streaming.ServiceLoop

/** The composed i1 → h1 → i5 job: the reference's whole service loop
  * (main.py receiver → ingest_message → progress publishing) as ONE
  * restartable streaming query. The individual pieces have their own
  * specs; this one proves the COMPOSITION — queue offsets, state-store
  * contents, and sink epoch manifests surviving a mid-asset kill
  * together, with published progress equal to an uninterrupted run's.
  */
class ServiceLoopSpec extends SparkTestBase {

  private def published(dir: String): Seq[(String, String, String, Int)] =
    PubSubSink.readPublished(spark, dir, PubSubSink.progressSchema)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getInt(3)))
      .toSeq.sorted

  test("service loop: kill mid-asset, restart from checkpoint, publishes equal the uninterrupted run") {
    // the whole composition runs on the PRODUCTION state store: state
    // restore across the kill/restart below exercises RocksDB
    // checkpoint recovery, not just the in-memory default (h12's
    // store-agnosticism proof lifted to the composed job)
    val storeKey = "spark.sql.streaming.stateStore.providerClass"
    val savedStore = spark.conf.getOption(storeKey)
    spark.conf.set(storeKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try serviceLoopScenario()
    finally savedStore match {
      case Some(v) => spark.conf.set(storeKey, v)
      case None => spark.conf.unset(storeKey)
    }
  }

  private def serviceLoopScenario(): Unit = {
    val pub = java.nio.file.Files.createTempDirectory("graft_svc_pub").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_svc_ckpt").toString

    // run 1 drains a 110-message backlog in 60-message triggers: the
    // "kill" lands inside asset 27's quadruple (ids 108..111), BETWEEN
    // its two out-of-order processing chunks — chunk@76 consumed,
    // stale chunk@53 and the terminal chunk still on the queue
    val q1 = ServiceLoop.run(spark, 110, 60, pub, ckpt)
    assert(q1.awaitTermination(180000L), "run 1 did not drain")
    q1.stop()
    val url27 = IngestQueueSource.blobUrl(108)
    val mid = published(pub)
    // 27 complete assets x 3 visible transitions + asset 27's first two
    assert(mid.size == 27 * 3 + 2, s"mid-kill publish count ${mid.size}")
    assert(mid.filter(_._2 == url27).map(t => (t._3, t._4)).sorted ==
      Seq(("downloaded", 30), ("processing", 76)),
      "asset 27 must be mid-flight at the kill")

    // run 2: the queue has grown to 200; SAME checkpoint — offsets
    // resume at 110, asset 27's state machine resumes at processing/76
    val q2 = ServiceLoop.run(spark, 200, 60, pub, ckpt)
    assert(q2.awaitTermination(180000L), "run 2 did not drain")
    // the restarted run must actually be on RocksDB, not silently
    // defaulted — its state restore is the point of the scenario
    val stateOps = q2.lastProgress.stateOperators
    assert(stateOps.nonEmpty && stateOps(0).customMetrics.containsKey("rocksdbFilesCopied"),
      s"RocksDB store not engaged in the restarted run: ${
        if (stateOps.isEmpty) "no state ops" else stateOps(0).customMetrics}")
    q2.stop()

    // uninterrupted twin: fresh checkpoint + fresh pub/sub path
    val pubU = java.nio.file.Files.createTempDirectory("graft_svc_pub_u").toString
    val ckptU = java.nio.file.Files.createTempDirectory("graft_svc_ckpt_u").toString
    val q3 = ServiceLoop.run(spark, 200, 60, pubU, ckptU)
    assert(q3.awaitTermination(180000L), "uninterrupted run did not drain")
    q3.stop()

    val got = published(pub)
    val want = published(pubU)
    // 50 assets x 3 transitions (the stale out-of-order chunk never
    // surfaces): exactly-once across the kill — no lost message, no
    // replayed epoch, no duplicate publish
    assert(want.size == 50 * 3, s"uninterrupted run published ${want.size}")
    assert(got == want,
      s"interrupted+restarted publishes diverge from the uninterrupted run (${got.size} vs ${want.size})")
    assert(got.distinct.size == got.size, "duplicate publishes across the restart")
    // the regression behind the kill was rejected by RESTORED state: a
    // fresh state machine would have published processing@53 for asset
    // 27 in run 2 (its chunk@76 was consumed before the kill)
    assert(!got.exists(t => t._2 == url27 && t._4 == 53),
      "stale chunk published — state was not restored across the restart")
  }
}
