package graft

import graft.sources.VersionedTable
import graft.streaming.VersionedIngest

/** h43 — streaming append into the versioned table through i30's txn
  * commits: one clean version per micro-batch, exactly-once across a
  * restart, and the crash-window replay (re-running the batch commit
  * the checkpoint never acknowledged) is a no-op.
  */
class VersionedIngestSpec extends SparkTestBase {

  test("h43: one version per micro-batch, restart resumes, crash-window replay is a no-op, history stays consumable") {
    import spark.implicits._
    val src = java.nio.file.Files.createTempDirectory("vingest_src").toString
    val table = java.nio.file.Files.createTempDirectory("vingest_tbl").toString
    val ckpt = java.nio.file.Files.createTempDirectory("vingest_ck").toString

    // flat-directory file source: stage the single part file, move in
    def emit(name: String, rows: Seq[(Long, String)]): Unit = {
      val tmp = s"$src/.stage-$name"
      rows.toDF("id", "v").coalesce(1).write.mode("overwrite").parquet(tmp)
      val fs = new org.apache.hadoop.fs.Path(src)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      val part = fs.listStatus(new org.apache.hadoop.fs.Path(tmp))
        .filter(_.getPath.getName.endsWith(".parquet"))(0).getPath
      fs.rename(part, new org.apache.hadoop.fs.Path(s"$src/$name.parquet"))
      fs.delete(new org.apache.hadoop.fs.Path(tmp), true)
    }
    def ids(ver: Option[Long] = None): Set[Long] =
      VersionedTable.read(spark, table, ver)
        .select("id").collect().map(_.getLong(0)).toSet

    val b0 = (1L to 100L).map(i => (i, s"r$i"))
    val b1 = (101L to 150L).map(i => (i, s"r$i"))
    emit("e0", b0); emit("e1", b1)
    val q1 = VersionedIngest.run(spark, src, table, ckpt)
    assert(q1.awaitTermination(120000L), "run 1 did not drain"); q1.stop()

    // one clean version per micro-batch; time travel sees each era
    assert(VersionedTable.versions(spark, table) == Seq(1L, 2L))
    assert(ids(Some(1L)) == b0.map(_._1).toSet)
    assert(ids() == (b0 ++ b1).map(_._1).toSet)

    // restart with new data: resumes after the last committed batch
    val b2 = (151L to 170L).map(i => (i, s"r$i"))
    emit("e2", b2)
    val q2 = VersionedIngest.run(spark, src, table, ckpt)
    assert(q2.awaitTermination(120000L), "restart did not drain"); q2.stop()
    assert(VersionedTable.versions(spark, table) == Seq(1L, 2L, 3L))
    assert(ids() == (b0 ++ b1 ++ b2).map(_._1).toSet)

    // the crash window: the table commit for batch 2 succeeded but the
    // checkpoint offset never landed — a restart re-runs the SAME
    // batch id. Simulate by re-invoking the batch commit directly.
    val replay = VersionedTable.commitTxn(spark, table,
      b2.toDF("id", "v"), "stream-ingest", 2L)
    assert(replay.isEmpty, "a replayed micro-batch must be a no-op")
    assert(VersionedTable.versions(spark, table) == Seq(1L, 2L, 3L))
    assert(ids().size == 170, "replay must not duplicate rows")

    // the live table stays change-consumable: drain sees exactly one
    // delta per micro-batch version, summing to the table
    val drained = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    val ck2 = java.nio.file.Files.createTempDirectory("vingest_dr").toString
    VersionedTable.drainChanges(spark, table, ck2) { (delta, v) =>
      drained += v -> delta.count()
    }
    assert(drained.toSeq == Seq(1L -> 100L, 2L -> 50L, 3L -> 20L))

    // an idle restart commits nothing
    val q3 = VersionedIngest.run(spark, src, table, ckpt)
    assert(q3.awaitTermination(120000L), "idle drain did not finish"); q3.stop()
    assert(VersionedTable.versions(spark, table) == Seq(1L, 2L, 3L))
  }
}
