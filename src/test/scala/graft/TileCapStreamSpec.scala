package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import graft.streaming.IngestStream
import graft.streaming.IngestStream.{TileCapOut, TileFeature}

/** h32 — the streaming per-tile cap must converge to EXACTLY b46's
  * batch survivors on the same events (the packed drop-key order is
  * prefix-stable), with one fixed-size state row per touched tile. */
class TileCapStreamSpec extends SparkTestBase {

  test("h32: streaming tile cap equals the b46 batch drop, any batching") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val all = operators.GeoOps.tiled(spark, sfDir, 6)
      .select("event_id", "xt", "yt").collect()
      .map(r => TileFeature(r.getLong(0), r.getInt(1), r.getInt(2)))
    // adversarial batching: deterministic shuffle, uneven splits
    val mixed = all.sortBy(f => Integer.rotateLeft(f.eventId.hashCode, 11))
    val batches = Seq(mixed.take(700), mixed.slice(700, 1100), mixed.drop(1100))

    val input = MemoryStream[TileFeature]
    val q = IngestStream.streamingTileCap(input.toDS(), 100)
      .writeStream.format("memory").queryName("h32_cap")
      .outputMode(OutputMode.Update()).start()
    val (outs, stateRows) =
      try {
        batches.foreach { b => input.addData(b.toSeq); q.processAllAvailable() }
        (spark.table("h32_cap").as[TileCapOut].collect().toSeq,
          q.lastProgress.stateOperators.map(_.numRowsTotal).sum)
      } finally q.stop()

    val tiles = all.map(f => (f.xt, f.yt)).distinct
    assert(stateRows == tiles.length.toLong,
      s"state rows $stateRows != touched tiles ${tiles.length}")

    // final roster per tile (highest version wins)
    val got = outs.groupBy(o => (o.xt, o.yt)).view
      .mapValues { os => val last = os.maxBy(_.version); (last.kept.toLong, last.keptChecksum) }
      .toMap
    // batch truth: b46 at the same sf
    val want = operators.GeoRaster.qTileDrop(spark, sfDir).collect()
      .map(r => (r.getAs[Int]("xt"), r.getAs[Int]("yt")) ->
        (r.getAs[Long]("kept"), r.getAs[Long]("kept_checksum"))).toMap
    assert(got.keySet == want.keySet)
    want.foreach { case (t, w) =>
      assert(got(t) == w, s"tile $t diverged: stream ${got(t)} batch $w")
    }
    // rosters never exceed the cap mid-stream either
    assert(outs.forall(_.kept <= 100))
  }

  test("h32: rosters survive a kill/restart — restored state still converges to the batch drop") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val all = operators.GeoOps.tiled(spark, sfDir, 6)
      .select("event_id", "xt", "yt").collect()
      .map(r => TileFeature(r.getLong(0), r.getInt(1), r.getInt(2)))
    val mixed = all.sortBy(f => Integer.rotateLeft(f.eventId.hashCode, 3))
    val ckpt = java.nio.file.Files.createTempDirectory("h32_ckpt").toString
    val out = java.nio.file.Files.createTempDirectory("h32_out").toString
    val input = MemoryStream[TileFeature]
    def start() = IngestStream.streamingTileCap(input.toDS(), 100)
      .writeStream
      .option("checkpointLocation", ckpt)
      .outputMode(OutputMode.Update())
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[TileCapOut], _: Long) =>
        batch.write.mode("append").parquet(out)
      }
      .start()
    val q1 = start()
    try { input.addData(mixed.take(900).toSeq); q1.processAllAvailable() }
    finally q1.stop() // kill: rosters live only in the checkpoint now
    val q2 = start()
    try { input.addData(mixed.drop(900).toSeq); q2.processAllAvailable() }
    finally q2.stop()
    val got = spark.read.parquet(out).as[TileCapOut].collect()
      .groupBy(o => (o.xt, o.yt)).view
      .mapValues { os => val l = os.maxBy(_.version); (l.kept.toLong, l.keptChecksum) }
      .toMap
    val want = operators.GeoRaster.qTileDrop(spark, sfDir).collect()
      .map(r => (r.getAs[Int]("xt"), r.getAs[Int]("yt")) ->
        (r.getAs[Long]("kept"), r.getAs[Long]("kept_checksum"))).toMap
    assert(got.keySet == want.keySet)
    // only a RESTORED roster can still equal the whole-stream batch
    // answer: a state-lost restart would rebuild tiles from the last
    // 10% of features alone and lose every pre-kill survivor
    want.foreach { case (t, w) =>
      assert(got(t) == w, s"tile $t diverged across restart: ${got(t)} vs $w")
    }
  }
}
