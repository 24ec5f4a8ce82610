package graft

import org.apache.spark.sql.functions._
import graft.streaming.CdcApply

/** h17 — the streaming CDC apply loop: change-feed micro-batches merge
  * into the bucketed table exactly-once across a kill/restart; a
  * replayed merge converges; partitions untouched by later batches are
  * never rewritten (mtime-pinned).
  */
class CdcStreamSpec extends SparkTestBase {

  private val nB = 8

  private def readTable(path: String): Map[Long, Long] = {
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dirs = fs.listStatus(new org.apache.hadoop.fs.Path(path))
      .filter(d => d.isDirectory && d.getPath.getName.startsWith("kb="))
      .filter(d => fs.listStatus(d.getPath).exists(_.getPath.getName.endsWith(".parquet")))
      .map(_.getPath.toString)
    if (dirs.isEmpty) Map.empty
    else dirs.map(spark.read.parquet(_)).reduce(_ unionByName _)
      .select("key", "v").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  private def fileState(path: String): Map[String, Long] = {
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) Map.empty
    else fs.listStatus(root).filter(_.isDirectory)
      .filter(_.getPath.getName.startsWith("kb="))
      .flatMap(d => fs.listStatus(d.getPath).filter(_.isFile))
      .map(f => f.getPath.toString -> f.getModificationTime).toMap
  }

  private def bucketOf(key: Long): Int = {
    import spark.implicits._
    Seq(key).toDF("key")
      .select(pmod(hash(col("key")), lit(nB)).cast("int")).collect()(0).getInt(0)
  }

  test("h17: change feed merges exactly-once across kill/restart; untouched buckets never rewrite") {
    import spark.implicits._
    val changes = java.nio.file.Files.createTempDirectory("cdc_feed").toString
    val table = java.nio.file.Files.createTempDirectory("cdc_table").toString
    val ckpt = java.nio.file.Files.createTempDirectory("cdc_ckpt").toString

    // the file source reads a FLAT directory (a nested dir would parse
    // as a partition column) — stage the single part file and move it in
    def emit(name: String, rows: Seq[(Long, Long, String)]): Unit = {
      val tmp = s"$changes/.stage-$name"
      rows.toDF("key", "v", "op").coalesce(1).write.mode("overwrite").parquet(tmp)
      val fs = new org.apache.hadoop.fs.Path(changes)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      val part = fs.listStatus(new org.apache.hadoop.fs.Path(tmp))
        .filter(_.getPath.getName.endsWith(".parquet"))(0).getPath
      fs.rename(part, new org.apache.hadoop.fs.Path(s"$changes/$name.parquet"))
      fs.delete(new org.apache.hadoop.fs.Path(tmp), true)
    }

    // batch 0: initial load; batch 1: updates + inserts
    val load = (0L until 200L).map(k => (k, k * 10, "u"))
    val b1 = (0L until 40L).map(k => (k, k * 10 + 1, "u")) ++
      (200L until 220L).map(k => (k, k * 7, "u"))
    emit("c0", load)
    emit("c1", b1)

    val q1 = CdcApply.run(spark, changes, table, nB, ckpt)
    assert(q1.awaitTermination(120000L), "run 1 did not drain")
    q1.stop()

    var want = load.map(r => r._1 -> r._2).toMap
    b1.foreach { case (k, v, _) => want += k -> v }
    assert(readTable(table) == want, "state after the first drain")

    // batch 2 arrives AFTER the kill: deletes + updates confined to
    // the buckets of keys 1 and 2
    val touched = Set(bucketOf(1L), bucketOf(2L))
    val dels = (0L until 220L).filter(k => touched(bucketOf(k))).take(15)
    val ups = (0L until 220L).filter(k => touched(bucketOf(k))).slice(15, 30)
    val b2 = dels.map(k => (k, 0L, "d")) ++ ups.map(k => (k, k + 5000, "u"))
    emit("c2", b2)

    val before = fileState(table)
    val q2 = CdcApply.run(spark, changes, table, nB, ckpt)
    assert(q2.awaitTermination(120000L), "restarted run did not drain")
    q2.stop()

    dels.foreach(k => want -= k)
    ups.foreach(k => want += k -> (k + 5000))
    assert(readTable(table) == want, "state after the restarted drain")

    // offsets resumed: batches 0/1 were NOT re-applied — every bucket
    // b2 does not touch is byte-identical (same files, same mtimes)
    val after = fileState(table)
    val untouchedBefore = before.filterNot { case (p, _) =>
      touched.exists(b => p.contains(s"kb=$b/")) }
    val untouchedAfter = after.filterNot { case (p, _) =>
      touched.exists(b => p.contains(s"kb=$b/")) }
    assert(untouchedBefore == untouchedAfter,
      "a bucket outside batch 2's key set was rewritten on restart")

    // replay convergence: re-merging batch 2 (what a crash between
    // merge and checkpoint commit would do on restart) leaves the
    // table state identical
    graft.sources.DatasetsSink.mergeInto(spark, table, nB,
      b2.toDF("key", "v", "op"))
    assert(readTable(table) == want, "replayed merge diverged")

    // and a drain with nothing new is a no-op on the files
    val stable = fileState(table)
    val q3 = CdcApply.run(spark, changes, table, nB, ckpt)
    assert(q3.awaitTermination(120000L), "idle drain did not finish")
    q3.stop()
    assert(fileState(table) == stable, "idle drain rewrote files")
  }
}
