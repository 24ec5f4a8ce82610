package graft

import org.apache.spark.sql.functions._
import graft.sources.DatasetsSink

/** i9 — the MERGE INTO executor: partition-pruned upsert/delete with
  * per-partition staged-rename commits. Untouched partitions must be
  * byte-identical afterwards; re-running the same merge must converge;
  * stale staging leftovers must be recovered past.
  */
class MergeSpec extends SparkTestBase {

  private val nB = 16

  private def bucketOf(key: Long): Int = {
    import spark.implicits._
    Seq(key).toDF("key")
      .select(pmod(hash(col("key")), lit(nB)).cast("int")).collect()(0).getInt(0)
  }

  private def readAll(path: String): Map[Long, Long] = {
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
    fs.listStatus(root).filter(_.isDirectory)
      .filter(_.getPath.getName.startsWith("kb="))
      .flatMap(d => fs.listStatus(d.getPath).filter(_.isFile))
      .map(f => f.getPath.toString -> f.getModificationTime).toMap
  }

  test("i9: merge rewrites only touched partitions, converges on re-run, survives stale staging") {
    import spark.implicits._
    val path = java.nio.file.Files.createTempDirectory("merge").toString

    // initial load IS a merge into the empty table: keys 0..999, v=10k
    val base = (0L until 1000L).map(k => (k, k * 10, "u")).toDF("key", "v", "op")
    val s0 = DatasetsSink.mergeInto(spark, path, nB, base)
    assert(s0.upserts == 1000 && s0.deletes == 0)
    var want = (0L until 1000L).map(k => k -> k * 10).toMap
    assert(readAll(path) == want)

    // a change batch confined to THREE buckets: updates, inserts,
    // deletes drawn only from keys hashing there
    val touched = Set(bucketOf(1L), bucketOf(2L), bucketOf(3L))
    def inTouched(k: Long) = touched.contains(bucketOf(k))
    val updates = (0L until 1000L).filter(inTouched).take(30).map(k => (k, k * 10 + 1, "u"))
    val inserts = (1000L until 2000L).filter(inTouched).take(20).map(k => (k, k * 7, "u"))
    val deletes = (0L until 1000L).filter(inTouched).slice(30, 55).map(k => (k, 0L, "d"))
    val batch = (updates ++ inserts ++ deletes).toDF("key", "v", "op")

    val before = fileState(path)
    val s1 = DatasetsSink.mergeInto(spark, path, nB, batch)
    assert(s1.bucketsTouched <= touched.size)
    assert(s1.upserts == (updates.size + inserts.size) && s1.deletes == deletes.size)
    want = want -- deletes.map(_._1) ++
      (updates ++ inserts).map(t => t._1 -> t._2)
    assert(readAll(path) == want, "merged content wrong")
    // untouched partitions: identical files, identical mtimes
    val after = fileState(path)
    val untouchedBefore = before.filter { case (f, _) =>
      !touched.exists(b => f.contains(s"/kb=$b/")) }
    val untouchedAfter = after.filter { case (f, _) =>
      !touched.exists(b => f.contains(s"/kb=$b/")) }
    assert(untouchedBefore == untouchedAfter,
      "untouched partitions were rewritten")

    // re-running the SAME merge converges (idempotent by content)
    val s2 = DatasetsSink.mergeInto(spark, path, nB, batch)
    assert(s2.upserts == s1.upserts && readAll(path) == want)

    // stale staging from a crashed previous run is discarded, not
    // swapped in: poison one affected bucket's staging with junk
    val b0 = touched.head
    val junk = Seq((99999L, 99999L)).toDF("key", "v")
    junk.write.parquet(s"$path/.merge_staging/kb=$b0")
    DatasetsSink.mergeInto(spark, path, nB, batch)
    assert(readAll(path) == want, "stale staging leaked into the table")
    assert(!readAll(path).contains(99999L))

    // half-done swap (live renamed away, staging complete) finishes at
    // entry: simulate by moving live to staging for one bucket
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val liveP = new org.apache.hadoop.fs.Path(s"$path/kb=$b0")
    val stagP = new org.apache.hadoop.fs.Path(s"$path/.merge_staging/kb=$b0")
    fs.mkdirs(stagP.getParent)
    assert(fs.rename(liveP, stagP))
    DatasetsSink.mergeInto(spark, path, nB, batch)
    assert(readAll(path) == want, "half-done swap not recovered")
  }

  test("i9: an all-deletes batch empties its bucket without breaking later merges") {
    import spark.implicits._
    val path = java.nio.file.Files.createTempDirectory("merge_del").toString
    val keys = (0L until 40L)
    DatasetsSink.mergeInto(spark, path, nB,
      keys.map(k => (k, k, "u")).toDF("key", "v", "op"))
    val b0 = bucketOf(0L)
    val inB0 = keys.filter(k => bucketOf(k) == b0)
    DatasetsSink.mergeInto(spark, path, nB,
      inB0.map(k => (k, 0L, "d")).toDF("key", "v", "op"))
    val want = keys.filterNot(inB0.contains).map(k => k -> k).toMap
    assert(readAll(path) == want)
    // and the emptied bucket accepts rows again
    DatasetsSink.mergeInto(spark, path, nB,
      Seq((inB0.head, 123L, "u")).toDF("key", "v", "op"))
    assert(readAll(path) == want + (inB0.head -> 123L))
  }
}
