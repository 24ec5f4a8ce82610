package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode}

/** Output layout mirroring the reference's blob store convention:
  * `datasets/<user>/<dataset>/…` (ref utils.get_dst_blob_path — results
  * land under the user's datasets folder). On Spark that convention is
  * a partitioned parquet layout: partition pruning then serves
  * "one user's datasets" queries without touching the other 99.999%
  * of 100 TB, exactly like per-user blob prefixes do for the
  * reference.
  */
object DatasetsSink {

  /** Write `df` partitioned by the given user/dataset columns.
    * maxRecordsPerFile bounds file sizes the way the reference's
    * chunked uploads bound blob parts. */
  def writePartitioned(df: DataFrame, path: String,
      partitionCols: Seq[String] = Seq("user_id"),
      maxRecordsPerFile: Long = 5000000L): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy(partitionCols: _*)
      .parquet(path)

  /** Scan-optimized write: zstd compression (the reference's COG
    * profile compresses with ZSTD too — config.py gdal_configs),
    * sortWithinPartitions clusters rows so min/max page stats prune
    * aggressively, and parquet bloom filters serve point lookups on
    * high-cardinality key columns that dictionary stats can't. At
    * 100 TB this is the difference between "scan the partition" and
    * "read three pages of it". */
  def writeOptimized(df: DataFrame, path: String,
      sortCols: Seq[String], bloomCols: Seq[String]): Unit = {
    import org.apache.spark.sql.functions.col
    var w = df.sortWithinPartitions(sortCols.map(col): _*)
      .write.mode(SaveMode.Overwrite)
      .option("compression", "zstd")
    bloomCols.foreach(c => w = w.option(s"parquet.bloom.filter.enabled#$c", "true"))
    w.parquet(path)
  }

  /** Idempotent micro-batch landing for foreachBatch sinks: plain
    * `mode(append)` duplicates rows when a failed micro-batch is
    * retried (foreachBatch is at-least-once), so each batch instead
    * OVERWRITES its own `batch_id=<id>` subdirectory — a retry
    * replaces itself and the union of subdirectories is exactly-once.
    * The layout stays a normal partitioned parquet table (batch_id is
    * a partition column on read), which is how production Spark
    * pipelines get transactional micro-batch output without a table
    * format. */
  def writeBatchIdempotent(batch: DataFrame, batchId: Long, path: String): Unit =
    batch.write.mode(SaveMode.Overwrite).parquet(s"$path/batch_id=$batchId")

  /** Read back one partition (one user's datasets) — partition pruning
    * keeps this O(selected data). */
  def readUser(spark: org.apache.spark.sql.SparkSession, path: String,
      userId: Long): DataFrame =
    spark.read.parquet(path).where(org.apache.spark.sql.functions.col("user_id") === userId)
}
