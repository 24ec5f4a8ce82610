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

  /** [[writeOptimized]] + partitioning: the serving-index layout
    * (IVF cells, dedup signature shards). Partition pruning bounds a
    * probe to one directory; the in-partition sort + bloom filters
    * then bound it to a few pages — at 100 TB a query touches
    * 1/nlist of the index, not the index. */
  def writeIndexed(df: DataFrame, path: String, partitionCols: Seq[String],
      sortCols: Seq[String], bloomCols: Seq[String]): Unit = {
    import org.apache.spark.sql.functions.col
    var w = df.sortWithinPartitions((partitionCols ++ sortCols).map(col): _*)
      .write.mode(SaveMode.Overwrite)
      .option("compression", "zstd")
    bloomCols.foreach(c => w = w.option(s"parquet.bloom.filter.enabled#$c", "true"))
    w.partitionBy(partitionCols: _*).parquet(path)
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

  /** i6 — schema-evolution-tolerant read: a long-lived lake
    * accumulates parquet batches whose schemas DRIFT — columns appear
    * in later eras, early eras wrote narrower integers, dead columns
    * linger in old files. The Spark-native answer is to push the
    * table's CANONICAL schema straight into the scan: era files
    * missing a column read it as typed nulls (parquet missing-column
    * semantics, never a schema error), era files with a narrower
    * type widen inside the vectorized reader (Spark 4 type-widening
    * promotions: int → long etc.), and columns the canonical schema
    * dropped are never even read. Contrast with `mergeSchema`, which
    * (a) runs a footer-reading job over the whole lake before the
    * query starts and (b) hard-fails on exactly the INT→BIGINT drift
    * evolution produces. This is a single pruned, filter-pushed scan
    * with no metadata pre-pass — at 100 TB, the only acceptable
    * shape. */
  def readEvolved(spark: org.apache.spark.sql.SparkSession, path: String,
      canonical: org.apache.spark.sql.types.StructType): DataFrame =
    spark.read.schema(canonical).parquet(path)
}
