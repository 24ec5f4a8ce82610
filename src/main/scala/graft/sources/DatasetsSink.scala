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

  /** Read back one partition (one user's datasets) — partition pruning
    * keeps this O(selected data). */
  def readUser(spark: org.apache.spark.sql.SparkSession, path: String,
      userId: Long): DataFrame =
    spark.read.parquet(path).where(org.apache.spark.sql.functions.col("user_id") === userId)
}
