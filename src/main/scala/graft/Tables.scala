package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver's parquet tables (TESTDATA.md). All operators
  * take `dir` = scale-factor directory and read only what they need so
  * Catalyst can prune columns/filters down to the parquet scan.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** events.parquet carries TIMESTAMP(NANOS), which Spark's parquet
    * reader only accepts as a raw long (`legacy.parquet.nanosAsLong`,
    * set in Verify/Bench/test sessions). Normalize to a microsecond
    * TimestampType column so downstream operators are oblivious.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.LongType
    val raw = apply(spark, dir, "events")
    raw.schema("ts").dataType match {
      // integer div — a double division would lose precision on epoch-ns
      case LongType => raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _        => raw
    }
  }
}
