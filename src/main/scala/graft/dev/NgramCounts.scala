package graft.dev

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off volume probe for the d4 pipeline: how many index rows,
  * posting lists, exploded pairs, distinct pairs, survivors. */
object NgramCounts {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val stages = graft.operators.Dedup.ngramStages(spark, sfDir).toMap
    val inv0 = stages("inv0")
    val posting = stages("posting")
    println(s"[counts] inv0 rows        = ${inv0.count()}")
    println(s"[counts] distinct sids    = ${inv0.select("sid").distinct().count()}")
    println(s"[counts] posting lists>=2 = ${posting.count()}")
    val pairVol = posting.select(
      sum(expr("size(ds) * (size(ds) - 1) / 2")).as("pairs"),
      max(expr("size(ds)")).as("max_df")).collect()(0)
    println(s"[counts] exploded pairs   = ${pairVol.get(0)}  max_df = ${pairVol.get(1)}")
    val cand = stages("cand")
    println(s"[counts] pairs shared>=6  = ${cand.count()}")
    println(s"[counts] final rows       = ${stages("full").count()}")
    spark.stop()
  }
}
