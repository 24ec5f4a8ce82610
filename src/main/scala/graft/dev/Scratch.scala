package graft.dev

import org.apache.spark.sql.SparkSession

/** dev tool: ad-hoc checks (not part of the library). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val rows = graft.SparkEntry.entry(spark).collect()
    println(s"entry rows: ${rows.length}")
    println(rows.take(2).mkString("\n"))
    spark.stop()
  }
}
