package graft.dev

import org.apache.spark.sql.SparkSession

/** Stage-by-stage timing probe for the d4 n-gram Jaccard pipeline —
  * dev tool for deciding where the next optimization goes. */
object NgramProbe {
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
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $label%-18s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    (1 to 2).foreach { round =>
      println(s"[probe] --- round $round ---")
      val parts = graft.operators.Dedup.ngramStages(spark, sfDir)
      parts.foreach { case (label, df) =>
        time(label)(df.write.format("noop").mode("overwrite").save())
      }
    }
    spark.stop()
  }
}
