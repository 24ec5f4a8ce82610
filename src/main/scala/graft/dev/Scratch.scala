package graft.dev

import org.apache.spark.sql.SparkSession

/** dev tool: ad-hoc timing of subplans (not part of the library). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    graft.Tables(spark, sfDir, "documents").count()
    (1 to 2).foreach { i =>
      time(s"simhash64 #$i") {
        graft.operators.Dedup.simhash64(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
      }
      time(s"full q_simhash_near #$i") {
        graft.operators.Dedup.qSimhashNear(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
      }
    }
    spark.stop()
  }
}
