package graft.dev

import org.apache.spark.sql.SparkSession

/** dev tool: d28's amortization argument, measured. The standalone
  * bench number for q_dedup_tuned pays the full plan+band+verify
  * pair-graph build every run; the production path pays the banding
  * ONCE into the d10/i7 signature index (now parameterized by the
  * SAME tunedBanding decision) and every subsequent screen reads the
  * persisted keys. This main times, per corpus dir: the standalone
  * tuned pipeline, the one-off index build, and the WARM served
  * screen (min-of-2 after the build) — the per-consumer cost a
  * production run actually pays.
  *
  *   runMain graft.dev.TunedAmortBench /tmp/gen_docs_01 /tmp/gen_docs_100
  */
object TunedAmortBench {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("/tmp/gen_docs_01", "/tmp/gen_docs_100")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    dirs.foreach { dir =>
      graft.operators.Dedup.clearShared()
      val standalone = time {
        graft.operators.Dedup.qDedupTuned(spark, dir)
          .write.format("noop").mode("overwrite").save()
      }
      graft.operators.Dedup.clearShared()
      var ix: String = null
      val build = time { ix = graft.operators.Serving.dedupIndexDir(spark, dir) }
      val warm = (1 to 2).map { _ =>
        time {
          graft.operators.Serving.qDedupServed(spark, dir)
            .write.format("noop").mode("overwrite").save()
        }
      }.min
      println(f"[tunedamort] $dir standalone_tuned=$standalone%.2f " +
        f"index_build=$build%.2f warm_served_min2=$warm%.2f (ix=$ix)")
    }
    spark.stop()
  }
}
