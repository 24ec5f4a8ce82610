package graft.dev

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import scala.collection.mutable.ArrayBuffer

/** Per-Spark-stage timing of the d4 pair aggregation, to see whether
  * the cost is the map side, the shuffle, or the reduce side. */
object NgramStageTimes {
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
    val stages = ArrayBuffer[(Int, String, Long, Int)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val ms = (for {s <- si.submissionTime; c <- si.completionTime} yield c - s).getOrElse(-1L)
        stages.synchronized {
          stages += ((si.stageId, si.name.split(" ").head, ms, si.numTasks))
        }
      }
    })
    (1 to 2).foreach { round =>
      stages.synchronized(stages.clear())
      val parts = graft.operators.Dedup.ngramStages(spark, sfDir).toMap
      val t0 = System.nanoTime()
      parts("full").write.format("noop").mode("overwrite").save()
      val total = (System.nanoTime() - t0) / 1e9
      Thread.sleep(500)
      println(f"[stages] --- round $round: full total $total%.2f s ---")
      stages.synchronized(stages.toSeq).sortBy(_._1).foreach { case (id, name, ms, n) =>
        println(f"[stages] stage $id%3d $name%-24s $ms%6d ms  $n%3d tasks")
      }
    }
    spark.stop()
  }
}
