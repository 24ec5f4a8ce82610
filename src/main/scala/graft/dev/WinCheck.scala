package graft.dev

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.window.WindowExec

/** dev tool: count WindowExec nodes visible to executedPlan.collect
  * for a few window-heavy queries — validates the PlanAuditSpec
  * traversal actually sees windows under AQE. */
object WinCheck {
  def main(args: Array[String]): Unit = {
    val sfDir = "/root/testdata/sf0.001"
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Seq("q_window_rank", "q_median", "q3_topk", "q_stage_latency").foreach { n =>
      val plan = graft.SparkEntry.queries(n)(spark, sfDir).queryExecution.executedPlan
      val all = plan.collect { case w: WindowExec => w }
      val unpart = all.filter(_.partitionSpec.isEmpty)
      println(s"$n: windows=${all.size} unpartitioned=${unpart.size}")
    }
    spark.stop()
  }
}
