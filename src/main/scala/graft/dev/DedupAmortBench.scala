package graft.dev

import org.apache.spark.sql.SparkSession

/** dev tool: the AMORTIZED dedup path at scale — the number the
  * standalone bench convention hides. The driver bench evicts the
  * shared pair-graph memo before every timed run, so d21/d22's
  * standalone 100x numbers (90.98 s / 106.6 s, bench_extra_r14) are
  * dominated by REBUILDING the verified pair graph each time; the
  * production path builds it once per corpus snapshot (or reads it
  * persisted via d10/i7's signature index) and every report/ablation/
  * capstone consumer reads the memoized table. This main measures
  * both sides on the same corpus: the one-off graph build, then
  * d17/d21/d22 warm (memo present — the amortized cost a production
  * run pays per consumer), min-of-2.
  *
  *   runMain graft.dev.DedupAmortBench /tmp/gen_docs_01 /tmp/gen_docs_100
  */
object DedupAmortBench {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("/tmp/gen_docs_01", "/tmp/gen_docs_100")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val queries = Seq("q_dedup_e2e", "q_dedup_report", "q_dedup_sweep")
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    val out = dirs.map { dir =>
      graft.operators.Dedup.clearShared()
      // one-off: force the shared pair graph (what production persists)
      val build = time {
        graft.operators.Dedup.minhashPairs(spark, dir).count()
      }
      val warm = queries.map { q =>
        val fn = graft.SparkEntry.queries(q)
        val t = (1 to 2).map(_ => time {
          fn(spark, dir).write.format("noop").mode("overwrite").save()
        }).min
        s""""$q":$t"""
      }.mkString(",")
      s""""$dir":{"pair_graph_build":$build,$warm}"""
    }.mkString(",")
    println(s"""{"metric":"dedup_amortized","dirs":{$out}}""")
    spark.stop()
  }
}
