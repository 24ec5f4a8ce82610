package graft.dev

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.TextFns._

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
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    val d = graft.Tables(spark, sfDir, "documents")
    d.count()
    val inv0 = d.select(col("doc_id"), expr(shSpark).as("sh"))
      .select(col("doc_id"), explode(col("sh")).as("shingle"))
    time("inv0 (shingle explode)")(noop(inv0))
    time("inv0 again")(noop(inv0))
    val drop = inv0.groupBy("shingle").agg(count(lit(1)).as("df"))
      .filter(col("df") > 50).select("shingle")
    time("drop agg")(noop(drop))
    val inv = inv0.join(broadcast(drop), Seq("shingle"), "left_anti")
    time("inv anti-join")(noop(inv))
    val invC = inv.localCheckpoint(false)
    time("checkpoint materialize")(invC.count())
    val cand = invC.as("x").join(invC.as("y"),
        col("x.shingle") === col("y.shingle") && col("x.doc_id") < col("y.doc_id"))
      .groupBy(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("shared")).filter(col("shared") >= 6)
    time("cand join+agg")(noop(cand))
    time("full q_ngram_jaccard")(noop(graft.operators.Dedup.qNgramJaccard(spark, sfDir)))
    time("full again")(noop(graft.operators.Dedup.qNgramJaccard(spark, sfDir)))
    spark.stop()
  }
}
