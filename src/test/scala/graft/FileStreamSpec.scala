package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** End-to-end Structured Streaming over a file source: the reference's
  * queue is a stream of small messages; on Spark the same flow is a
  * file/Kafka stream feeding the stage pipeline. This spec drives the
  * parquet file source (schema-locked, as a real deployment must be)
  * through a windowed aggregation to a memory sink.
  */
class FileStreamSpec extends SparkTestBase {

  test("file-source stream: windowed event counts reach the sink") {
    val src = Files.createTempDirectory("graft_stream_src").toString
    // stage two micro-files like queue drains
    import spark.implicits._
    val batch1 = Seq((1L, "2024-01-01 00:10:00", "view"), (2L, "2024-01-01 00:20:00", "click"))
    val batch2 = Seq((3L, "2024-01-01 01:10:00", "view"))
    batch1.toDF("event_id", "ts_s", "event_type")
      .select(col("event_id"), to_timestamp(col("ts_s")).as("ts"), col("event_type"))
      .write.mode("append").parquet(src)

    val schema = spark.read.parquet(src).schema
    val stream = spark.readStream.schema(schema).parquet(src)
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("ws"), col("event_type"), col("n"))

    val q = stream.writeStream.format("memory").queryName("file_counts")
      .outputMode(OutputMode.Complete()).start()
    try {
      q.processAllAvailable()
      batch2.toDF("event_id", "ts_s", "event_type")
        .select(col("event_id"), to_timestamp(col("ts_s")).as("ts"), col("event_type"))
        .write.mode("append").parquet(src)
      q.processAllAvailable()
      val rows = spark.table("file_counts").collect()
      assert(rows.map(_.getAs[Long]("n")).sum == 3)
      assert(rows.length == 3) // (00h view), (00h click), (01h view)
    } finally q.stop()
  }
}
