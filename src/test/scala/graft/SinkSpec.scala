package graft

import java.io.File
import java.nio.file.Files

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.sql.functions._

import graft.sources.DatasetsSink

/** Scan-optimized write path: zstd codec, in-partition clustering,
  * parquet bloom filters on point-lookup keys.
  */
class SinkSpec extends SparkTestBase {

  test("writeBatchIdempotent: a retried micro-batch replaces itself, never duplicates") {
    import spark.implicits._
    val out = Files.createTempDirectory("graft_sink_idem").toString
    DatasetsSink.writeBatchIdempotent((0 until 10).toDF("v"), 0L, out)
    DatasetsSink.writeBatchIdempotent((10 until 15).toDF("v"), 1L, out)
    assert(spark.read.parquet(out).count() == 15)
    // batch 1 fails mid-commit upstream and is retried with the same id
    DatasetsSink.writeBatchIdempotent((10 until 15).toDF("v"), 1L, out)
    val back = spark.read.parquet(out)
    assert(back.count() == 15, "retry must replace, not append")
    assert(back.select("v").distinct().count() == 15)
    // batch_id is an ordinary partition column on read
    assert(back.where(col("batch_id") === 1).count() == 5)
  }

  test("writeOptimized emits zstd parquet with bloom filters on the key column") {
    val out = Files.createTempDirectory("graft_sink").toString
    // bloom filters target HIGH-cardinality point-lookup keys (content
    // hashes); low-cardinality columns stay fully dictionary-encoded
    // and parquet rightly drops their (redundant) bloom filter
    val df = spark.range(30000).select(
      col("id"),
      concat(md5(col("id").cast("string")), md5(concat(lit("x"), col("id").cast("string"))),
        md5(concat(lit("y"), col("id").cast("string"))), md5(concat(lit("z"), col("id").cast("string"))))
        .as("content_key"),
      (col("id") % 100).as("user_id"))
    DatasetsSink.writeOptimized(df.repartition(2), out,
      sortCols = Seq("user_id"), bloomCols = Seq("content_key"))

    val files = new File(out).listFiles.filter(_.getName.endsWith(".parquet"))
    assert(files.nonEmpty)
    assert(files.forall(_.getName.contains(".zstd.")),
      s"expected zstd codec in file names, got ${files.map(_.getName).toSeq}")

    val reader = ParquetFileReader.open(
      HadoopInputFile.fromPath(new Path(files.head.getPath), new Configuration()))
    try {
      val cols = reader.getFooter.getBlocks.get(0).getColumns
      val byName = (0 until cols.size()).map(cols.get)
        .map(c => c.getPath.toDotString -> c).toMap
      assert(byName("content_key").getBloomFilterOffset >= 0,
        "content_key must carry a bloom filter")
      assert(byName("id").getBloomFilterOffset < 0,
        "bloom filters only on requested columns")
    } finally reader.close()

    // round-trip + point lookup still correct
    val back = spark.read.parquet(out)
    assert(back.count() == df.count())
    val probe = df.where(col("id") === 7).select("content_key").collect()(0).getString(0)
    assert(back.where(col("content_key") === probe).count() == 1)
  }

  test("readEvolved: drifting batch schemas read back as one canonical schema") {
    import org.apache.spark.sql.types._
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("evolve").toString
    // era 1: narrow ints, no lang column yet
    spark.range(3).select(col("id").cast("int").as("doc_id"),
      concat(lit("old_"), col("id")).as("text"))
      .write.mode("append").parquet(dir)
    // era 2: doc_id widened to long, lang added
    spark.range(3, 6).select(col("id").as("doc_id"),
      concat(lit("new_"), col("id")).as("text"), lit("en").as("lang"))
      .write.mode("append").parquet(dir)
    // era 3: a column the canonical schema later dropped
    spark.range(6, 9).select(col("id").as("doc_id"),
      concat(lit("tmp_"), col("id")).as("text"), lit("de").as("lang"),
      lit(0.5).as("legacy_score"))
      .write.mode("append").parquet(dir)
    val canonical = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("lang", StringType)))
    val out = sources.DatasetsSink.readEvolved(spark, dir, canonical)
    // one stable schema: widened, aligned, dropped column pruned
    assert(out.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
      Seq(("doc_id", LongType), ("text", StringType), ("lang", StringType)))
    val rows = out.orderBy("doc_id").collect()
    assert(rows.length == 9)
    // era-1 rows: missing lang reads as null, never a schema error
    assert(rows.take(3).forall(r => r.isNullAt(2) && r.getString(1).startsWith("old_")))
    assert(rows.drop(3).take(3).forall(_.getString(2) == "en"))
    // pruning survives the align: a doc_id-only query reads one column
    val plan = sources.DatasetsSink.readEvolved(spark, dir, canonical)
      .select("doc_id").queryExecution.executedPlan.toString
    assert(!plan.contains("legacy_score") && !plan.toLowerCase.contains("readschema: struct<doc_id:bigint,text"),
      s"align must not defeat column pruning:\n$plan")
  }
}
