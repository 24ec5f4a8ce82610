package graft

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Co-located joins via bucketing — the 100 TB pattern for repeated
  * fact-fact joins on the same key: pay the shuffle once at write
  * time, then every later join is exchange-free on that key.
  */
class BucketingSpec extends AnyFunSuite {

  test("bucketed fact-fact join plans without a shuffle exchange") {
    val wh = Files.createTempDirectory("graft_wh").toString
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.warehouse.dir", wh)
      .config("spark.sql.autoBroadcastJoinThreshold", "-1") // force the issue
      .config("spark.ui.enabled", "false")
      .appName("graft-bucketing").getOrCreate()
    try {
      import spark.implicits._
      val orders = (0L until 1000L).map(i => (i, s"o$i")).toDF("key", "o_payload")
      val items = (0L until 5000L).map(i => (i % 1000L, s"i$i")).toDF("key", "i_payload")
      orders.write.mode("overwrite").bucketBy(8, "key").sortBy("key").saveAsTable("orders_b")
      items.write.mode("overwrite").bucketBy(8, "key").sortBy("key").saveAsTable("items_b")
      val joined = spark.table("orders_b").join(spark.table("items_b"), "key")
        .groupBy("key").agg(count(lit(1)).as("n"))
      val plan = joined.queryExecution.executedPlan.toString
      // the join itself must not introduce a shuffle: both sides are
      // pre-bucketed on the key (the agg reuses that partitioning too)
      assert(!plan.contains("Exchange hashpartitioning"), s"unexpected shuffle:\n$plan")
      assert(joined.agg(sum("n")).collect()(0).getLong(0) == 5000L)
    } finally {
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS items_b")
      spark.stop()
    }
  }

  test("filtered ANN admission join is exchange-free over id-bucketed tables") {
    // the e8 scale claim made concrete: vectors and document metadata
    // co-bucketed on id at write time ⇒ the per-query metadata
    // admission join (the one join that touches every admissible row)
    // plans with NO shuffle — only the tiny probed-cell/centroid
    // broadcasts move per query
    val wh = Files.createTempDirectory("graft_wh_ann").toString
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.warehouse.dir", wh)
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.ui.enabled", "false")
      .appName("graft-bucketing-ann").getOrCreate()
    try {
      import spark.implicits._
      val vecs = (0L until 2000L).map(i => (i, Array.fill(4)(i.toFloat), (i % 7L).toInt))
        .toDF("vec_id", "embedding", "label")
      val meta = (0L until 2000L).map(i => (i, if (i % 3 == 0) "en" else "de"))
        .toDF("vec_id", "lang")
      vecs.write.mode("overwrite").bucketBy(8, "vec_id").sortBy("vec_id").saveAsTable("vecs_b")
      meta.write.mode("overwrite").bucketBy(8, "vec_id").sortBy("vec_id").saveAsTable("meta_b")
      val admitted = spark.table("vecs_b")
        .join(spark.table("meta_b").filter(col("lang") === "en").select("vec_id"), "vec_id")
      val plan = admitted.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"admission join shuffled over bucketed tables:\n$plan")
      assert(admitted.count() == 667L)
    } finally {
      spark.sql("DROP TABLE IF EXISTS vecs_b")
      spark.sql("DROP TABLE IF EXISTS meta_b")
      spark.stop()
    }
  }
}
