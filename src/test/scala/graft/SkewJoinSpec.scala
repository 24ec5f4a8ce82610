package graft

import org.apache.spark.sql.functions._

/** AQE skew handling: beyond the explicit salting demo (c10
  * q_salted_join), Spark's adaptive skew-join must split a hot key's
  * oversized shuffle partition at runtime — the default defense for
  * skew we did NOT anticipate. This spec forces tiny skew thresholds
  * and asserts the final adaptive plan actually split the join.
  */
class SkewJoinSpec extends SparkTestBase {

  test("AQE splits a skewed sort-merge join at runtime") {
    val confs = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1.0",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "32KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "16KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      import spark.implicits._
      // 90% of the left side hits key 0 — one shuffle partition would
      // hold ~90% of the data without the skew split
      val left = spark.range(200000)
        .select(when(col("id") % 10 < 9, 0L).otherwise(col("id") % 1000L).as("key"),
          md5(col("id").cast("string")).as("payload"))
      val right = spark.range(1000).select(col("id").as("key"),
        md5(col("id").cast("string")).as("dim"))
      val joined = left.join(right, "key")
      // execute THIS DataFrame's query execution (count() would spawn
      // its own) so AQE finalizes the plan we inspect
      assert(joined.collect().length == 200000)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"adaptive plan must mark the skewed join split:\n$plan")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
