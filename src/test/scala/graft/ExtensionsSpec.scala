package graft

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.DatasetsSink

class ExtensionsSpec extends AnyFunSuite {

  test("GraftExtensions injects graft_dot into a fresh session") {
    val spark = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .appName("graft-ext-test")
      .getOrCreate()
    try {
      import spark.implicits._
      val df = Seq((Array(1.0f, 2.0f, 3.0f), Array(4.0f, 5.0f, 6.0f))).toDF("a", "b")
      val got = df.selectExpr("graft_dot(a, b) AS d").collect()(0).getDouble(0)
      assert(math.abs(got - 32.0) < 1e-9)
      // codegen path actually engages (no fallback warnings → hard to
      // assert directly; at least the expression survives a filter)
      assert(df.where(expr("graft_dot(a, b) > 0")).count() == 1)
    } finally spark.stop()
  }

  test("IntersectCountRewrite replaces the interpreted lambda pattern and agrees with it") {
    val spark = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .appName("graft-ext-rule-test")
      .getOrCreate()
    try {
      import spark.implicits._
      val df = Seq(
        (Seq("a", "b", "c", "d"), Seq("b", "d", "e")),
        (Seq("x"), Seq("y")),
        (Seq.empty[String], Seq("a")))
        .toDF("sh_a", "sh_b")
        .repartition(2) // keep a real plan (ConvertToLocalRelation would fold it)
        .select(expr("size(filter(sh_a, x -> array_contains(sh_b, x)))").as("inter"))
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("graft_intersect_count"),
        s"optimizer rule must rewrite the lambda pattern:\n$plan")
      assert(df.collect().map(_.getInt(0)).toSeq.sorted == Seq(0, 0, 2))
      // direct function form agrees too
      val direct = Seq((Seq("a", "b"), Seq("b")))
        .toDF("a", "b").selectExpr("graft_intersect_count(a, b)").collect()(0).getInt(0)
      assert(direct == 1)
      // the rule is session-global, so it must preserve the lambda
      // pattern's null semantics for arbitrary user input: NULL
      // filter-side → size(NULL) (NULL under ANSI — Spark 4's default
      // — or -1 under the legacy flag; the rewrite captures the Size
      // node's own flag either way), NULL contains-side → lambda NULL
      // everywhere → size 0, null ELEMENTS on either side are
      // dropped / never match
      def nullCases(e: String) = Seq[(Seq[String], Seq[String])](
          (null, Seq("a")),
          (Seq("a", "b"), null),
          (Seq("a", null, "b"), Seq(null, "b", "c")))
        .toDF("sh_a", "sh_b")
        .repartition(2)
        .select(expr(e).as("inter"))
      val nulls = nullCases("size(filter(sh_a, x -> array_contains(sh_b, x)))")
      val nullPlan = nulls.queryExecution.executedPlan.toString
      assert(nullPlan.contains("graft_intersect_count"),
        s"rule must still fire on nullable inputs:\n$nullPlan")
      def vals(df: org.apache.spark.sql.DataFrame) = df.collect()
        .map(r => if (r.isNullAt(0)) None else Some(r.getInt(0))).toSeq
        .sortBy(_.getOrElse(Int.MinValue))
      assert(vals(nulls) == Seq(None, Some(0), Some(1)))
      // and it agrees exactly with an un-rewritten twin: wrapping the
      // contains in coalesce(…, false) is observably identical (filter
      // drops non-true either way) but doesn't match the rule's pattern
      val raw = nullCases("size(filter(sh_a, x -> coalesce(array_contains(sh_b, x), false)))")
      assert(!raw.queryExecution.executedPlan.toString.contains("graft_intersect_count"))
      assert(vals(raw) == vals(nulls))
    } finally spark.stop()
  }

  test("RangeJoinRewrite plans constant-width interval joins without a nested loop") {
    val spark = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .appName("graft-range-rewrite-test")
      .getOrCreate()
    try {
      import spark.implicits._
      val points = (0L until 1000L).map(i => i * 7L % 5000L).toDF("t").repartition(2)
      val windows = (0L until 50L).map(i => (i, i * 97L % 4900L)).toDF("w_id", "start").repartition(2)
      // the naive formulation every user writes first
      val joined = points.join(windows,
        col("t") >= col("start") && col("t") < col("start") + 100L)
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin"),
        s"range join must not plan a nested loop:\n$plan")
      assert(plan.contains("_graft_range_bucket"),
        s"expected the bucketed rewrite:\n$plan")
      // exhaustive ground truth
      val ps = (0L until 1000L).map(i => i * 7L % 5000L)
      val ws = (0L until 50L).map(i => (i, i * 97L % 4900L))
      val expected = (for { t <- ps; (w, s) <- ws if t >= s && t < s + 100L } yield (t, w, s))
        .groupBy(identity).view.mapValues(_.size).toMap
      val got = joined.collect()
        .map(r => (r.getAs[Long]("t"), r.getAs[Long]("w_id"), r.getAs[Long]("start")))
        .groupBy(identity).view.mapValues(_.size).toMap
      assert(got == expected, "rewrite must preserve join semantics exactly (no dups, no losses)")
      // joins that already have an equi key are left alone
      val equi = points.withColumn("k", col("t") % 10)
        .join(windows.withColumn("k", col("w_id") % 10), Seq("k"))
        .where(col("t") >= col("start") && col("t") < col("start") + 100L)
      assert(!equi.queryExecution.executedPlan.toString.contains("_graft_range_bucket"),
        "rule must not fire when a cross-side equi-predicate exists")
    } finally spark.stop()
  }

  test("registerViews: one call makes the suite + graft functions SQL-visible") {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .appName("graft-views-test").getOrCreate()
    try {
      graft.Tables.registerViews(spark, "/root/testdata/sf0.001")
      // plain SQL over two views
      val joined = spark.sql(
        """SELECT p_brand, COUNT(*) AS n FROM lineitem
           JOIN part ON l_partkey = p_partkey GROUP BY p_brand""").count()
      assert(joined > 0)
      // events view is ts-normalized: timestamp functions just work
      val days = spark.sql(
        "SELECT COUNT(DISTINCT CAST(ts AS DATE)) FROM events").head().getLong(0)
      assert(days > 1)
      // graft-native functions are SQL-callable in the same session
      val gh = spark.sql(
        "SELECT graft_geohash8(CAST(524288 AS BIGINT), CAST(524288 AS BIGINT)) AS g")
        .head().getString(0)
      assert(gh.length == 8 && gh == "s0000000")
    } finally spark.stop()
  }

  test("DatasetsSink partitioned roundtrip with partition pruning") {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .appName("graft-sink-test").getOrCreate()
    try {
      import spark.implicits._
      val dir = Files.createTempDirectory("graft_sink").toString
      val df = (0 until 100).map(i => (i.toLong % 5, i.toLong, s"row$i")).toDF("user_id", "id", "payload")
      DatasetsSink.writePartitioned(df, dir)
      val one = DatasetsSink.readUser(spark, dir, 3L)
      assert(one.count() == 20)
      val plan = one.queryExecution.executedPlan.toString
      assert(plan.contains("PartitionFilters: [isnotnull(user_id"), s"pruning missing:\n$plan")
    } finally spark.stop()
  }
}
