package graft

import graft.operators.CorpusClean

/** Scan-amplification gates for the round-18 composition ops (the b39
  * 5×-read lesson: mod-routed UNION arms and AQE subtree re-derivation
  * both show up as extra FileScans of the same parquet — count them). */
class ScanCountSpec extends SparkTestBase {

  private def docScans(df: org.apache.spark.sql.DataFrame): Int = {
    // force execution so AQE finalizes the plan it actually ran
    df.write.format("noop").mode("overwrite").save()
    "documents\\.parquet".r
      .findAllIn(df.queryExecution.executedPlan.toString()).length
  }

  test("f49 data card: documents is scanned once per registered sub-plan, never more") {
    // base projection + f46 + f47 + d25 = 4 scans; AQE re-derivation
    // or a future join re-plan would push this up
    val n = docScans(CorpusClean.qDataCard(spark, sfDir))
    assert(n <= 4, s"documents scanned $n times (expected <= 4)")
  }

  test("f48 ccnet buckets: the token join is materialized once (checkpoint), not per consumer") {
    // token explode feeds model-build + scoring = 2 scans; the
    // histogram chain and the assignment read the CHECKPOINTED per-doc
    // table, so no third scan appears
    val n = docScans(CorpusClean.qCcnetBuckets(spark, sfDir))
    assert(n <= 2, s"documents scanned $n times (expected <= 2)")
  }

  test("d26 cross-source: the self-join reads the distinct pre-agg, at most two scans") {
    val n = docScans(CorpusClean.qDedupCrossSource(spark, sfDir))
    assert(n <= 2, s"documents scanned $n times (expected <= 2)")
  }

  test("d27 split leakage: three consumers, one materialized occurrence stream") {
    val n = docScans(CorpusClean.qSplitLeakage(spark, sfDir))
    assert(n <= 1, s"documents scanned $n times (expected <= 1)")
  }

  private def eventScans(df: org.apache.spark.sql.DataFrame): Int = {
    df.write.format("noop").mode("overwrite").save()
    "events\\.parquet".r
      .findAllIn(df.queryExecution.executedPlan.toString()).length
  }

  test("c47 percentiles: 5-row stats + bucketed projection checkpoint once; the final plan never re-reads orders") {
    // round 13 verdict: the static plan read orders 7× (stats, ranks,
    // needed, hist, targets, selected each re-derived the base scan) —
    // at 100 TB the 7× fact read IS the query cost. The fix: eager
    // localCheckpoints for stats (scan #1) and the narrow bucketed
    // projection (scan #2); every downstream consumer must read the
    // materialized tables, so the FINAL plan has ZERO orders FileScans
    // and ≥2 checkpoint relations.
    val df = operators.AnalyticsExt.qPercentiles(spark, sfDir)
    df.write.format("noop").mode("overwrite").save()
    val p = df.queryExecution.executedPlan.toString()
    assert(!p.contains("orders.parquet"),
      s"the percentile assembly must read the checkpoints, not re-scan orders:\n$p")
    assert("Scan ExistingRDD".r.findAllIn(p).size >= 2,
      s"expected the stats + bucketed checkpoint relations:\n$p")
  }

  test("b53 tilejson / b55 tile buffer / a28 lifecycle: one events scan each") {
    assert(eventScans(operators.GeoMeta.qTilejson(spark, sfDir)) <= 1)
    assert(eventScans(operators.GeoMeta.qTileBuffer(spark, sfDir)) <= 1)
    // a28's 1-row broadcast "now" is a second (bounded) scan of the
    // same table - the classic max-ts pattern; gate it at exactly 2
    assert(eventScans(operators.IngestOps.qLifecycleTiers(spark, sfDir)) <= 2)
  }
}
