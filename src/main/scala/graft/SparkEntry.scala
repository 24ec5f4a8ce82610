package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §2 for the inventory. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks
    * rows>0. The reference's end-to-end dataflow in ONE plan: queue
    * message parse (a1) → format routing (a2) → destination path
    * algebra (a4), joined on the message id — the backlog parsed,
    * routed and destination-resolved, processable-first. */
  def entry(spark: SparkSession): DataFrame = {
    import org.apache.spark.sql.functions.col
    val dir = "/root/testdata/sf0.001"
    IngestOps.qParseMessage(spark, dir)
      .join(IngestOps.qRouteFormat(spark, dir), "event_id")
      .join(IngestOps.qDstPath(spark, dir), "event_id")
      .filter(col("route") =!= "skip")
      .select("event_id", "blob_url", "join_vector_tiles", "route",
        "vsi_prefix", "dst_blob_path", "cog_name")
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Analytics.queries ++ AnalyticsExt.queries ++ AnalyticsTs.queries ++ IngestOps.queries ++
      GeoOps.queries ++ GeoProj.queries ++ GeoGeom.queries ++ GeoClip.queries ++
      GeoSimplify.queries ++ GeoBorders.queries ++ GeoMulti.queries ++ GeoWrap.queries ++ GeoLines.queries ++ GeoRaster.queries ++ GeoMeta.queries ++
      TextOps.queries ++ TextModels.queries ++ CorpusClean.queries ++ Dedup.queries ++ Ann.queries ++
      Retrieval.queries ++ Bpe.queries ++ Pca.queries ++ Asof.queries ++ Serving.queries ++ Seeding.queries ++
      OpsAudit.queries ++ graft.multimodal.Media.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    Analytics.oracles ++ AnalyticsExt.oracles ++ AnalyticsTs.oracles ++ IngestOps.oracles ++
      GeoOps.oracles ++ GeoProj.oracles ++ GeoGeom.oracles ++ GeoClip.oracles ++
      GeoSimplify.oracles ++ GeoBorders.oracles ++ GeoMulti.oracles ++ GeoWrap.oracles ++ GeoLines.oracles ++ GeoRaster.oracles ++ GeoMeta.oracles ++
      TextOps.oracles ++ TextModels.oracles ++ CorpusClean.oracles ++ Dedup.oracles ++ Ann.oracles ++
      Retrieval.oracles ++ Bpe.oracles ++ Pca.oracles ++ Asof.oracles ++ Serving.oracles ++ Seeding.oracles ++
      OpsAudit.oracles ++ graft.multimodal.Media.oracles
}
