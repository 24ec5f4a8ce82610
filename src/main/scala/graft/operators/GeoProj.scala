package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.Synth

/** §2 B (depth) — arbitrary-source-CRS reprojection math. The
  * reference reprojects ANY source SRS to the pipeline CRS via
  * ogr2ogr (ref processing.py:100-160, decision matrix at
  * processing.py:36-61); b2 models the full decision matrix and
  * synthesizes EPSG:32633 (UTM zone 33N) rows whose "reproject"
  * verdict previously had no transform to execute. This module
  * supplies that transform: the closed-form ellipsoidal transverse
  * Mercator (Krüger series to n³ — the standard UTM formulation,
  * public in Karney 2011 "Transverse Mercator with an accuracy of a
  * few nanometers" and the UTM literature), forward AND inverse, as
  * pure codegen'd column math.
  *
  * Engine-agreement discipline (b1's, extended): every stage is a
  * SHARED SQL string — the Spark side evaluates it with `expr`, the
  * DuckDB oracle inlines the same string in a WITH chain — so both
  * engines execute the identical IEEE754 expression tree. Hyperbolics
  * are spelled via exp/ln (DuckDB has no sinh/cosh/atanh), constants
  * are Scala-computed doubles interpolated with their shortest
  * round-trip representation (both parsers recover the exact double),
  * and only the FINAL coordinates are rounded (cm for meters, 1e-7
  * deg for angles) — intermediate rounding would multiply boundary
  * exposure, end-only rounding keeps the disagreement window at the
  * accumulated-ulp scale (~1e-9 relative) against a 1e-2/1e-7
  * boundary. The inverse reads the ROUNDED easting/northing, so both
  * engines start phase 2 from bit-identical inputs.
  *
  * At 100 TB: map-only, zero shuffles, whole-stage codegen'd — the
  * transform rides the ingest scan like the reference's ogr2ogr rides
  * its file copy, except distributed per-row instead of per-file.
  */
object GeoProj {

  // WGS84 + Krüger series constants (third flattening n)
  private val Fl   = 1.0 / 298.257223563
  private val N3   = Fl / (2.0 - Fl)
  private val Ecc  = math.sqrt(Fl * (2.0 - Fl))
  private val Arad = 6378137.0 / (1.0 + N3) * (1.0 + N3 * N3 / 4.0 + N3 * N3 * N3 * N3 / 64.0)
  private val K0A  = 0.9996 * Arad
  private val Al1  = N3 / 2.0 - 2.0 * N3 * N3 / 3.0 + 5.0 * N3 * N3 * N3 / 16.0
  private val Al2  = 13.0 * N3 * N3 / 48.0 - 3.0 * N3 * N3 * N3 / 5.0
  private val Al3  = 61.0 * N3 * N3 * N3 / 240.0
  private val Be1  = N3 / 2.0 - 2.0 * N3 * N3 / 3.0 + 37.0 * N3 * N3 * N3 / 96.0
  private val Be2  = N3 * N3 / 48.0 + N3 * N3 * N3 / 15.0
  private val Be3  = 17.0 * N3 * N3 * N3 / 480.0
  private val De1  = 2.0 * N3 - 2.0 * N3 * N3 / 3.0 - 2.0 * N3 * N3 * N3
  private val De2  = 7.0 * N3 * N3 / 3.0 - 8.0 * N3 * N3 * N3 / 5.0
  private val De3  = 56.0 * N3 * N3 * N3 / 15.0
  private val Lon0 = 15.0 // UTM zone 33 central meridian

  // sinh/cosh/atanh spelled in the exp/ln subset both engines share
  private def sh(u: String) = s"((exp($u) - exp(-($u))) / 2)"
  private def ch(u: String) = s"((exp($u) + exp(-($u))) / 2)"
  private def ath(x: String) = s"(0.5 * ln((1 + $x) / (1 - $x)))"

  // ---- shared stage strings (the single source of truth both
  //      engines execute) ----
  private val lonSrcS = s"(12.0 + ((${Synth.lonSql}) + 180.0) / 60.0)"
  private val latSrcS = s"(((${Synth.latSql}) + 85.0) * 0.494)"
  private val sphiS   = "sin(radians(lat_src))"
  private val targS   = s"(${ath("sphi")} - $Ecc * ${ath(s"($Ecc * sphi)")})"
  private val ttS     = sh("targ")
  private val lamdS   = s"radians(lon_src - $Lon0)"
  private val xipS    = "atan(tt / cos(lamd))"
  private val setaS   = "(sin(lamd) / sqrt(1 + tt * tt))"
  private val etapS   = ath("seta")
  private val eastS   =
    s"""round(500000.0 + $K0A * (etap
        + $Al1 * cos(2 * xip) * ${sh("(2 * etap)")}
        + $Al2 * cos(4 * xip) * ${sh("(4 * etap)")}
        + $Al3 * cos(6 * xip) * ${sh("(6 * etap)")}), 2)"""
  private val northS  =
    s"""round($K0A * (xip
        + $Al1 * sin(2 * xip) * ${ch("(2 * etap)")}
        + $Al2 * sin(4 * xip) * ${ch("(4 * etap)")}
        + $Al3 * sin(6 * xip) * ${ch("(6 * etap)")}), 2)"""
  // inverse — from the ROUNDED pair (bit-identical starting point)
  private val xiS     = s"(northing / $K0A)"
  private val etaS    = s"((easting - 500000.0) / $K0A)"
  private val xip2S   =
    s"""(xi - ($Be1 * sin(2 * xi) * ${ch("(2 * eta)")}
             + $Be2 * sin(4 * xi) * ${ch("(4 * eta)")}
             + $Be3 * sin(6 * xi) * ${ch("(6 * eta)")}))"""
  private val etap2S  =
    s"""(eta - ($Be1 * cos(2 * xi) * ${sh("(2 * eta)")}
             + $Be2 * cos(4 * xi) * ${sh("(4 * eta)")}
             + $Be3 * cos(6 * xi) * ${sh("(6 * eta)")}))"""
  private val chiS    = s"asin(sin(xip2) / ${ch("etap2")})"
  private val latOutS =
    s"round(degrees(chi + $De1 * sin(2 * chi) + $De2 * sin(4 * chi) + $De3 * sin(6 * chi)), 7)"
  private val lonOutS =
    s"round($Lon0 + degrees(atan(${sh("etap2")} / cos(xip2))), 7)"
  private val okS     =
    "(abs(lat_4326 - round(lat_src, 7)) < 0.000001 AND abs(lon_4326 - round(lon_src, 7)) < 0.000001)"

  /** b34 — `q_reproject_utm`: execute the reprojection b2's decision
    * matrix plans for its EPSG:32633 rows (ref processing.py:100-160 —
    * dataset2fgb's ogr2ogr -t_srs EPSG:4326 leg). Source coordinates
    * are synthesized IN zone 33 by the forward transform (lat/lon →
    * easting/northing, the data a UTM shapefile would carry), then the
    * inverse recovers EPSG:4326 — both directions exercised in one
    * plan, with a roundtrip gate proving the pair is mutually
    * consistent to ≪1e-6° (the forward/inverse series agree to
    * nanometers; the 1e-6 margin absorbs the cm rounding of the
    * stored easting/northing). */
  def qReprojectUtm(spark: SparkSession, dir: String): DataFrame = {
    Tables.events(spark, dir)
      .where(col("event_id") % 5 === 3) // b2's UTM-33N rows
      .select(col("event_id"))
      .withColumn("lon_src", expr(lonSrcS))
      .withColumn("lat_src", expr(latSrcS))
      .withColumn("sphi", expr(sphiS))
      .withColumn("targ", expr(targS))
      .withColumn("tt", expr(ttS))
      .withColumn("lamd", expr(lamdS))
      .withColumn("xip", expr(xipS))
      .withColumn("seta", expr(setaS))
      .withColumn("etap", expr(etapS))
      .withColumn("easting", expr(eastS))
      .withColumn("northing", expr(northS))
      .withColumn("xi", expr(xiS))
      .withColumn("eta", expr(etaS))
      .withColumn("xip2", expr(xip2S))
      .withColumn("etap2", expr(etap2S))
      .withColumn("chi", expr(chiS))
      .withColumn("lat_4326", expr(latOutS))
      .withColumn("lon_4326", expr(lonOutS))
      .withColumn("roundtrip_ok", expr(okS))
      .select("event_id", "easting", "northing", "lat_4326", "lon_4326", "roundtrip_ok")
      .orderBy("event_id")
  }

  val qReprojectUtmSql: String =
    s"""WITH s0 AS (
          SELECT event_id, $lonSrcS AS lon_src, $latSrcS AS lat_src
          FROM events WHERE event_id % 5 = 3),
        s1 AS (SELECT *, $sphiS AS sphi FROM s0),
        s2 AS (SELECT *, $targS AS targ FROM s1),
        s3 AS (SELECT *, $ttS AS tt, $lamdS AS lamd FROM s2),
        s4 AS (SELECT *, $xipS AS xip, $setaS AS seta FROM s3),
        s5 AS (SELECT *, $etapS AS etap FROM s4),
        s6 AS (SELECT *, $eastS AS easting, $northS AS northing FROM s5),
        s7 AS (SELECT *, $xiS AS xi, $etaS AS eta FROM s6),
        s8 AS (SELECT *, $xip2S AS xip2, $etap2S AS etap2 FROM s7),
        s9 AS (SELECT *, $chiS AS chi FROM s8),
        s10 AS (SELECT *, $latOutS AS lat_4326, $lonOutS AS lon_4326 FROM s9)
      SELECT event_id, easting, northing, lat_4326, lon_4326,
        $okS AS roundtrip_ok
      FROM s10 ORDER BY event_id"""

  /** Forward chain over a `utm_probe(lat_src, lon_src)` temp view —
    * GeoInvariantsSpec's anchor probe (central meridian → E=500000,
    * equator → N=0, 45°N → k0 × the published meridian arc). */
  val probeSql: String =
    s"""WITH s1 AS (SELECT lat_src, lon_src, $sphiS AS sphi FROM utm_probe),
        s2 AS (SELECT *, $targS AS targ FROM s1),
        s3 AS (SELECT *, $ttS AS tt, $lamdS AS lamd FROM s2),
        s4 AS (SELECT *, $xipS AS xip, $setaS AS seta FROM s3),
        s5 AS (SELECT *, $etapS AS etap FROM s4)
      SELECT lat_src, $eastS AS easting, $northS AS northing FROM s5"""

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_reproject_utm" -> (qReprojectUtm _))

  val oracles: Map[String, String] = Map(
    "q_reproject_utm" -> qReprojectUtmSql)
}
