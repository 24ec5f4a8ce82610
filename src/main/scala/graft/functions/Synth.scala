package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic synthetic derivations shared by operators and their
  * DuckDB oracles. The driver's testdata has no URLs / coordinates, so
  * the reference's domain (blob urls, feature lon/lat) is derived
  * in-query from integer keys — with EXACTLY mirrored arithmetic on
  * the SQL side (each Column builder here has a `*Sql` twin). Only
  * +,-,*,%,/ on integers and one double division are used so both
  * engines produce bit-identical doubles.
  */
object Synth {

  /** file extension cycling through the reference's route classes
    * (config.py: ALLOWED_GDAL_FORMATS, GDAL_ARCHIVE_FORMATS, OUT_FORMATS) */
  val extCases: Seq[(Int, String)] = Seq(
    0 -> ".tif", 1 -> ".tiff", 2 -> ".nc", 3 -> ".gpkg", 4 -> ".geojson",
    5 -> ".zip", 6 -> ".gz", 7 -> ".pmtiles", 8 -> ".gdb", 9 -> ".xyz")

  def ext(eventId: Column): Column =
    extCases.foldLeft(lit(null).cast("string")) { case (acc, (k, v)) =>
      when(eventId % 10 === k, v).otherwise(acc)
    }

  val extSql: String =
    "CASE event_id % 10 " +
      extCases.map { case (k, v) => s"WHEN $k THEN '$v'" }.mkString(" ") +
      " END"

  def fileName(eventId: Column): Column =
    concat(lit("file_"), (eventId % 97).cast("string"), ext(eventId))

  val fileNameSql: String =
    s"'file_' || CAST(event_id % 97 AS VARCHAR) || ($extSql)"

  /** per-event blob url (container=userdata, user dir, raw folder) */
  def blobUrl(eventId: Column, userId: Column): Column =
    concat(lit("https://acct.blob.core.windows.net/userdata/user"),
      userId.cast("string"), lit("/raw/"), fileName(eventId))

  val blobUrlSql: String =
    "'https://acct.blob.core.windows.net/userdata/user' || CAST(user_id AS VARCHAR)" +
      s" || '/raw/' || ($fileNameSql)"

  /** per-user url (for cancel-message matching, keyed on user only) */
  def userUrl(userId: Column): Column =
    concat(lit("https://acct.blob.core.windows.net/userdata/user"),
      userId.cast("string"), lit("/raw/file_"),
      (userId % 7).cast("string"), lit(".gpkg"))

  val userUrlSql: String =
    "'https://acct.blob.core.windows.net/userdata/user' || CAST(user_id AS VARCHAR)" +
      " || '/raw/file_' || CAST(user_id % 7 AS VARCHAR) || '.gpkg'"

  /** synthetic feature coordinates: pure integer arithmetic + one double
    * division ⇒ bit-identical across engines. lat stays inside the
    * WebMercator-safe band; latRaw intentionally spills past ±85.05 so
    * make-valid has something to drop. */
  def lon(eventId: Column): Column =
    (eventId * 2654435761L % 360000L).cast("double") / 1000.0 - 180.0
  val lonSql = "CAST(event_id * 2654435761 % 360000 AS DOUBLE) / 1000.0 - 180.0"

  def lat(eventId: Column): Column =
    (eventId * 1327217873L % 170000L).cast("double") / 1000.0 - 85.0
  val latSql = "CAST(event_id * 1327217873 % 170000 AS DOUBLE) / 1000.0 - 85.0"

  def latRaw(eventId: Column): Column =
    (eventId * 7919L % 180000L).cast("double") / 1000.0 - 90.0
  val latRawSql = "CAST(event_id * 7919 % 180000 AS DOUBLE) / 1000.0 - 90.0"
}
