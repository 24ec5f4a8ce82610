package graft.multimodal

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** §2 G — multimodal columns: media as opaque `binary` + typed
  * metadata. The codec libraries aren't in this container, so decode is
  * a clearly-marked deterministic stub — but the Spark-side plumbing
  * (binary columns, schema, partition-sized batches, per-partition
  * processing) is real and tested.
  */
object Media {

  /** g1 — binary column + magic-byte sniff + typed metadata. The
    * binary payload is the utf-8 encoded text (stands in for image
    * bytes); sniffing reads the leading byte exactly as a real
    * magic-number probe would. */
  def qMultimodalMeta(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables(spark, dir, "documents")
    d.select(col("doc_id"), col("n_chars"), col("text"))
      .withColumn("payload", encode(col("text"), "UTF-8"))
      .withColumn("nbytes", length(col("payload")).cast("int"))
      .withColumn("mime",
        when(ascii(substring(col("text"), 1, 1)).between(97, 104), "image/fake-png")
          .when(ascii(substring(col("text"), 1, 1)).between(105, 112), "audio/fake-wav")
          .when(ascii(substring(col("text"), 1, 1)).between(113, 120), "video/fake-mp4")
          .otherwise("text/plain"))
      .withColumn("width", col("n_chars") % 640 + 16)
      .withColumn("height", (col("doc_id") % 480 + 16))
      .withColumn("frames", col("n_chars") % 24 + 1)
      .select("doc_id", "nbytes", "mime", "width", "height", "frames")
      .orderBy("doc_id")
  }

  val qMultimodalMetaSql: String =
    """SELECT doc_id,
        CAST(octet_length(encode(text)) AS INT) AS nbytes,
        CASE WHEN ascii(substr(text, 1, 1)) BETWEEN 97 AND 104 THEN 'image/fake-png'
             WHEN ascii(substr(text, 1, 1)) BETWEEN 105 AND 112 THEN 'audio/fake-wav'
             WHEN ascii(substr(text, 1, 1)) BETWEEN 113 AND 120 THEN 'video/fake-mp4'
             ELSE 'text/plain' END AS mime,
        n_chars % 640 + 16 AS width,
        doc_id % 480 + 16 AS height,
        n_chars % 24 + 1 AS frames
      FROM documents ORDER BY doc_id"""

  // ---------------------------------------------------------------
  // g2 — media batch pipeline (rows-only check; exercised in tests).
  // ---------------------------------------------------------------

  /** One decoded media item. In a real deployment `features` would come
    * from an image/audio codec; here the decode step is STUBBED with a
    * deterministic transform of the payload bytes so the distributed
    * plumbing (schema, batching, partition layout) is fully testable.
    */
  case class MediaFeatures(doc_id: Long, mime: String, nbytes: Int,
      features: Array[Float])

  /** STUB decode: deterministic 8-dim "feature vector" from payload
    * bytes. Replace with a real codec (e.g. javax.imageio) when the
    * runtime has one — the signature and batch shape stay identical. */
  def decodeStub(payload: Array[Byte]): Array[Float] = {
    val f = new Array[Float](8)
    var i = 0
    while (i < payload.length) {
      f(i % 8) += (payload(i) & 0xff) / 255.0f
      i += 1
    }
    f
  }

  /** g2 — per-partition batch decode: binary in, fixed-width feature
    * vectors out. mapPartitions keeps codec state per task (the way a
    * real decoder amortizes init cost) and the output schema is
    * explicit so downstream ops stay columnar. The feature vector is
    * flattened to scalar f0..f7 columns (rounded) in the dumped
    * result so the driver's rows-only check can sort it — an
    * `array<float>` column is unhashable for pandas sort_values. */
  def qMediaPipeline(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val d = Tables(spark, dir, "documents")
    val src = d.select(col("doc_id"), col("text"))
      .withColumn("payload", encode(col("text"), "UTF-8"))
      .withColumn("mime", lit("image/fake-png"))
      .select(col("doc_id"), col("mime"), col("payload"))
      .as[(Long, String, Array[Byte])]
    val decoded = src.mapPartitions { it =>
      // per-task "codec" init would go here
      it.map { case (id, mime, payload) =>
        MediaFeatures(id, mime, payload.length, decodeStub(payload))
      }
    }.toDF()
    val flat = (0 until 8).map(i =>
      round(element_at(col("features"), i + 1).cast("double"), 5).as(s"f$i"))
    decoded.select(Seq(col("doc_id"), col("mime"), col("nbytes")) ++ flat: _*)
      .orderBy("doc_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_multimodal_meta" -> (qMultimodalMeta _),
    "q_media_pipeline" -> (qMediaPipeline _))

  /** q_media_pipeline intentionally has no oracle (stubbed decode is
    * not SQL-expressible) → driver records a rows-only check. */
  val oracles: Map[String, String] = Map(
    "q_multimodal_meta" -> qMultimodalMetaSql)
}
