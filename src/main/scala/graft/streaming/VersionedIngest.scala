package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._
import graft.sources.VersionedTable

/** h43 — continuous ingest INTO the versioned table, exactly-once:
  * each micro-batch commits through i30's [[VersionedTable.commitTxn]]
  * with the Structured Streaming batch id as the transaction version
  * (batch ids are monotone across restarts under one checkpoint —
  * exactly Delta's `txnVersion` contract). foreachBatch is
  * at-least-once: a crash between the table commit and the
  * checkpoint's offset commit replays the SAME batch id on restart —
  * and the replay resolves to None inside commitTxn, burning no
  * version and appending no duplicate rows. The composition is the
  * point: the landed table is simultaneously snapshot-readable,
  * time-travelable (i25/i27), and CHANGE-CONSUMABLE (i13's
  * drainChanges sees one clean version per micro-batch) while the
  * stream runs. At 100 TB each trigger costs O(batch) writes + one
  * manifest CAS — the table never rewrites.
  *
  * The h17 CDC loop is the MERGE-shaped sibling (mutable keys,
  * bucket rewrite); this is the APPEND-shaped one (immutable events
  * into a log-structured table) — together they cover both
  * continuous-ingestion shapes. */
object VersionedIngest {

  val eventSchema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("v", StringType, nullable = false)))

  /** Drain every event file currently in `srcDir` into the versioned
    * table, one file per micro-batch, then stop. Re-running with the
    * same checkpoint resumes after the last committed batch. */
  def run(spark: SparkSession, srcDir: String, tablePath: String,
      checkpoint: String, writerId: String = "stream-ingest"): StreamingQuery =
    spark.readStream
      .schema(eventSchema)
      .option("maxFilesPerTrigger", 1)
      .parquet(srcDir)
      .writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, batchId: Long) =>
        if (!batch.isEmpty)
          VersionedTable.commitTxn(batch.sparkSession, tablePath, batch,
            writerId, batchId): Unit
        ()
      }
      .start()
}
