package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.sources.IngestQueueSource
import graft.streaming.IngestStream.IngestEvent

/** The reference's WHOLE service loop as ONE continuous streaming job:
  * queue source (i1) → per-asset stage state machine (h1) → pub/sub
  * progress sink (i5). ref main.py wires exactly this: the service-bus
  * receiver loop (ingest.py:41 ingest_message) drives per-asset
  * download/process progress (utils.py:79-84 compute_progress), and
  * every transition is published to the WebPubSub relay
  * (wsockets/client_pub.py, azblob metadata writes).
  *
  * Each component is individually proven (i1: offsets/AvailableNow/
  * restart; h1: state machine + checkpoint recovery; i5: staged
  * commit/epoch replay); this composition is the "replaces the
  * service" claim — offsets, state-store contents, and epoch
  * manifests all surviving one kill/restart TOGETHER, with
  * exactly-once published progress (ServiceLoopSpec proves the
  * interrupted run publishes byte-identical progress to an
  * uninterrupted one).
  *
  * Message model: the queue delivers CHUNK-COMPLETION notifications —
  * the reference's chunked download + compute_progress flow (ref
  * azblob.py download loop, utils.py:79-84: 30% on download, the
  * remaining 70 split across chunks, remainder on the last ⇒ 100).
  * `event_id` encodes (asset, chunk) as id = asset·4 + chunk, so an
  * asset's lifecycle SPANS micro-batches whenever a trigger boundary
  * falls inside its quadruple — which is what makes the composed
  * restart meaningful: the state store, not the batch, carries the
  * asset across the kill.
  *
  * Scale shape: state is keyed by asset url (hash-spread over
  * executors, one small record per IN-FLIGHT asset, freed at terminal
  * stages), the queue's admission control bounds each micro-batch,
  * and the sink's staged commit keeps publish exactly-once per epoch
  * — none of the three accumulates unbounded anything at 100 TB.
  */
object ServiceLoop {

  /** chunks per asset: download (30%) + 3 processing chunks
    * (70/3 each, remainder on the last ⇒ exactly 100, the a5
    * compute_progress algebra with nchunks=3). */
  val ChunksPerAsset = 4

  /** chunk-completion messages → per-asset stage events. The asset is
    * addressed by its chunk-0 message id (`event_id - event_id % 4`)
    * through the connector's public id→url algebra, so all four
    * chunks resolve to ONE url/user — the state-machine key.
    *
    * Chunks 1 and 2 complete OUT OF ORDER (their target progress is
    * swapped): concurrent chunk downloads finish in arbitrary order,
    * and the reference publishes CUMULATIVE progress, so a stale
    * completion must never move the bar backwards — here that dedup
    * is the h1 monotonicity guard. This also makes restart recovery
    * falsifiable: when a kill lands between the two, only a RESTORED
    * state machine knows progress already reached the higher mark and
    * rejects the stale chunk — a fresh one would publish a regression
    * (ServiceLoopSpec asserts exactly this). */
  def messageEvents(messages: DataFrame): Dataset[IngestEvent] = {
    import messages.sparkSession.implicits._
    val chunk = (col("event_id") % ChunksPerAsset).cast("int")
    val base = col("event_id") - col("event_id") % ChunksPerAsset
    val n = ChunksPerAsset - 1 // processing chunks after the download
    messages.select(
        IngestQueueSource.blobUrlCol(base).as("url"),
        concat(lit("user"), (base % 1500).cast("string")).as("user"),
        when(chunk === 0, "downloaded")
          .when(chunk === ChunksPerAsset - 1, "processed")
          .otherwise("processing").as("stage"),
        // utils.py:79-84 target marks: 30 + (70 div n)·i, remainder on
        // the last chunk ⇒ 100; completions for marks 1 and 2 arrive
        // swapped (see above)
        when(chunk === 0, lit(30))
          .when(chunk === 1, lit(30 + (70 / n) * 2))
          .when(chunk === 2, lit(30 + (70 / n) * 1))
          .otherwise(lit(30 + 70 % n + (70 / n) * n)).as("progress"),
        // +1 tick: a ts == the initial watermark (0) would be dropped
        // as late before the state machine ever saw message id 0
        ((col("event_id") + 1) * 1000L).as("eventTimeMs"))
      .as[IngestEvent]
  }

  /** Start the composed job. The caller owns the checkpoint dir: a
    * restart with the same `ckptDir` resumes offsets + state + sink
    * epoch numbering; `pubsubDir` accumulates the published progress
    * payloads behind the sink's manifest gate. */
  def run(spark: SparkSession, numMessages: Long, maxPerTrigger: Long,
      pubsubDir: String, ckptDir: String,
      trigger: org.apache.spark.sql.streaming.Trigger =
        org.apache.spark.sql.streaming.Trigger.AvailableNow()): StreamingQuery = {
    val messages = spark.readStream.format("graft-queue")
      .option("numMessages", numMessages)
      .option("numPartitions", 4)
      .option("maxMessagesPerTrigger", maxPerTrigger)
      .load()
    val updates = IngestStream.stageStateMachineEventTime(messageEvents(messages))
    updates.toDF()
      // the reference's canonical progress payload {user,url,stage,progress}
      .select(col("user"), col("url"), col("stage"), col("progress"))
      .writeStream.format("graft-pubsub")
      .option("checkpointLocation", ckptDir)
      .trigger(trigger)
      .start(pubsubDir)
  }
}
