package graft.sources

import java.util
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.util.UUID

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.connector.write.streaming.{StreamingDataWriterFactory, StreamingWrite}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** i5 — DataSource V2 WRITE connector for the progress pub/sub relay:
  * the reference publishes `{user,url,stage,progress}` JSON payloads
  * to a WebPubSub group as each chunk completes (ref
  * wsockets/client_pub.py, utils.py:110-123 compute_progress → azblob
  * metadata + pub/sub). On Spark the publish side is a SINK, and this
  * connector exposes it through the V2 write path — batch
  * (`df.write.format("graft-pubsub").mode("append").save(dir)`) and
  * streaming (`df.writeStream.format("graft-pubsub")`), each payload
  * one JSON line, schema-generic over the primitive payload types.
  *
  * The engine-real part is the COMMIT PROTOCOL, not the byte format:
  * - each task writes to an invisible `.tmp/` staging file; `commit()`
  *   hands the driver a {staged-file, rows} message, task `abort()`
  *   deletes the staging file — a speculative/retried task's loser
  *   attempt can never surface rows, because only messages the driver
  *   received participate in the job commit;
  * - the job/epoch commit renames staged files into place and then
  *   atomically writes a manifest (`_graft_manifest_*`); READERS TRUST
  *   ONLY MANIFEST-LISTED FILES, so a crash between rename and
  *   manifest leaves garbage bytes but no visible rows (same
  *   visibility rule as the reference's `.ingesting` marker blobs);
  * - a streaming epoch's manifest is keyed by (queryId, epochId):
  *   replaying a committed epoch (at-least-once micro-batch retry)
  *   finds the manifest already present, discards its staging files
  *   and returns — EXACTLY-ONCE publish per epoch, the V2-native
  *   version of DatasetsSink.writeBatchIdempotent's
  *   overwrite-by-batch-id. queryId is part of the key because
  *   epochId alone is ambiguous across queries: a SECOND streaming
  *   query appending to the same path, or a restart from a FRESH
  *   checkpoint (epochs restart at 0), reuses epoch numbers and an
  *   epochId-only manifest would silently discard their commits as
  *   "replays". queryId is stable across restarts from the SAME
  *   checkpoint, so genuine retries still dedupe.
  *
  * Local filesystem I/O stands in for the blob/pub-sub SDK; on a
  * cluster the staging dir and rename map onto the object store's
  * multipart-upload + finalize. The protocol is the deliverable.
  */
class PubSubSink extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-pubsub"
  override def supportsExternalMetadata(): Boolean = true
  // write-only source: reads go through readPublished; inferSchema
  // answers with the reference's canonical progress payload
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    PubSubSink.progressSchema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new PubSubTable(schema, new CaseInsensitiveStringMap(properties))
}

object PubSubSink {
  val progressSchema: StructType = StructType(Seq(
    StructField("user", StringType),
    StructField("url", StringType),
    StructField("stage", StringType),
    StructField("progress", IntegerType)))

  private[sources] def tmpDir(root: String): Path = Paths.get(root, ".tmp")

  /** Rename staged files into place, then atomically publish the
    * manifest. `manifestName` is the idempotence key: if it already
    * exists (epoch replay), staged files are discarded unread. */
  private[sources] def publish(root: String, manifestName: String,
      messages: Array[WriterCommitMessage]): Unit = {
    val rootP = Paths.get(root)
    Files.createDirectories(rootP)
    val manifest = rootP.resolve(manifestName)
    val msgs = messages.collect { case m: PubSubCommitMessage => m }
    if (Files.exists(manifest)) {
      msgs.foreach(m => Files.deleteIfExists(tmpDir(root).resolve(m.staged)))
      return
    }
    val published = msgs.map { m =>
      val dst = m.staged.stripPrefix(".")
      Files.move(tmpDir(root).resolve(m.staged), rootP.resolve(dst),
        StandardCopyOption.REPLACE_EXISTING)
      s"""{"file":"$dst","rows":${m.rows}}"""
    }
    val tmpManifest = rootP.resolve(s".$manifestName.${UUID.randomUUID()}")
    Files.write(tmpManifest, published.mkString("\n").getBytes(StandardCharsets.UTF_8))
    Files.move(tmpManifest, manifest, StandardCopyOption.ATOMIC_MOVE)
  }

  private[sources] def discard(root: String,
      messages: Array[WriterCommitMessage]): Unit =
    messages.collect { case m: PubSubCommitMessage => m }
      .foreach(m => Files.deleteIfExists(tmpDir(root).resolve(m.staged)))

  /** The reader contract: only manifest-listed files are visible. */
  def readPublished(spark: SparkSession, root: String, schema: StructType): DataFrame = {
    val rootP = Paths.get(root)
    val files: Seq[String] =
      if (!Files.exists(rootP)) Seq.empty
      else scala.util.Using.resource(Files.list(rootP)) { ls =>
        ls.iterator().asScala
          .filter(_.getFileName.toString.startsWith("_graft_manifest"))
          .flatMap(m => Files.readAllLines(m).asScala)
          .map(line => rootP.resolve(
            line.split("\"file\":\"")(1).split("\"")(0)).toString)
          .toSeq
      }
    if (files.isEmpty) spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    else spark.read.schema(schema).json(files: _*)
  }
}

case class PubSubCommitMessage(staged: String, rows: Long) extends WriterCommitMessage

class PubSubTable(schema: StructType, options: CaseInsensitiveStringMap)
    extends Table with SupportsWrite {
  override def name(): String = "graft_pubsub"
  override def schema(): StructType = schema0
  private val schema0 = if (schema != null && schema.nonEmpty) schema else PubSubSink.progressSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_WRITE, TableCapability.STREAMING_WRITE)
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    val path = Option(info.options.get("path")).orElse(Option(options.get("path")))
      .getOrElse(throw new IllegalArgumentException("graft-pubsub requires a path"))
    new PubSubWriteBuilder(path, info.schema(), info.queryId())
  }
}

class PubSubWriteBuilder(path: String, schema: StructType, queryId: String)
    extends WriteBuilder {
  override def build(): Write = new PubSubWrite(path, schema, queryId)
}

class PubSubWrite(path: String, schema: StructType, queryId: String) extends Write {
  // fail at plan time, not mid-task, if a payload column can't serialize
  PubSubRowJson.validate(schema)
  override def toBatch: BatchWrite = new PubSubBatchWrite(path, schema, queryId)
  override def toStreaming: StreamingWrite = new PubSubStreamingWrite(path, schema, queryId)
}

class PubSubBatchWrite(path: String, schema: StructType, queryId: String)
    extends BatchWrite {
  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory = {
    Files.createDirectories(PubSubSink.tmpDir(path))
    new PubSubWriterFactory(path, schema)
  }
  override def commit(messages: Array[WriterCommitMessage]): Unit =
    PubSubSink.publish(path, s"_graft_manifest_$queryId", messages)
  override def abort(messages: Array[WriterCommitMessage]): Unit =
    PubSubSink.discard(path, messages)
}

class PubSubStreamingWrite(path: String, schema: StructType, queryId: String)
    extends StreamingWrite {
  override def createStreamingWriterFactory(info: PhysicalWriteInfo): StreamingDataWriterFactory = {
    Files.createDirectories(PubSubSink.tmpDir(path))
    new PubSubWriterFactory(path, schema)
  }
  // (queryId, epochId) key — epochId alone collides across queries and
  // across fresh-checkpoint restarts; see the class doc commit notes
  override def commit(epochId: Long, messages: Array[WriterCommitMessage]): Unit =
    PubSubSink.publish(path, s"_graft_manifest_${queryId}_epoch_$epochId", messages)
  override def abort(epochId: Long, messages: Array[WriterCommitMessage]): Unit =
    PubSubSink.discard(path, messages)
}

class PubSubWriterFactory(path: String, schema: StructType)
    extends DataWriterFactory with StreamingDataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new PubSubDataWriter(path, schema, partitionId, taskId)
  override def createWriter(partitionId: Int, taskId: Long,
      epochId: Long): DataWriter[InternalRow] =
    new PubSubDataWriter(path, schema, partitionId, taskId)
}

/** Per-task staged writer: every byte lands in `.tmp/` under a
  * task-unique name; nothing becomes visible unless THIS attempt's
  * commit message reaches the driver's job commit. */
class PubSubDataWriter(path: String, schema: StructType,
    partitionId: Int, taskId: Long) extends DataWriter[InternalRow] {
  private val staged = f".part-$partitionId%05d-$taskId-${UUID.randomUUID()}.jsonl"
  private val file = PubSubSink.tmpDir(path).resolve(staged)
  private val out = Files.newBufferedWriter(file, StandardCharsets.UTF_8)
  private val enc = PubSubRowJson(schema)
  private var rows = 0L

  override def write(row: InternalRow): Unit = {
    out.write(enc(row)); out.write('\n'); rows += 1
  }
  override def commit(): WriterCommitMessage = {
    out.close()
    PubSubCommitMessage(staged, rows)
  }
  override def abort(): Unit = { out.close(); Files.deleteIfExists(file) }
  override def close(): Unit = ()
}

/** Schema-driven InternalRow→JSON-line encoder over the primitive
  * payload types a progress/pub-sub message carries. */
object PubSubRowJson {
  private val supported: Set[DataType] =
    Set(StringType, IntegerType, LongType, DoubleType, FloatType, BooleanType)

  def validate(schema: StructType): Unit = schema.fields.foreach { f =>
    if (!supported.contains(f.dataType))
      throw new IllegalArgumentException(
        s"graft-pubsub payload field ${f.name}: unsupported type ${f.dataType.sql}")
  }

  private def escape(s: String): String = {
    val b = new StringBuilder(s.length + 8)
    s.foreach {
      case '"' => b.append("\\\"")
      case '\\' => b.append("\\\\")
      case '\n' => b.append("\\n")
      case '\r' => b.append("\\r")
      case '\t' => b.append("\\t")
      case c if c < ' ' => b.append(f"\\u${c.toInt}%04x")
      case c => b.append(c)
    }
    b.toString
  }

  def apply(schema: StructType): InternalRow => String = {
    validate(schema)
    val fields = schema.fields.zipWithIndex
    row => fields.map { case (f, i) =>
      val v =
        if (row.isNullAt(i)) "null"
        else f.dataType match {
          case StringType => "\"" + escape(row.getUTF8String(i).toString) + "\""
          case IntegerType => row.getInt(i).toString
          case LongType => row.getLong(i).toString
          case DoubleType => row.getDouble(i).toString
          case FloatType => row.getFloat(i).toString
          case BooleanType => row.getBoolean(i).toString
        }
      "\"" + escape(f.name) + "\":" + v
    }.mkString("{", ",", "}")
  }
}
