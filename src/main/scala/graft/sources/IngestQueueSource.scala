package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 input connector for the ingest queue: the reference
  * consumes `{blob_url};{token};join_vector_tiles={bool}` messages one
  * at a time from a service bus (ref ingest.py:62-66); on Spark the
  * queue backlog is a TABLE, and this connector exposes it through the
  * V2 read path so any `SparkEntry` pipeline can consume it with
  * `spark.read.format("graft-queue")`. A real deployment would point
  * the same connector surface at the bus' checkpointable feed; here
  * the payload is the deterministic message synthesis the a1 operator
  * parses (same url/token/flag algebra).
  *
  * Scale shape: `planInputPartitions` splits the id range into
  * `numPartitions` independent slices (no driver materialization,
  * ~even rows per task) and the ScanBuilder implements
  * SupportsPushDownRequiredColumns, so `select(event_id)` reads
  * nothing else — column pruning reaches the source exactly as it
  * does for parquet.
  */
class IngestQueueSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-queue"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    IngestQueueSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new IngestQueueTable(new CaseInsensitiveStringMap(properties))
}

object IngestQueueSource {
  val schema: StructType = StructType(Seq(
    StructField("event_id", LongType, nullable = false),
    StructField("blob_url", StringType, nullable = false),
    StructField("token", StringType, nullable = false),
    StructField("join_vector_tiles", BooleanType, nullable = false)))

  private val exts = Array(".tif", ".tiff", ".nc", ".gpkg", ".geojson",
    ".zip", ".gz", ".pmtiles", ".gdb", ".xyz")

  def fileName(id: Long): String = s"file_${id % 97}${exts((id % 10).toInt)}"

  def blobUrl(id: Long): String =
    s"https://acct.blob.core.windows.net/userdata/user${id % 1500}/raw/${fileName(id)}"

  def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
}

class IngestQueueTable(options: CaseInsensitiveStringMap)
    extends Table with SupportsRead {
  override def name(): String = "graft_ingest_queue"
  override def schema(): StructType = IngestQueueSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(caseInsensitiveOptions: CaseInsensitiveStringMap): ScanBuilder = {
    // read-path options are the canonical source; table properties
    // (captured at getTable) are the fallback for catalog-style use
    def opt(key: String, default: Long): Long =
      if (caseInsensitiveOptions.containsKey(key)) caseInsensitiveOptions.getLong(key, default)
      else options.getLong(key, default)
    new IngestQueueScanBuilder(
      opt("numMessages", 1000L),
      opt("numPartitions", 4L).toInt)
  }
}

class IngestQueueScanBuilder(numMessages: Long, numPartitions: Int)
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = IngestQueueSource.schema
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  override def build(): Scan = new IngestQueueScan(numMessages, numPartitions, required)
}

case class IdRange(start: Long, end: Long) extends InputPartition

class IngestQueueScan(numMessages: Long, numPartitions: Int, required: StructType)
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def planInputPartitions(): Array[InputPartition] = {
    val per = math.max(1L, (numMessages + numPartitions - 1) / numPartitions)
    (0L until numMessages by per)
      .map(s => IdRange(s, math.min(s + per, numMessages)): InputPartition)
      .toArray
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new IngestQueueReaderFactory(required)
}

class IngestQueueReaderFactory(required: StructType)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val r = partition.asInstanceOf[IdRange]
    new PartitionReader[InternalRow] {
      private var id = r.start - 1
      // per-column generators bound once per task, not per row
      private val gens: Array[Long => Any] = required.fields.map(_.name).map {
        case "event_id" => (i: Long) => i
        case "blob_url" => (i: Long) => UTF8String.fromString(IngestQueueSource.blobUrl(i))
        case "token" => (i: Long) => UTF8String.fromString(IngestQueueSource.md5hex(i.toString))
        case "join_vector_tiles" => (i: Long) => i % 2 == 0
        case other => throw new IllegalArgumentException(s"unknown column $other")
      }
      override def next(): Boolean = { id += 1; id < r.end }
      override def get(): InternalRow =
        new GenericInternalRow(gens.map(g => g(id)).asInstanceOf[Array[Any]])
      override def close(): Unit = ()
    }
  }
}
