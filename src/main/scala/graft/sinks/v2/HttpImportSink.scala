package graft.sinks.v2

import java.util
import org.apache.spark.sql.connector.catalog.{SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import graft.sinks.BatchedHttpSink
import graft.sinks.BatchedHttpSink.{PartitionBatcher, SinkConfig, Transport}

/** DataSourceV2 batch writer for the HTTP import sink (SURVEY §7.2 M5):
  *
  *   shaped.write.format("graft.sinks.v2.HttpImportSink")
  *     .option("url", ...).option("maxRecordsPerBatch", "2000")
  *     .option("transportKey", <TransportRegistry key>)  // or transportClass
  *     .mode("append").save()
  *
  * Input schema: a single `json` STRING column (shape with
  * `Sinks.shapeMixpanelEvents` etc.). Each task runs the shared
  * [[PartitionBatcher]] (count+byte caps, gzip, retry, rate limit) and
  * reports per-task counts through commit messages — the DSv2 rendering of
  * the same at-least-once + $insert_id-idempotent contract as
  * [[BatchedHttpSink.writeJson]].
  */
class HttpImportSink extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    HttpImportSink.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new HttpImportTable(new CaseInsensitiveStringMap(properties))
}

object HttpImportSink {
  val schema: StructType = StructType(Seq(StructField("json", StringType)))

  /** Totals from the last completed write in this process (commit-side
    * observability for tests/reporting; cluster deployments read task
    * metrics instead).
    */
  @volatile var lastCommit: Option[(Long, Long, Long)] = None // records, batches, failed
}

object TransportRegistry {
  private val m = new java.util.concurrent.ConcurrentHashMap[String, Transport]()
  def put(key: String, t: Transport): Unit = m.put(key, t)
  def get(key: String): Transport = {
    val t = m.get(key)
    require(t != null, s"no transport registered under '$key'")
    t
  }
}

private case class TransportRef(key: Option[String], className: Option[String])
    extends Serializable {
  def resolve(): Transport = key.map(TransportRegistry.get).getOrElse {
    Class.forName(className.getOrElse(
      throw new IllegalArgumentException("need transportKey or transportClass")))
      .getDeclaredConstructor().newInstance().asInstanceOf[Transport]
  }
}

private class HttpImportTable(options: CaseInsensitiveStringMap)
    extends Table with SupportsWrite {
  override def name(): String = s"http_import(${options.get("url")})"
  override def schema(): StructType = HttpImportSink.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_WRITE)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    val cfg = SinkConfig(
      url = options.get("url"),
      maxRecordsPerBatch = options.getInt("maxRecordsPerBatch", 2000),
      maxBytesPerBatch = options.getLong("maxBytesPerBatch", 2L * 1024 * 1024),
      gzipBody = options.getBoolean("gzip", true),
      maxRetries = options.getInt("maxRetries", 3),
      initialBackoffMs = options.getLong("initialBackoffMs", 500),
      ratePerSecond = options.getDouble("ratePerSecond", 0.0))
    val ref = TransportRef(Option(options.get("transportKey")),
      Option(options.get("transportClass")))
    val jsonIdx = info.schema().fieldIndex("json")
    new WriteBuilder {
      override def build(): Write = new Write {
        override def toBatch: BatchWrite = new HttpBatchWrite(cfg, ref, jsonIdx)
      }
    }
  }
}

private case class TaskCounts(records: Long, batches: Long, failed: Long)
    extends WriterCommitMessage

private class HttpBatchWrite(cfg: SinkConfig, ref: TransportRef, jsonIdx: Int)
    extends BatchWrite {
  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    HttpWriterFactory(cfg, ref, jsonIdx) // top-level case class: an inline
    // anonymous factory would capture the non-serializable BatchWrite
  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val totals = messages.collect { case t: TaskCounts => t }
    HttpImportSink.lastCommit = Some((
      totals.map(_.records).sum, totals.map(_.batches).sum, totals.map(_.failed).sum))
  }
  override def abort(messages: Array[WriterCommitMessage]): Unit = ()
}

private case class HttpWriterFactory(cfg: SinkConfig, ref: TransportRef, jsonIdx: Int)
    extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new HttpDataWriter(cfg, ref, jsonIdx)
}

private class HttpDataWriter(cfg: SinkConfig, ref: TransportRef, jsonIdx: Int)
    extends DataWriter[InternalRow] {
  private var records = 0L
  private var batches = 0L
  private var failed = 0L
  private val batcher = new PartitionBatcher(cfg, ref.resolve(), (n, _, ok) => {
    batches += 1
    if (ok) records += n else failed += 1
  })
  override def write(row: InternalRow): Unit =
    batcher.add(row.getUTF8String(jsonIdx).toString)
  override def commit(): WriterCommitMessage = {
    batcher.flush()
    TaskCounts(records, batches, failed)
  }
  override def abort(): Unit = ()
  override def close(): Unit = ()
}
