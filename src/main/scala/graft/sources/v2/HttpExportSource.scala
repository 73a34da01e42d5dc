package graft.sources.v2

import java.util
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String
import graft.sources.Extract.Fetcher

/** DataSourceV2 batch source for hour-partitioned HTTP exports (SURVEY §7.2
  * M6 — the true-DSv2 rendering of the Amplitude/Mixpanel `/export` pull;
  * replaces the reference's `ampReplicator.js` shell fan-out, O2, with
  * Spark partition planning).
  *
  *   spark.read.format("graft.sources.v2.HttpExportSource")
  *     .option("baseUrl", ...)
  *     .option("start", "20210917T00").option("end", "20210918T00")
  *     .option("fetcherKey", <FetcherRegistry key>)   // or fetcherClass
  *     .load()
  *
  * Schema: (hour STRING, value STRING) — one row per exported line, raw;
  * callers compose `from_json` with a vendor schema (parsing stays in
  * Catalyst where it's codegen'd and column-pruned).
  *
  * Scale design:
  *  - one InputPartition per hour slice → extract parallelism == cluster
  *    parallelism, scheduled/retried per-task by Spark;
  *  - `SupportsPushDownFilters` prunes hour partitions from `hour`
  *    predicates (a WHERE clause skips the HTTP calls entirely);
  *  - fetch happens executor-side: no driver bottleneck, no staging hop.
  */
class HttpExportSource extends TableProvider {

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    HttpExportSource.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new HttpExportTable(new CaseInsensitiveStringMap(properties))
}

object HttpExportSource {
  val schema: StructType = StructType(Seq(
    StructField("hour", StringType, nullable = false),
    StructField("value", StringType, nullable = false)))
}

/** Process-wide fetcher registry for injected transports (tests, local
  * mode). On a real multi-JVM cluster use `fetcherClass` (instantiated
  * per executor) instead of `fetcherKey`.
  */
object FetcherRegistry {
  private val m = new java.util.concurrent.ConcurrentHashMap[String, Fetcher]()
  def put(key: String, f: Fetcher): Unit = m.put(key, f)
  def get(key: String): Fetcher = {
    val f = m.get(key)
    require(f != null, s"no fetcher registered under '$key'")
    f
  }
}

private case class FetcherRef(key: Option[String], className: Option[String])
    extends Serializable {
  def resolve(): Fetcher = key.map(FetcherRegistry.get).getOrElse {
    Class.forName(className.getOrElse(
      throw new IllegalArgumentException("need fetcherKey or fetcherClass")))
      .getDeclaredConstructor().newInstance().asInstanceOf[Fetcher]
  }
}

private class HttpExportTable(options: CaseInsensitiveStringMap)
    extends Table with SupportsRead {

  override def name(): String = s"http_export(${options.get("baseUrl")})"
  override def schema(): StructType = HttpExportSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(caseInsensitiveOptions: CaseInsensitiveStringMap): ScanBuilder =
    new HttpExportScanBuilder(options)
}

private class HttpExportScanBuilder(options: CaseInsensitiveStringMap)
    extends ScanBuilder with SupportsPushDownFilters {

  private var pushed: Array[Filter] = Array.empty

  /** Accept simple predicates on `hour` for partition pruning; everything
    * else is left for Spark to evaluate post-scan.
    */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (ours, rest) = filters.partition {
      case EqualTo("hour", _) | GreaterThan("hour", _) | GreaterThanOrEqual("hour", _) |
           LessThan("hour", _) | LessThanOrEqual("hour", _) => true
      case _ => false
    }
    pushed = ours
    rest
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan = {
    val start = java.time.LocalDateTime.parse(options.get("start"),
      java.time.format.DateTimeFormatter.ofPattern("yyyyMMdd'T'HH"))
    val end = java.time.LocalDateTime.parse(options.get("end"),
      java.time.format.DateTimeFormatter.ofPattern("yyyyMMdd'T'HH"))
    val hours = graft.sources.Extract.hourRanges(start, end)
    val pruned = hours.filter { case (h, _) => pushed.forall(keeps(h, _)) }
    new HttpExportScan(
      options.get("baseUrl"),
      pruned,
      FetcherRef(Option(options.get("fetcherKey")), Option(options.get("fetcherClass"))))
  }

  private def keeps(hour: String, f: Filter): Boolean = f match {
    case EqualTo("hour", v: String) => hour == v
    case GreaterThan("hour", v: String) => hour > v
    case GreaterThanOrEqual("hour", v: String) => hour >= v
    case LessThan("hour", v: String) => hour < v
    case LessThanOrEqual("hour", v: String) => hour <= v
    case _ => true
  }
}

private case class HourInputPartition(hourStart: String, hourEnd: String,
    url: String) extends InputPartition

private class HttpExportScan(baseUrl: String, hours: Seq[(String, String)],
    fetcherRef: FetcherRef) extends Scan with Batch {

  override def readSchema(): StructType = HttpExportSource.schema
  override def toBatch: Batch = this
  override def description(): String =
    s"HttpExportScan($baseUrl, ${hours.size} hour partitions)"

  override def planInputPartitions(): Array[InputPartition] =
    hours.map { case (s, e) =>
      HourInputPartition(s, e, s"$baseUrl/api/2/export?start=$s&end=$e")
    }.toArray

  override def createReaderFactory(): PartitionReaderFactory =
    new HourReaderFactory(fetcherRef)
}

private class HourReaderFactory(fetcherRef: FetcherRef)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[HourInputPartition]
    new PartitionReader[InternalRow] {
      private val lines: Iterator[String] =
        fetcherRef.resolve().get(p.url) match {
          case Some(body) => new String(body, "UTF-8").linesIterator.filter(_.nonEmpty)
          case None => Iterator.empty // empty export hour → empty partition
        }
      private var current: InternalRow = _
      override def next(): Boolean =
        if (lines.hasNext) {
          current = InternalRow(
            UTF8String.fromString(p.hourStart), UTF8String.fromString(lines.next()))
          true
        } else false
      override def get(): InternalRow = current
      override def close(): Unit = ()
    }
  }
}
