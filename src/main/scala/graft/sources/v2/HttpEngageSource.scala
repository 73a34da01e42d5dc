package graft.sources.v2

import java.util
import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.sources.{EqualTo, Filter, In}
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSourceV2 batch source for the Mixpanel `/engage` profile export
  * (SURVEY §2.1 S10) with PARALLEL slice planning.
  *
  * The reference pulls profiles with a single serial cursor walk
  * (`session_id` + `page`, loop while `results.length >= page_size` —
  * /root/reference/connectors/mixpanelETL.js:110-182). Pagination within
  * one result stream is inherently serial, but the API accepts disjoint
  * `filter_by_cohort` / `where` predicates — so the Spark-native plan is
  * one InputPartition per cohort (or per caller-supplied `where` slice),
  * each walking its own cursor chain executor-side. Extract parallelism
  * = number of slices; no driver staging hop, per-slice retry is a Spark
  * task retry (cursor walk restarts idempotently for a read-only export).
  *
  *   spark.read.format("graft.sources.v2.HttpEngageSource")
  *     .option("baseUrl", ...)
  *     .option("cohorts", "101,102,103")        // or whereSlices
  *     .option("fetcherKey", <FetcherRegistry key>)
  *     .load()
  *
  * Options:
  *  - `cohorts`: comma-separated cohort ids → slice per cohort
  *    (`filter_by_cohort={"id":N}`);
  *  - `whereSlices`: `;;`-separated segmentation expressions (e.g. date
  *    buckets over `properties["$last_seen"]`) → slice per expression;
  *  - neither → one slice (the reference's serial behavior, as a task);
  *  - `pageSize` (default 1000), `includeAllUsers` (F8 flag).
  *
  * Schema: (slice STRING, value STRING) — one row per profile, compact
  * JSON; callers compose `from_json` downstream so parsing stays in
  * Catalyst (codegen + column pruning). Simple predicates on `slice`
  * prune partitions BEFORE any HTTP call, like the hour-export source.
  */
class HttpEngageSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    HttpEngageSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new HttpEngageTable(new CaseInsensitiveStringMap(properties))
}

object HttpEngageSource {
  val schema: StructType = StructType(Seq(
    StructField("slice", StringType, nullable = false),
    StructField("value", StringType, nullable = false)))

  /** Slice plan from reader options: (sliceLabel, extraQueryParams). */
  private[v2] def slices(options: CaseInsensitiveStringMap): Seq[(String, String)] = {
    val enc = (s: String) => java.net.URLEncoder.encode(s, "UTF-8")
    val cohorts = Option(options.get("cohorts")).map(_.split(",").map(_.trim).filter(_.nonEmpty))
    val wheres = Option(options.get("whereSlices")).map(_.split(";;").map(_.trim).filter(_.nonEmpty))
    (cohorts, wheres) match {
      case (Some(cs), _) =>
        cs.toSeq.map(c => (s"cohort:$c", s"&filter_by_cohort=${enc(s"""{"id":$c}""")}"))
      case (_, Some(ws)) =>
        ws.toSeq.zipWithIndex.map { case (w, i) => (s"where:$i", s"&where=${enc(w)}") }
      case _ => Seq(("all", ""))
    }
  }
}

private class HttpEngageTable(options: CaseInsensitiveStringMap)
    extends Table with SupportsRead {
  override def name(): String = s"http_engage(${options.get("baseUrl")})"
  override def schema(): StructType = HttpEngageSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(caseInsensitiveOptions: CaseInsensitiveStringMap): ScanBuilder =
    new HttpEngageScanBuilder(options)
}

private class HttpEngageScanBuilder(options: CaseInsensitiveStringMap)
    extends ScanBuilder with SupportsPushDownFilters {

  private var pushed: Array[Filter] = Array.empty

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (ours, rest) = filters.partition {
      case EqualTo("slice", _) | In("slice", _) => true
      case _ => false
    }
    pushed = ours
    rest
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan = {
    val keeps: String => Boolean = s => pushed.forall {
      case EqualTo("slice", v: String) => s == v
      case In("slice", vs) => vs.exists(_ == s)
      case _ => true
    }
    val all = HttpEngageSource.slices(options)
    new HttpEngageScan(
      options.get("baseUrl"),
      all.filter { case (label, _) => keeps(label) },
      math.max(Option(options.get("pageSize")).map(_.toInt).getOrElse(1000), 1),
      Option(options.get("includeAllUsers")).exists(_.toBoolean),
      FetcherRef(Option(options.get("fetcherKey")), Option(options.get("fetcherClass"))))
  }
}

private case class EngageSlicePartition(label: String, extraParams: String)
    extends InputPartition

private class HttpEngageScan(baseUrl: String, slices: Seq[(String, String)],
    pageSize: Int, includeAllUsers: Boolean, fetcherRef: FetcherRef)
    extends Scan with Batch {
  override def readSchema(): StructType = HttpEngageSource.schema
  override def toBatch: Batch = this
  override def description(): String =
    s"HttpEngageScan($baseUrl, ${slices.size} slice partitions)"
  override def planInputPartitions(): Array[InputPartition] =
    slices.map { case (l, p) => EngageSlicePartition(l, p) }.toArray
  override def createReaderFactory(): PartitionReaderFactory =
    new EngageReaderFactory(baseUrl, pageSize, includeAllUsers, fetcherRef)
}

private class EngageReaderFactory(baseUrl: String, pageSize: Int,
    includeAllUsers: Boolean, fetcherRef: FetcherRef)
    extends PartitionReaderFactory {

  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[EngageSlicePartition]
    val fetcher = fetcherRef.resolve()
    val mapper = new ObjectMapper()

    // Cursor walk as a lazy page iterator: first request has no
    // session_id/page; subsequent requests thread the server cursor,
    // stopping when a short page arrives (mixpanelETL.js:144-182).
    val pages: Iterator[Seq[String]] = new Iterator[Seq[String]] {
      private var page = 0
      private var sessionId: Option[String] = None
      // Termination compares against the SERVER-reported page_size
      // (captured from the first response, like the reference's
      // lastPageSize — mixpanelETL.js:144-182). Mixpanel caps page_size at
      // 1000: comparing against a larger client-requested value would see
      // every page as "short" and silently truncate each slice to one page.
      private var serverPageSize: Option[Int] = None
      private var lastCount = Int.MaxValue
      private var exhausted = false
      override def hasNext: Boolean =
        !exhausted && serverPageSize.forall(lastCount >= _)
      override def next(): Seq[String] = {
        val cursor = sessionId.map(s => s"&session_id=$s&page=$page").getOrElse("")
        val url = s"$baseUrl/api/2.0/engage?page_size=$pageSize" +
          s"&include_all_users=$includeAllUsers${p.extraParams}$cursor"
        fetcher.get(url) match {
          case None => exhausted = true; Seq.empty
          case Some(body) =>
            val root = mapper.readTree(new String(body, "UTF-8"))
            val results = Option(root.get("results"))
              .map(r => (0 until r.size()).map(i => mapper.writeValueAsString(r.get(i))))
              .getOrElse(Seq.empty)
            // capture-once (reference protocol): a mid-walk response
            // missing session_id must NOT reset the cursor — that would
            // restart the stream (duplicates, potential non-termination)
            sessionId = sessionId.orElse(Option(root.get("session_id")).map(_.asText()))
            serverPageSize = serverPageSize.orElse(
              Option(root.get("page_size")).map(_.asInt())).orElse(Some(pageSize))
            page = Option(root.get("page")).map(_.asInt()).getOrElse(page) + 1
            lastCount = results.size
            results
        }
      }
    }

    new PartitionReader[InternalRow] {
      private val rows = pages.flatten
      private var current: InternalRow = _
      override def next(): Boolean =
        if (rows.hasNext) {
          current = InternalRow(
            UTF8String.fromString(p.label), UTF8String.fromString(rows.next()))
          true
        } else false
      override def get(): InternalRow = current
      override def close(): Unit = ()
    }
  }
}
