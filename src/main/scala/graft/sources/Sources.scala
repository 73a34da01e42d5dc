package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** File/staged sources (SURVEY §2.1).
  *
  * The reference's extract machinery (zip/gzip shelling, GCS listing,
  * JSON-vs-NDJSON sniffing, streaming line readers — S3-S8) collapses into
  * Spark's distributed readers: `.gz` is transparent, directories are
  * scanned natively, malformed rows are PERMISSIVE-collected instead of
  * crashing a single-process loop. HTTP extracts stage to NDJSON first
  * (driver-side fetch, S9-S10), then read distributed.
  */
object Sources {

  /** S1/S2: CSV file or directory, header row, bad files tolerated. */
  def csv(spark: SparkSession, path: String): DataFrame =
    spark.read
      .option("header", "true")
      .option("mode", "PERMISSIVE")
      .csv(path)

  /** S7: NDJSON-first read with whole-file-JSON fallback — the reference's
    * dual-parse (extract/googleAnalytics.js:92-109) expressed as two read
    * modes. A schema makes reads strict-shaped; corrupt lines land in
    * `_corrupt_record` (F3/F7) and are split out, not dropped silently.
    */
  case class JsonRead(good: DataFrame, corrupt: DataFrame)

  def jsonAuto(spark: SparkSession, path: String, schema: StructType): JsonRead = {
    val withCorrupt = schema.add("_corrupt_record", org.apache.spark.sql.types.StringType)
    val ndjson = spark.read.schema(withCorrupt)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(path)
    // cache: corrupt-record split reads the source twice otherwise
    val cached = ndjson.cache()
    val corrupt = cached.filter(col("_corrupt_record").isNotNull)
    val good = cached.filter(col("_corrupt_record").isNull).drop("_corrupt_record")
    if (cached.limit(1).count() > 0 && good.limit(1).count() == 0) {
      // every line corrupt → probably a whole-file JSON array: re-read multiLine
      val multi = spark.read.schema(schema).option("multiLine", "true").json(path)
      JsonRead(multi, spark.emptyDataFrame)
    } else JsonRead(good, corrupt.select("_corrupt_record"))
  }

  /** S11: pre-extracted local path bypass — just a path to the reader. */
  def staged(spark: SparkSession, path: String, schema: StructType): DataFrame =
    jsonAuto(spark, path, schema).good

  /** S10: paginated HTTP source, generalized. Pagination is inherently
    * serial (page N's cursor comes from page N-1 — SURVEY §7.4.5), so the
    * driver walks pages to NDJSON staging, then the cluster reads the
    * staged files in parallel. `fetch(page)` returns the page's records as
    * JSON lines, or None when exhausted.
    */
  def paginatedToStaging(
      fetch: Int => Option[Seq[String]],
      stagingDir: String,
      maxPages: Int = 10000): Seq[String] = {
    val dir = java.nio.file.Paths.get(stagingDir)
    java.nio.file.Files.createDirectories(dir)
    Iterator.from(0).take(maxPages)
      .map(p => p -> fetch(p))
      .takeWhile(_._2.isDefined)
      .map { case (p, Some(lines)) =>
        val f = dir.resolve(f"page_$p%05d.json")
        java.nio.file.Files.write(f, lines.mkString("\n").getBytes("UTF-8"))
        f.toString
      }.toList
  }
}
