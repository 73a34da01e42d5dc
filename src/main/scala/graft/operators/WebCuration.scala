package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.Fns

/** Web-corpus curation operators: URL canonicalization, registered-domain
  * extraction, and canonical-URL deduplication — the normalization layer a
  * large-scale crawl pipeline runs before any content-level dedup (the
  * CCNet / C4 / RefinedWeb preprocessing shape: one crawl URL appears
  * under dozens of surface forms — scheme/host case, default ports,
  * `www.`, fragments, tracking parameters, parameter order, trailing
  * slashes — and each variant would defeat exact dedup downstream).
  *
  * Everything here is a pure `Column` expression over Spark's built-in
  * string/array functions (codegen'd, no UDFs, no shuffle until the
  * caller aggregates), and every rule is mirrored 1:1 by a DuckDB oracle
  * (RE2-safe patterns only — no lookahead/backreferences).
  */
object WebCuration {

  /** Multi-label public suffixes the registered-domain rule must treat as
    * one TLD unit (a deliberately small, deterministic subset of the
    * public-suffix list — the full list is a data file a deployment
    * broadcasts; the RULE is what the engine owns).
    */
  private val MultiLabelSuffixes = Seq(
    "co.uk", "org.uk", "com.au", "co.jp", "com.br", "co.in")

  private def suffixAlt: String =
    MultiLabelSuffixes.map(_.replace(".", "\\.")).mkString("|")

  private def hostPort(url: Column): Column =
    lower(regexp_extract(
      regexp_replace(url, "^[A-Za-z][A-Za-z0-9+.-]*://", ""), "^([^/?#]*)", 1))

  /** Lowercased host with `www.` and any `:port` stripped. */
  def hostOf(url: Column): Column =
    regexp_replace(regexp_replace(hostPort(url), ":[0-9]+$", ""), "^www\\.", "")

  /** eTLD+1: the last TWO labels of the host, or the last THREE when the
    * host ends in a multi-label public suffix (`a.b.co.uk` → `b.co.uk`).
    * Hosts with fewer labels than the rule needs collapse to themselves.
    */
  def registeredDomain(url: Column): Column = {
    val h = hostOf(url)
    when(h.rlike(s"(^|\\.)[^.]+\\.(?:$suffixAlt)$$"),
      regexp_extract(h, s"([^.]+\\.(?:$suffixAlt))$$", 1))
      .otherwise(
        when(h.rlike("(^|\\.)[^.]+\\.[^.]+$"),
          regexp_extract(h, "([^.]+\\.[^.]+)$", 1)).otherwise(h))
  }

  /** Canonical URL:
    *  - scheme and host lowercased; `www.` stripped
    *  - default ports dropped (`http:80`, `https:443`); others kept
    *  - fragment dropped
    *  - tracking parameters dropped (`utm_*`, `fbclid`, `gclid`, `ref`)
    *  - surviving query parameters SORTED (param order never
    *    distinguishes resources in practice, and unsorted order defeats
    *    exact dedup)
    *  - trailing slashes stripped from the path
    */
  def canonicalizeUrl(url: Column): Column = {
    val u = trim(url)
    val scheme = lower(regexp_extract(u, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val hp = hostPort(u)
    val port = regexp_extract(hp, ":([0-9]+)$", 1)
    val host = hostOf(u)
    val keepPort = (port =!= "") &&
      !((scheme === "http" && port === "80") ||
        (scheme === "https" && port === "443"))
    val afterHost = regexp_extract(
      regexp_replace(u, "^[A-Za-z][A-Za-z0-9+.-]*://", ""), "^[^/?#]*(.*)$", 1)
    val noFrag = regexp_replace(afterHost, "#.*$", "")
    val path = regexp_replace(regexp_extract(noFrag, "^([^?]*)", 1), "/+$", "")
    val rawQ = regexp_extract(noFrag, "\\?(.*)$", 1)
    val params = array_sort(filter(split(rawQ, "&"),
      p => (p =!= "") && !p.rlike("^(utm_[^=]*|fbclid|gclid|ref)=")))
    val q = concat_ws("&", params)
    concat(scheme, lit("://"), host,
      when(keepPort, concat(lit(":"), port)).otherwise(lit("")),
      path,
      when(q =!= "", concat(lit("?"), q)).otherwise(lit("")))
  }

  /** Canonical-URL dedup: one row per canonical URL with the occurrence
    * count and the first-seen (minimum) id — a single keyed aggregation,
    * the same one-shuffle posture as [[Dedup.exactFirstWins]] and safe at
    * any scale (canonical URLs are near-unique keys; no skew pile-up).
    */
  def urlDedup(docs: DataFrame, idCol: String, urlCol: String): DataFrame =
    docs.select(col(idCol).as("id"),
        canonicalizeUrl(col(urlCol)).as("canonical_url"))
      .groupBy("canonical_url")
      .agg(count(lit(1)).as("n_docs"), min(col("id")).as("keep_id"))

  /** Domain blocklist filter: drop every doc whose registered domain
    * appears in `blocked` (one `domain` column). An anti-join, so the
    * blocklist can be millions of rows — AQE broadcasts it while it fits
    * under the threshold and falls back to a keyed shuffle beyond (a
    * literal `isin` would inline the list into the plan and stop scaling
    * at a few thousand entries).
    */
  def blockDomains(docs: DataFrame, urlCol: String,
      blocked: DataFrame): DataFrame = {
    val bl = blocked.select(
      lower(trim(col(blocked.columns.head))).as("__blocked_domain"))
    docs.withColumn("registered_domain", registeredDomain(col(urlCol)))
      .join(bl, col("registered_domain") === col("__blocked_domain"), "left_anti")
  }

  /** Block-level tags that delimit content blocks for [[mainContent]] —
    * the jusText segmentation rule: a block is the text between block-tag
    * boundaries; inline tags (<a>, <b>, <span>, …) stay inside the block.
    */
  private val BlockTagAlt =
    "p|div|h[1-6]|li|ul|ol|td|tr|table|blockquote|section|article|header|footer|nav|br"

  /** Main-content extraction (boilerplate removal) — the text-density /
    * link-density block classifier every web-scale corpus pipeline runs
    * between raw HTML and quality filtering (jusText, Pomikálek 2011;
    * trafilatura uses the same block-score idea). [[graft.operators.TextAnalysis.stripMarkup]]
    * removes ALL markup indiscriminately, so nav bars, footers and legal
    * boilerplate survive into the "clean" text; this operator classifies
    * each block first and keeps only main-content blocks.
    *
    * Per block (text between block-level tags): `link_ppm` = chars of
    * <a>-anchored text ÷ block chars, `stop_ppm` = stopword-token
    * fraction ([[TextAnalysis.StopWords]]), `n_chars` after markup
    * strip — all ppm-integer via explicit floor (the oracle-parity
    * discipline). Classification: link-dominated → `bad`; tiny → `short`;
    * long + stopword-dense → `good`; else `neutral`. A context pass then
    * promotes short/neutral blocks SURROUNDED by good blocks on both
    * sides (the simplified rendering of jusText's neighborhood rule — an
    * either-side rule would wrongly re-admit headers adjacent to the
    * first paragraph) — one doc-partitioned window, no shuffle beyond
    * the doc key.
    *
    * Thresholds: jusText's canonical stopword bar is 0.30 against a
    * full per-language stoplist; [[TextAnalysis.StopWords]] is a 10-word
    * deterministic subset, so the default here is calibrated to the
    * corpus (measured median density 0.056 on `documents.text`).
    *
    * Scale shape: pure per-row column expressions (codegen'd regex +
    * HOF over the exploded block table), ONE window and ONE aggregation
    * both keyed on the doc id — shuffle carries block rows once.
    * Output: (doc, n_blocks, n_good, main_text).
    */
  def mainContent(docs: DataFrame, idCol: String, htmlCol: String,
      linkDensityMaxPpm: Long = 200000L, stopDensityMinPpm: Long = 30000L,
      minGoodChars: Int = 80, shortChars: Int = 40): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val blocks = docs
      .filter(col(idCol).isNotNull)
      .select(col(idCol).as("doc"),
        // case-insensitive + tag-name boundary: uppercase tags (<P>,
        // <DIV>) split too, while prefix lookalikes (<param>, <picture>,
        // <progress>, <track>, <link>) do NOT -- the tag name must be
        // followed by '>' or a whitespace/'/' attribute boundary. The
        // boundary is an alternation (not a lookahead) so the identical
        // pattern runs under the DuckDB oracle's RE2.
        posexplode(split(
          regexp_replace(col(htmlCol),
            s"(?i)</?($BlockTagAlt)(>|[\\s/][^>]*>)", "\u0001"),
          "\u0001")).as(Seq("bi", "raw")))
    val anchorInner =
      regexp_extract_all(col("raw"), lit("<a[^>]*>([^<]*)</a>"), lit(1))
    val scored = blocks
      .withColumn("text", TextAnalysis.stripMarkup(col("raw")))
      .filter(col("text") =!= "")
      .withColumn("link_chars",
        coalesce(aggregate(anchorInner, lit(0L),
          (acc, x) => acc + length(x)), lit(0L)))
      .withColumn("n_chars", length(col("text")))
      .withColumn("ts", Fns.tokens(col("text")))
      .withColumn("link_ppm", floor(col("link_chars") * lit(1000000.0) /
        greatest(col("n_chars"), lit(1))).cast("long"))
      .withColumn("stop_ppm", floor(
        size(filter(col("ts"), t => t.isin(TextAnalysis.StopWords: _*))) *
          lit(1000000.0) / greatest(size(col("ts")), lit(1))).cast("long"))
      .withColumn("cls",
        when(col("link_ppm") > linkDensityMaxPpm, "bad")
          .when(col("n_chars") < shortChars, "short")
          .when(col("stop_ppm") >= stopDensityMinPpm &&
            col("n_chars") >= minGoodChars, "good")
          .otherwise("neutral"))
    val byPos = Window.partitionBy("doc").orderBy("bi")
    val judged = scored.withColumn("keep",
      col("cls") === "good" ||
        ((col("cls") === "short" || col("cls") === "neutral") &&
          lag(col("cls"), 1).over(byPos) === "good" &&
          lead(col("cls"), 1).over(byPos) === "good"))
    judged.groupBy("doc").agg(
      count(lit(1)).as("n_blocks"),
      sum(when(col("keep"), 1L).otherwise(0L)).as("n_good"),
      coalesce(array_join(transform(array_sort(
          collect_list(when(col("keep"), struct(col("bi"), col("text"))))),
        s => s.getField("text")), " "), lit("")).as("main_text"))
  }
}
