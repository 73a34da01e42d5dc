package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.Fns

/** Text-analysis operators for training-data curation: token counting,
  * quality scoring, language identification (marker-word heuristic), and
  * document fingerprinting. All pure column expressions (whole-stage
  * codegen, no UDFs) — per-row cost, embarrassingly parallel at 100 TB.
  */
object TextAnalysis {

  /** Whitespace token count. */
  def tokenCount(text: Column): Column = size(Fns.tokens(text))

  /** BPE-ish subword token count: runs of letters, runs of digits, and
    * single other non-space chars — a cheap proxy for tokenizer cost
    * accounting. DuckDB: `len(regexp_extract_all(lower(s),'[a-z]+|[0-9]+|[^a-z0-9 ]'))`.
    */
  def subwordCount(text: Column): Column =
    size(regexp_extract_all(lower(text), lit("[a-z]+|[0-9]+|[^a-z0-9 ]"), lit(0)))

  val StopWords: Seq[String] =
    Seq("the", "a", "an", "of", "to", "and", "in", "is", "it", "for")

  /** Fraction of tokens that are stopwords, 4 decimals. */
  def stopwordRatio(text: Column): Column = {
    val ts = Fns.tokens(text)
    round(
      size(filter(ts, t => t.isin(StopWords: _*))) /
        greatest(size(ts), lit(1)).cast("double"), 4)
  }

  /** Fraction of non-space chars that are punctuation, 4 decimals. */
  def punctRatio(text: Column): Column = {
    val nonSpace = length(regexp_replace(text, "\\s", ""))
    val punct = length(regexp_replace(regexp_replace(text, "\\s", ""), "[a-zA-Z0-9]", ""))
    round(punct / greatest(nonSpace, lit(1)).cast("double"), 4)
  }

  /** Composite quality score in [0,1]: length sweet-spot × low punctuation ×
    * stopword presence (natural text has some). Deterministic arithmetic.
    */
  def qualityScore(text: Column): Column = {
    val nTok = tokenCount(text).cast("double")
    val lenScore = least(nTok / lit(50.0), lit(1.0))
    val punctScore = greatest(lit(0.0), lit(1.0) - punctRatio(text) * 4)
    val stopScore = least(stopwordRatio(text) * 5, lit(1.0))
    round((lenScore + punctScore + stopScore) / 3.0, 4)
  }

  /** Marker-word sets per language for the n-gram/stopword language-ID
    * heuristic. Tiny on purpose: language ID at pipeline scale is a
    * per-row score-and-argmax, and the marker table is broadcast-free
    * (inlined in the plan).
    */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "is", "to"),
    "es" -> Seq("el", "la", "de", "que", "y"),
    "fr" -> Seq("le", "la", "et", "les", "des"),
    "de" -> Seq("der", "die", "und", "das", "ist")
  )

  /** Predicted language: argmax of marker-token hits, ties broken by the
    * declaration order above; "und" (undetermined) when no marker hits.
    */
  def langId(text: Column): Column = {
    val ts = Fns.tokens(text)
    val scores = LangMarkers.map { case (lang, ms) =>
      lang -> size(filter(ts, t => t.isin(ms: _*)))
    }
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    scores.foldRight(lit("und"): Column) { case ((lang, sc), els) =>
      when(sc === best && sc > 0, lit(lang)).otherwise(els)
    }
  }

  /** Portable document fingerprint (rolling hash of the full text). */
  def fingerprint(text: Column): Column = Fns.rollingHash(text)
}
