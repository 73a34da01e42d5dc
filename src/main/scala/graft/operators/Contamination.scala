package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.Fns

/** Benchmark-contamination detection for training corpora: flag corpus
  * documents sharing word-n-gram overlap with a held-out evaluation set.
  *
  * Public provenance: the n-gram-overlap decontamination procedure described
  * in "Language Models are Few-Shot Learners" (Brown et al. 2020, Appendix C)
  * — eval documents are shingled into n-grams and any training document
  * containing a matching n-gram is flagged/filtered.
  *
  * 100 TB posture: the corpus side is shingled with the same relational
  * window formulation as the dedup family (one shuffle keyed on doc). The
  * benchmark side is an EVALUATION set — orders of magnitude smaller than
  * the corpus by construction — so its distinct n-gram hashes are
  * broadcast and the overlap check is a broadcast LEFT SEMI join: the
  * corpus never shuffles for the membership probe. N-gram strings are
  * collapsed to 64-bit rolling hashes before the join so the broadcast and
  * probe work on fixed-width longs, not text.
  */
object Contamination {

  /** Per-corpus-document overlap stats against `bench`'s n-gram set.
    *
    * Output: (idCol, n_grams, n_contaminated, contamination_frac,
    * contaminated) — one row per corpus document that has at least one
    * n-gram (documents shorter than n tokens carry no contamination
    * evidence and are omitted).
    */
  def ngramOverlap(
      corpus: DataFrame,
      bench: DataFrame,
      idCol: String,
      textCol: String,
      n: Int): DataFrame = {
    // (doc, shingle) distinct, then fixed-width hash for the probe join
    def hashedGrams(df: DataFrame): DataFrame =
      Dedup.shingleIndex(df, idCol, textCol, n)
        .select(col("doc"), Fns.rollingHash(col("s")).as("gh"))

    overlapStats(hashedGrams(corpus),
      hashedGrams(bench).select("gh").distinct(), idCol)
  }

  /** Single-scan variant for when corpus and benchmark live in ONE table
    * split by a flag (the common decontamination shape): shingle once,
    * carry the flag through the index, split after. Halves the
    * scan+shuffle work of [[ngramOverlap]] on the same input.
    */
  def ngramOverlapSplit(
      docs: DataFrame,
      isBench: Column,
      idCol: String,
      textCol: String,
      n: Int): DataFrame = {
    val grams = Dedup
      .shingleIndex(docs.withColumn("_is_bench", isBench), idCol, textCol, n,
        carry = Seq("_is_bench"))
      .select(col("doc"), col("_is_bench"), Fns.rollingHash(col("s")).as("gh"))
    overlapStats(
      grams.filter(!col("_is_bench")).select("doc", "gh"),
      grams.filter(col("_is_bench")).select("gh").distinct(), idCol)
  }

  /** Decontamination: the corpus MINUS documents whose benchmark n-gram
    * overlap exceeds `maxFrac` (Brown et al. 2020 remove at any overlap —
    * maxFrac = 0). Documents shorter than n tokens carry no contamination
    * evidence and are kept. The filter is a left-anti join against the
    * (small) flagged-id set, so the corpus passes through with one probe —
    * no extra shuffle beyond [[ngramOverlapSplit]]'s stats.
    */
  def decontaminate(
      docs: DataFrame,
      isBench: Column,
      idCol: String,
      textCol: String,
      n: Int,
      maxFrac: Double): DataFrame = {
    val flagged = ngramOverlapSplit(docs, isBench, idCol, textCol, n)
      .filter(col("contamination_frac") > maxFrac)
      .select(idCol)
    docs.filter(!isBench).join(flagged, Seq(idCol), "left_anti")
  }

  private def overlapStats(corpusGrams: DataFrame, benchGrams: DataFrame,
      idCol: String): DataFrame = {
    val totals = corpusGrams.groupBy("doc").agg(count(lit(1)).as("n_grams"))
    val overlap = corpusGrams
      .join(broadcast(benchGrams), Seq("gh"), "left_semi")
      .groupBy("doc").agg(count(lit(1)).as("n_cont"))

    totals
      .join(overlap, Seq("doc"), "left")
      .select(
        col("doc").as(idCol),
        col("n_grams"),
        coalesce(col("n_cont"), lit(0L)).as("n_contaminated"),
        round(coalesce(col("n_cont"), lit(0L)) / col("n_grams").cast("double"), 4)
          .as("contamination_frac"),
        (coalesce(col("n_cont"), lit(0L)) > 0).as("contaminated"))
  }
}
