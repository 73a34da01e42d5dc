package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.Fns

/** Large-scale deduplication operators for training-data pipelines.
  *
  * All variants are expressed as declarative DataFrame plans (shuffle on the
  * dedup key only, map-side partial aggregation, no driver-side loops) so
  * they scale linearly with input size on a cluster:
  *
  *  - exact: hash-groupBy on a canonical key
  *  - n-gram Jaccard: shingle inverted-index self-join (candidate pairs are
  *    generated only for docs sharing a shingle — never a full cross join)
  *  - MinHash+LSH: shingle → 32-hash signature → banded bucket join →
  *    exact-Jaccard verification of candidates only
  *  - SimHash: relational bit-vote formulation (explode × bit index)
  *  - embedding cosine: blocked pair generation with threshold filter
  *
  * Hash functions are the engine-portable [[Fns.rollingHash]] /
  * [[Fns.permuteHash]] so results are reproducible across engines
  * (DuckDB-oracle-verifiable).
  */
object Dedup {

  /** Exact dedup: first-wins per key, deterministic via row_number over
    * (orderCols). Returns the surviving rows.
    */
  def exactFirstWins(df: DataFrame, keyCols: Seq[String], orderCols: Seq[String]): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(orderCols.map(col): _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Canonical text-prefix fingerprint: first `k` whitespace tokens,
    * space-joined — a cheap normalization key for exact near-head dedup.
    * DuckDB equivalent: `array_to_string(toks[1:k], ' ')`.
    */
  def prefixKey(text: Column, k: Int): Column =
    concat_ws(" ", slice(Fns.tokens(text), 1, k))

  /** (doc_id, shingle) inverted index with per-doc distinct shingles. */
  private def shingleIndex(docs: DataFrame, idCol: String, textCol: String, n: Int): DataFrame =
    docs.select(col(idCol).as("doc"),
      explode(array_distinct(Fns.shingles(col(textCol), n))).as("s"))

  /** All-pairs n-gram Jaccard similarity ≥ threshold via inverted-index
    * join. Output: (id_a, id_b, jaccard) with id_a < id_b.
    *
    * `maxShingleFreq` (optional) drops shingles appearing in more than that
    * many docs before pairing — the standard stop-shingle cap that bounds
    * the join blowup at scale (a shingle in f docs yields f² pair rows).
    * Disabled (None) for oracle-exact runs.
    */
  def ngramJaccardPairs(docs: DataFrame, idCol: String, textCol: String,
      n: Int, threshold: Double, maxShingleFreq: Option[Int] = None): DataFrame = {
    val sh0 = shingleIndex(docs, idCol, textCol, n)
    val sh = maxShingleFreq match {
      case Some(cap) =>
        val freq = sh0.groupBy("s").agg(count(lit(1)).as("f")).filter(col("f") <= cap)
        sh0.join(freq.select("s"), "s")
      case None => sh0
    }
    val cnt = sh0.groupBy("doc").agg(count(lit(1)).as("n_sh"))
    val a = sh.select(col("doc").as("id_a"), col("s"))
    val b = sh.select(col("doc").as("id_b"), col("s"))
    val inter = a.join(b, Seq("s")).filter(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("inter"))
    inter
      .join(cnt.withColumnRenamed("doc", "id_a").withColumnRenamed("n_sh", "n_a"), "id_a")
      .join(cnt.withColumnRenamed("doc", "id_b").withColumnRenamed("n_sh", "n_b"), "id_b")
      .withColumn("jaccard", col("inter") / (col("n_a") + col("n_b") - col("inter")))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 4).as("jaccard"))
  }

  /** MinHash signature columns sig_0..sig_{k-1}: per doc, min over shingles
    * of the i-th permutation of the portable rolling hash. One explode +
    * one hash-aggregate (k min() columns) — a single shuffle.
    */
  def minhashSignatures(docs: DataFrame, idCol: String, textCol: String,
      n: Int, numHashes: Int): DataFrame = {
    val sh = shingleIndex(docs, idCol, textCol, n)
      .withColumn("h", Fns.rollingHash(col("s")))
    val aggs = (0 until numHashes).map(i => min(Fns.permuteHash(col("h"), i)).as(s"sig_$i"))
    sh.groupBy("doc").agg(aggs.head, aggs.tail: _*)
  }

  /** MinHash + LSH near-dup pairs: signatures are split into
    * `numHashes/bandSize` bands; docs sharing any band bucket become
    * candidates; candidates are verified with exact n-gram Jaccard.
    * Output: (id_a, id_b, jaccard) with id_a < id_b, jaccard ≥ threshold.
    *
    * At scale this replaces the all-pairs join with a bucket join whose
    * cost is Σ(bucket_size²) — the LSH parameters control that directly.
    */
  def minhashLshPairs(docs: DataFrame, idCol: String, textCol: String,
      n: Int, numHashes: Int, bandSize: Int, threshold: Double): DataFrame = {
    require(numHashes % bandSize == 0, "numHashes must be divisible by bandSize")
    val sig = minhashSignatures(docs, idCol, textCol, n, numHashes)
    val numBands = numHashes / bandSize
    // band key = "b:sig_i|sig_i+1|..." — explode to (doc, band, key)
    val bandCols = (0 until numBands).map { b =>
      val parts = (0 until bandSize).map(i => col(s"sig_${b * bandSize + i}"))
      struct(lit(b).as("band"), concat_ws("|", parts: _*).as("key"))
    }
    val buckets = sig.select(col("doc"), explode(array(bandCols: _*)).as("bk"))
      .select(col("doc"), col("bk.band").as("band"), col("bk.key").as("key"))
    val cand = buckets.select(col("doc").as("id_a"), col("band"), col("key"))
      .join(buckets.select(col("doc").as("id_b"), col("band"), col("key")), Seq("band", "key"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
    // verify candidates with exact jaccard
    ngramJaccardPairs(docs, idCol, textCol, n, threshold)
      .join(cand, Seq("id_a", "id_b"), "left_semi")
  }

  /** Relational SimHash: `bits`-wide signature per doc from per-token bit
    * votes. bit_j(w) = parity of permuteHash(rollingHash(w), j); the doc's
    * j-th output bit is 1 iff the sum of votes (+1/-1) over distinct tokens
    * is positive. Output: (doc, simhash-bitstring).
    */
  def simhash(docs: DataFrame, idCol: String, textCol: String, bits: Int): DataFrame = {
    val toks = docs.select(col(idCol).as("doc"),
      explode(array_distinct(Fns.tokens(col(textCol)))).as("w"))
      .filter(col("w") =!= "")
      .withColumn("h", Fns.rollingHash(col("w")))
    // vote = parity of (h*(2j+1)+j²+j+41) mod p  (permuteHash with j as a column)
    val votes = toks
      .select(col("doc"), col("h"), explode(sequence(lit(0), lit(bits - 1))).as("j"))
      .withColumn("v",
        when(((col("h") * (col("j") * 2 + 1) + (col("j") * col("j") + col("j") + 41)) % Fns.HashMod) % 2 === 0,
          lit(1)).otherwise(lit(-1)))
    votes.groupBy("doc", "j").agg(sum("v").as("s"))
      .groupBy("doc")
      .agg(array_join(
        transform(
          array_sort(collect_list(struct(col("j"), when(col("s") > 0, "1").otherwise("0").as("b")))),
          x => x.getField("b")),
        "").as("simhash"))
  }

  /** Embedding near-dup pairs: cosine ≥ threshold over all id_a < id_b
    * pairs. Exact variant (quadratic candidate generation) — use
    * [[graft.operators.Ann.hyperplaneBuckets]] blocking for the scale path.
    */
  def embeddingCosinePairs(emb: DataFrame, idCol: String, vecCol: String,
      threshold: Double): DataFrame = {
    val a = emb.select(col(idCol).as("id_a"), col(vecCol).as("va"))
    val b = emb.select(col(idCol).as("id_b"), col(vecCol).as("vb"))
    a.join(b, col("id_a") < col("id_b"))
      .withColumn("cos", Fns.cosine(col("va"), col("vb")))
      .filter(col("cos") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("cos"), 4).as("cos"))
  }
}
