package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.{Fns, RollingHash}

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

  /** (doc_id, shingle) inverted index with per-doc distinct shingles.
    *
    * Relational formulation — posexplode tokens, then window `lead` to
    * stitch n-grams — instead of a higher-order-function lambda:
    * HOF lambdas are interpreted per element (never whole-stage-codegen'd)
    * and measured ~10× slower at corpus scale. One shuffle on doc.
    */
  /** `carry` columns are per-doc constants to ride along (they join the
    * distinct key, which is harmless because they are functionally
    * dependent on doc).
    */
  private[graft] def shingleIndex(docs: DataFrame, idCol: String, textCol: String,
      n: Int, carry: Seq[String] = Nil): DataFrame = {
    val w = Window.partitionBy("doc").orderBy("p")
    val parts = (0 until n).map(k => if (k == 0) col("w") else lead("w", k).over(w))
    docs
      // normalize the pushed filter set: downstream equi-joins add
      // isnotnull(id) to SOME consumers of this subtree and not others,
      // and canonically-unequal children block ReuseExchange — with the
      // filter stated here every consumer's scan+tokenize subtree is
      // identical and the exchange is computed once per execution
      .filter(col(idCol).isNotNull)
      .select(col(idCol).as("doc") +: carry.map(col) :+
        posexplode(Fns.tokens(col(textCol))).as(Seq("p", "w")): _*)
      .withColumn("s", when(parts.last.isNotNull, concat_ws(" ", parts: _*)))
      .filter(col("s").isNotNull)
      .select(col("doc") +: carry.map(col) :+ col("s"): _*)
      .distinct()
  }

  /** Exact Jaccard of candidate pairs: inter = |shingles(a) ∩ shingles(b)|
    * via per-doc shingle ARRAYS and a codegen'd `array_intersect` — one
    * row per candidate pair, never one per shared shingle. The previous
    * exploded formulation (cand ⋈ index on id_a, then ⋈ index on
    * (id_b, s)) pushed |cand|·n̄_sh rows (66M at sf1, 22 s) through two
    * exchanges; the array form joins |cand| rows against a doc-grain
    * array table (two keyed equi-joins, payload = each doc's own
    * shingles — the same linear volume the corpus scan already carries)
    * and intersects per-row in whole-stage codegen. Exact string
    * equality — no hashing, no collision caveat. union = n_a + n_b −
    * inter from the array sizes, so the counts table is not needed.
    */
  private def verifyJaccard(cand: DataFrame, sh: DataFrame,
      threshold: Double): DataFrame = {
    // arrays for the whole index, not semi-joined to candidate docs: a
    // candidate-doc restriction re-evaluates the (expensive) candidate
    // subtree a second time — measured 2× slower at sf0.1 than just
    // aggregating the index once (the aggregate is one doc-keyed exchange
    // of data the corpus scan already carries)
    val arr = sh.groupBy("doc").agg(collect_list(col("s")).as("ss"))
    cand
      .join(arr.select(col("doc").as("id_a"), col("ss").as("ss_a")), "id_a")
      .join(arr.select(col("doc").as("id_b"), col("ss").as("ss_b")), "id_b")
      .withColumn("inter", size(array_intersect(col("ss_a"), col("ss_b"))))
      .withColumn("jaccard", col("inter") /
        (size(col("ss_a")) + size(col("ss_b")) - col("inter")))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 4).as("jaccard"))
  }

  /** All-pairs n-gram Jaccard similarity ≥ threshold — prefix-filtered
    * AllPairs/PPJoin (Bayardo et al. WWW'07, Xiao et al. WWW'08):
    *
    * Candidate generation joins only each doc's PREFIX — its
    * `n_sh - ceil(τ·n_sh) + 1` globally-rarest shingles (frequency-
    * ascending canonical order). The prefix-filter theorem guarantees any
    * pair with J ≥ τ shares a prefix shingle, so results are IDENTICAL to
    * the naive all-pairs join while the candidate join touches a small
    * fraction of the index (rare shingles have tiny fan-out). Candidates
    * are then verified with exact Jaccard over the full index.
    *
    * `maxShingleFreq` (optional) additionally drops ubiquitous shingles
    * from candidate generation — the stop-shingle cap for adversarial
    * corpora; it can drop pairs whose overlap is only stop-shingles, so
    * leave None for oracle-exact runs.
    *
    * Output: (id_a, id_b, jaccard) with id_a < id_b.
    */
  def ngramJaccardPairs(docs: DataFrame, idCol: String, textCol: String,
      n: Int, threshold: Double, maxShingleFreq: Option[Int] = None): DataFrame = {
    // The index feeds frequency ranking, per-doc counts, candidate
    // generation AND verification. No persist(): the branches share the
    // identical tokenize→window→distinct exchange subtree, which Spark's
    // ReuseExchangeAndSubquery collapses to ONE computation inside a
    // single execution — and unlike a persist() handle, reused exchanges
    // are owned by the execution (nothing leaks into the session to crowd
    // later queries' memory, and AQE sees fresh size stats).
    val sh = shingleIndex(docs, idCol, textCol, n)
    val cnt = sh.groupBy("doc").agg(count(lit(1)).as("n_sh"))
    val freq0 = sh.groupBy("s").agg(count(lit(1)).as("f"))
    val freq = maxShingleFreq.fold(freq0)(cap => freq0.filter(col("f") <= cap))
    // rank shingles per doc by global rarity; keep each doc's prefix.
    // NB: freq/cnt/prefix all grow linearly with the corpus — no broadcast
    // hints here. AQE picks broadcast when a side is genuinely under
    // autoBroadcastJoinThreshold and sort-merge otherwise, so the same plan
    // is safe at 100 TB (an unconditional hint would be a guaranteed OOM).
    val ranked = sh.join(freq, "s")
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("doc").orderBy("f", "s")))
    val prefix = ranked
      .join(cnt, "doc")
      .filter(col("rn") <= col("n_sh") - ceil(col("n_sh") * threshold) + 1)
      .select(col("doc"), col("s"), col("rn"), col("n_sh"))
    // candidates: docs sharing a prefix shingle, via a prefix self-join.
    // (Measured AGAINST the grouped-bucket pair explosion used in
    // minhashLshPairs: there the duplicated side is the expensive k-min
    // signature aggregate, here the duplicated prefix pipeline is cheap
    // and the equi-join broadcasts — the self-join won 5.5 s vs 10.6 s at
    // sf0.1. Per-shingle fan-out stays small by construction: the prefix
    // keeps each doc's rarest shingles; `maxShingleFreq` hard-caps
    // adversarial corpora.)
    //
    // Matched rows then pass PPJoin's LENGTH and POSITIONAL filters before
    // the distinct — both lossless, both plain codegen'd comparisons:
    //  - length: J ≥ τ implies min(|x|,|y|)/max(|x|,|y|) ≥ τ (overlap is
    //    at most the smaller set, union at least the larger).
    //  - positional: J ≥ τ implies overlap O ≥ τ/(1+τ)·(|x|+|y|). For the
    //    FIRST shared prefix shingle (positions rn_a, rn_b in the global
    //    frequency order), every shared shingle sits at position ≥ rn in
    //    both docs — any earlier shared shingle would itself be in both
    //    prefixes, contradicting firstness — so
    //    O ≤ min(n_a − rn_a, n_b − rn_b) + 1. A row failing the bound
    //    cannot be that first shared row of a true pair; the true pair's
    //    first-match row always passes, so keep-if-any-row-passes drops
    //    nothing (the 1e-9 slack keeps float rounding conservative; exact
    //    Jaccard verification remains the final arbiter either way).
    // Under `maxShingleFreq` capping, rn indexes surviving shingles only —
    // positions shift DOWN, the bound only loosens, still conservative.
    val eps = lit(1e-9)
    val alpha = lit(threshold / (1.0 + threshold)) * (col("n_a") + col("n_b")) - eps
    val cand = prefix
      .select(col("doc").as("id_a"), col("s"), col("rn").as("rn_a"), col("n_sh").as("n_a"))
      .join(prefix.select(
        col("doc").as("id_b"), col("s"), col("rn").as("rn_b"), col("n_sh").as("n_b")), Seq("s"))
      .filter(col("id_a") < col("id_b"))
      .filter(least(col("n_a"), col("n_b")) >=
        lit(threshold) * greatest(col("n_a"), col("n_b")) - eps)
      .filter(least(col("n_a") - col("rn_a"), col("n_b") - col("rn_b")) + lit(1) >= alpha)
      .select("id_a", "id_b").distinct()
    verifyJaccard(cand, sh, threshold)
  }

  /** Directed n-gram CONTAINMENT pairs: C(A→B) = |sh(A) ∩ sh(B)| / |sh(A)|
    * ≥ τ — the asymmetric near-dup measure resemblance (Jaccard) misses:
    * a snippet quoted inside a much larger doc has high containment but
    * tiny Jaccard (Broder 1997's two measures). Curation uses it to drop
    * subset documents whose content already rides inside a kept superset.
    *
    * Candidate generation is the asymmetric prefix filter: if C(A→B) ≥ τ
    * then A misses at most n_a − ceil(τ·n_a) shingles of its own set, so
    * A's `n_a − ceil(τ·n_a) + 1` globally-rarest shingles cannot ALL be
    * absent from B — joining only A's prefix against the FULL index is
    * lossless. No length filter applies (B may be arbitrarily larger —
    * that asymmetry is the point). Thresholds are integer ppm; the ceil
    * is exact integer arithmetic ((n·τppm + 999999) div 1e6), and the
    * verified score is floor-division ppm — hash-stable.
    *
    * `maxShingleFreq` caps candidate fan-out on adversarial corpora
    * (drops pairs whose overlap is only stop-shingles — leave None for
    * oracle-exact runs; same contract as [[ngramJaccardPairs]]).
    *
    * Output: (id_a, id_b, containment_ppm), directed — id_a is the
    * contained side. Both directions of a mutual near-dup both appear.
    */
  def containmentPairs(docs: DataFrame, idCol: String, textCol: String,
      n: Int, thresholdPpm: Long, maxShingleFreq: Option[Int] = None): DataFrame = {
    require(thresholdPpm >= 1L && thresholdPpm <= 1000000L,
      s"containmentPairs: thresholdPpm must be in [1, 1e6], got $thresholdPpm")
    val sh = shingleIndex(docs, idCol, textCol, n)
    val cnt = sh.groupBy("doc").agg(count(lit(1)).as("n_sh"))
    val freq0 = sh.groupBy("s").agg(count(lit(1)).as("f"))
    val freq = maxShingleFreq.fold(freq0)(cap => freq0.filter(col("f") <= cap))
    val ranked = sh.join(freq, "s")
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("doc").orderBy("f", "s")))
    val withN = ranked.join(cnt, "doc")
    val prefix = withN
      .filter(col("rn") <=
        col("n_sh") - expr(s"(n_sh * ${thresholdPpm}L + 999999L) div 1000000L") + 1)
      .select(col("doc").as("id_a"), col("s"),
        expr(s"(n_sh * ${thresholdPpm}L + 999999L) div 1000000L").as("need_a"))
    // positional filter on the INDEX side (the PPJoin argument, containment
    // form): for the pair's FIRST shared shingle under the global (f, s)
    // order, every shared shingle sits at rank ≥ rn_b in B, so
    // overlap ≤ n_b − rn_b + 1 — a true pair needs overlap ≥ ceil(τ·n_a),
    // and its first-match row always satisfies n_b − rn_b + 1 ≥ need_a, so
    // keep-if-any-row-passes drops nothing. (The A side's identical bound
    // IS the prefix condition — no extra filter there.) Measured at sf1:
    // candidates 11.5M → the surviving fraction, for 492k true pairs.
    val cand = prefix
      .join(withN.select(col("doc").as("id_b"), col("s"),
        col("rn").as("rn_b"), col("n_sh").as("n_b")), Seq("s"))
      .filter(col("id_a") =!= col("id_b"))
      .filter(col("n_b") - col("rn_b") + 1 >= col("need_a"))
      .select("id_a", "id_b").distinct()
    // exact verification via per-doc arrays + codegen'd array_intersect —
    // one row per pair (the verifyJaccard shape, same 4× sf1 win)
    val arr = sh.groupBy("doc").agg(collect_list(col("s")).as("ss"))
    cand
      .join(arr.select(col("doc").as("id_a"), col("ss").as("ss_a")), "id_a")
      .join(arr.select(col("doc").as("id_b"), col("ss").as("ss_b")), "id_b")
      .withColumn("inter",
        size(array_intersect(col("ss_a"), col("ss_b"))).cast("long"))
      .withColumn("n_a", size(col("ss_a")).cast("long"))
      .withColumn("containment_ppm", expr("(inter * 1000000) div n_a"))
      .filter(col("containment_ppm") >= thresholdPpm)
      .select("id_a", "id_b", "containment_ppm")
  }

  /** Transitive near-dup clusters: connected components over a near-dup
    * pair graph ((id_a, id_b) from any of the pair generators), labelling
    * every clustered doc with the smallest doc id reachable. Pairwise
    * keep-lowest (drop id_b of each pair) is NOT closure-correct when
    * similarity chains A~B~C without A~C — cluster-then-keep-one is the
    * policy a curation run needs. O(log n) keyed-shuffle rounds via
    * [[IdentityResolution.connectedComponents]].
    */
  def nearDupClusters(pairs: DataFrame): DataFrame =
    IdentityResolution.connectedComponents(
      pairs.select(col("id_a").as("src"), col("id_b").as("dst")))

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
    * cost is Σ(bucket_size²) — the LSH parameters control that directly
    * IN EXPECTATION, but a real web corpus has pathological buckets: a
    * boilerplate page repeated B=10⁴ times puts C(B,2)≈5·10⁷ pairs in ONE
    * bucket regardless of band width (Round13SkewSpec measures the
    * quadratic blowup). `hotBucketCap` is the escape hatch: a bucket
    * larger than the cap emits STAR pairs (its min doc × each other
    * member — B−1 rows instead of C(B,2)) rather than all pairs. For the
    * boilerplate corpora that create hot buckets the members ARE mutual
    * near-dups, so the star still verifies and still connects the whole
    * bucket into one dedup cluster via the min doc; the trade is that a
    * FALSE-positive hot bucket (distinct docs colliding) loses its
    * non-center pairs — acceptable for dedup clustering, wrong for exact
    * pair enumeration, hence opt-in (default ∞ = exact behavior, which
    * the dd_minhash_lsh oracle row pins). Both branches ride ONE
    * conditional explode over the same grouped-bucket aggregate, so the
    * expensive signature pipeline keeps exactly one consumer.
    */
  def minhashLshPairs(docs: DataFrame, idCol: String, textCol: String,
      n: Int, numHashes: Int, bandSize: Int, threshold: Double,
      hotBucketCap: Int = Int.MaxValue): DataFrame = {
    require(numHashes % bandSize == 0, "numHashes must be divisible by bandSize")
    require(hotBucketCap >= 2, s"bad hotBucketCap $hotBucketCap")
    val sig = minhashSignatures(docs, idCol, textCol, n, numHashes)
    val numBands = numHashes / bandSize
    // band key = "b:sig_i|sig_i+1|..." — explode to (doc, band, key)
    val bandCols = (0 until numBands).map { b =>
      val parts = (0 until bandSize).map(i => col(s"sig_${b * bandSize + i}"))
      struct(lit(b).as("band"), concat_ws("|", parts: _*).as("key"))
    }
    val buckets = sig.select(col("doc"), explode(array(bandCols: _*)).as("bk"))
      .select(col("doc"), col("bk.band").as("band"), col("bk.key").as("key"))
    // In-bucket pairs WITHOUT a bucket self-join: group each (band, key)
    // bucket into a sorted doc list and explode the i<j combinations. A
    // self-join would carry the whole signature pipeline on BOTH sides
    // (AQE's broadcast choice defeats ReuseExchange, so the expensive
    // explode+window+k-min aggregate would run twice); this single-lineage
    // shape computes signatures exactly once. Cost is the same Σ(bucket²)
    // the LSH parameters control, and the bucket rows stay bounded because
    // band width bounds bucket size in expectation.
    val hot = size(col("ds")) > hotBucketCap
    val cand = buckets.groupBy("band", "key")
      .agg(sort_array(collect_list(col("doc"))).as("ds"))
      .filter(size(col("ds")) > 1)
      // hot buckets collapse the left side to just the min doc (star
      // pairs); normal buckets keep the full i<j combination explode
      .select(posexplode(when(hot, slice(col("ds"), 1, 1))
        .otherwise(col("ds"))).as(Seq("i", "id_a")), col("ds"))
      .select(col("id_a"),
        explode(when(size(col("ds")) > hotBucketCap,
          slice(col("ds"), lit(2), size(col("ds")) - 1))
          .otherwise(slice(col("ds"), col("i") + lit(2),
            size(col("ds")) - col("i") - lit(1)))).as("id_b"))
      .distinct()
    // verify ONLY the candidates with exact jaccard (never all-pairs — at
    // scale the candidate set is the whole point of LSH). Shared subtrees
    // dedupe via exchange reuse — see ngramJaccardPairs.
    verifyJaccard(cand, shingleIndex(docs, idCol, textCol, n), threshold)
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
    // one vote SUM column per bit (integer, order-independent) — the
    // minhash multi-column-aggregate pattern: a single map-side-combined
    // shuffle of token rows instead of a ×bits explode
    def vote(j: Int) =
      when((Fns.permuteHash(col("h"), j) % 2) === 0, lit(1)).otherwise(lit(-1))
    val aggs = (0 until bits).map(j => sum(vote(j)).as(s"s_$j"))
    toks.groupBy("doc").agg(aggs.head, aggs.tail: _*)
      .select(col("doc"),
        concat((0 until bits).map(j =>
          when(col(s"s_$j") > 0, "1").otherwise("0")): _*).as("simhash"))
  }

  /** SimHash near-dup pairs with Hamming distance ≤ maxHamming, via the
    * k+1-block pigeonhole banding: any two signatures differing in ≤ k
    * bits agree on at least one of k+1 equal blocks, so candidates are
    * generated by a block-equality join (never all-pairs) and verified
    * with an exact Hamming count. Output: (id_a, id_b, hamming).
    */
  def simhashPairs(docs: DataFrame, idCol: String, textCol: String,
      bits: Int, maxHamming: Int): DataFrame = {
    val blocks = maxHamming + 1
    require(bits % blocks == 0, s"bits=$bits must divide into ${blocks} blocks")
    val blockLen = bits / blocks
    // sig is consumed by band explosion + two verify joins; the identical
    // aggregate exchange is computed once via exchange reuse (no persist —
    // see ngramJaccardPairs for why).
    val sig = simhash(docs, idCol, textCol, bits)
    val bands = sig.select(col("doc"),
      posexplode(array((0 until blocks).map(b =>
        substring(col("simhash"), b * blockLen + 1, blockLen)): _*)).as(Seq("band", "key")))
    val cand = bands.select(col("doc").as("id_a"), col("band"), col("key"))
      .join(bands.select(col("doc").as("id_b"), col("band"), col("key")), Seq("band", "key"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
    cand
      .join(sig.select(col("doc").as("id_a"), col("simhash").as("sig_a")), "id_a")
      .join(sig.select(col("doc").as("id_b"), col("simhash").as("sig_b")), "id_b")
      // exact verify on candidates only — HOF cost is fine at this volume
      .withColumn("hamming",
        aggregate(
          zip_with(split(col("sig_a"), ""), split(col("sig_b"), ""),
            (x, y) => when(x === y, 0).otherwise(1)),
          lit(0), (acc, v) => acc + v))
      .filter(col("hamming") <= maxHamming)
      .select(col("id_a"), col("id_b"), col("hamming"))
  }

  /** Embedding near-dup pairs: cosine ≥ threshold over all id_a < id_b
    * pairs — EXACT all-pairs, inherently O(n²). Expressed as a broadcast
    * DataFrame self-join (Spark's broadcast machinery ships the corpus —
    * no hand-rolled driver `collect()`) with the codegen'd
    * [[graft.functions.CosineSim]] kernel, so the whole
    * join→score→filter pipeline runs inside WholeStageCodegen without
    * materializing the pair set.
    *
    * Guarded by `maxExactRows` because the broadcast side and the pair
    * count both grow with the corpus: past the guard, use
    * [[embeddingCosinePairsBlocked]] (LSH-blocked candidates, sub-quadratic)
    * — that is the 100 TB path.
    */
  def embeddingCosinePairs(emb: DataFrame, idCol: String, vecCol: String,
      threshold: Double, maxExactRows: Long = 1000000L): DataFrame = {
    val vecs = emb.select(col(idCol).cast("long").as("id"),
      col(vecCol).cast("array<double>").as("v"))
    val n = vecs.count()
    require(n <= maxExactRows,
      s"exact all-pairs cosine over $n rows exceeds maxExactRows=$maxExactRows — " +
        "use embeddingCosinePairsBlocked (LSH-blocked) at this scale")
    val a = vecs.select(col("id").as("id_a"), col("v").as("va"))
    val b = vecs.select(col("id").as("id_b"), col("v").as("vb"))
    a.join(broadcast(b), col("id_a") < col("id_b"))
      .withColumn("c0", graft.functions.Fns.cosineSim(col("va"), col("vb")))
      .filter(col("c0") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("c0"), 4).as("cos"))
  }

  /** C4-style duplicate-span removal (Raffel et al. 2020, JMLR — "we
    * discarded all but one of any three-sentence span occurring more than
    * once"): the document is cut into fixed-size token chunks, every chunk
    * duplicated ANYWHERE in the corpus keeps only its globally-first
    * occurrence (min (doc, chunk_idx)), and surviving chunks are stitched
    * back into the cleaned document.
    *
    * Scale shape: chunking is a pure projection + generator (the token
    * array is sliced per row — no shuffle); the global first-occurrence
    * choice is ONE map-side-combined `min(struct)` aggregation keyed on
    * chunk text plus an equi-join back (never a corpus-wide window sort);
    * reassembly is one aggregation keyed on doc. Three keyed shuffles
    * total, each linear in corpus size.
    *
    * Output: (doc, n_chunks, n_kept, cleaned) — docs whose every chunk
    * lost dedup come back with n_kept = 0 and an empty cleaned text.
    */
  def chunkDedup(docs: DataFrame, idCol: String, textCol: String,
      chunkSize: Int): DataFrame = {
    val ts = Fns.tokens(col(textCol))
    val nChunks = ceil(size(ts) / lit(chunkSize.toDouble)).cast("int")
    val chunkArr = transform(sequence(lit(0), greatest(nChunks, lit(1)) - 1),
      i => concat_ws(" ", slice(ts, i * chunkSize + 1, lit(chunkSize))))
    val chunks = docs
      // isnotnull stated once so every branch's scan subtree is canonically
      // identical and the exchange is reused, not recomputed (see shingleIndex)
      .filter(col(idCol).isNotNull && size(ts) > 0)
      .select(col(idCol).as("doc"), posexplode(chunkArr).as(Seq("ci", "chunk")))
    val winners = chunks.groupBy("chunk")
      .agg(min(struct(col("doc"), col("ci"))).as("w"))
    val kept = chunks.join(winners, "chunk")
      .filter(struct(col("doc"), col("ci")) === col("w"))
    val rebuilt = kept.groupBy("doc").agg(
      count(lit(1)).as("n_kept"),
      array_join(transform(array_sort(collect_list(struct(col("ci"), col("chunk")))),
        s => s.getField("chunk")), " ").as("cleaned"))
    chunks.groupBy("doc").agg(count(lit(1)).as("n_chunks"))
      .join(rebuilt, Seq("doc"), "left")
      .select(col("doc"), col("n_chunks"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("cleaned"), lit("")).as("cleaned"))
  }

  /** Incremental NEAR-dup gate — the ingest-time sibling of
    * [[incrementalDedup]] (which routes EXACT keys): new documents that
    * are MinHash-LSH near-duplicates OF THE EXISTING CORPUS are dropped;
    * survivors pass through. In a deployment the corpus band table is the
    * prebuilt, persisted index (signatures never recompute over the
    * corpus per batch — the IvfPqIndex serve contract); candidates are
    * one keyed band join of the (small) batch bands against it, verified
    * with exact Jaccard at pair grain. Within-batch duplicates are NOT
    * this operator's job ([[minhashLshPairs]] over the batch is) —
    * candidates are strictly cross-set. Ids must be disjoint across the
    * two inputs. Output: the kept rows of `newDocs`.
    */
  /** MinHash-LSH band table (doc, band, key) — the persistable corpus
    * index for [[incrementalNearDupServe]].
    */
  def nearDupBandTable(docs: DataFrame, idCol: String, textCol: String,
      n: Int, numHashes: Int, bandSize: Int): DataFrame = {
    require(numHashes % bandSize == 0, "numHashes must be divisible by bandSize")
    val numBands = numHashes / bandSize
    val sig = minhashSignatures(docs, idCol, textCol, n, numHashes)
    val bandCols = (0 until numBands).map { b =>
      val parts = (0 until bandSize).map(i => col(s"sig_${b * bandSize + i}"))
      struct(lit(b).as("band"), concat_ws("|", parts: _*).as("key"))
    }
    sig.select(col("doc"), explode(array(bandCols: _*)).as("bk"))
      .select(col("doc"), col("bk.band").as("band"), col("bk.key").as("key"))
  }

  /** 1-row build-parameter record to persist ALONGSIDE a prebuilt band
    * table: a probe whose (n, numHashes, bandSize) differ from the build's
    * produces zero band-key collisions and silently waves every
    * near-duplicate through the gate — [[requireNearDupIndexMeta]] turns
    * that silent miss into a loud failure at probe time.
    */
  def nearDupIndexMeta(spark: SparkSession, n: Int, numHashes: Int,
      bandSize: Int): DataFrame =
    spark.range(1).select(lit(n).as("n"), lit(numHashes).as("num_hashes"),
      lit(bandSize).as("band_size"))

  def requireNearDupIndexMeta(meta: DataFrame, n: Int, numHashes: Int,
      bandSize: Int): Unit = {
    val rows = meta.select(col("n"), col("num_hashes"), col("band_size"))
      .collect()
    require(rows.length == 1,
      s"near-dup index metadata must be exactly 1 row, got ${rows.length}")
    val r = rows(0)
    val (bn, bh, bb) = (r.getInt(0), r.getInt(1), r.getInt(2))
    require(bn == n && bh == numHashes && bb == bandSize,
      s"near-dup index built with (n=$bn, numHashes=$bh, bandSize=$bb) " +
        s"but probed with (n=$n, numHashes=$numHashes, bandSize=$bandSize)")
  }

  def incrementalNearDup(newDocs: DataFrame, corpus: DataFrame,
      idCol: String, textCol: String, n: Int, numHashes: Int, bandSize: Int,
      threshold: Double): DataFrame =
    incrementalNearDupServe(newDocs,
      nearDupBandTable(corpus, idCol, textCol, n, numHashes, bandSize),
      shingleIndex(corpus, idCol, textCol, n),
      idCol, textCol, n, numHashes, bandSize, threshold)

  /** [[incrementalNearDup]] against a PREBUILT corpus index (band table +
    * shingle index, both persistable parquet — built once by
    * [[nearDupBandTable]]/shingleIndex, probed per batch): the
    * steady-state ingest gate never recomputes corpus signatures.
    */
  def incrementalNearDupServe(newDocs: DataFrame, corpusBands: DataFrame,
      corpusShingles: DataFrame, idCol: String, textCol: String, n: Int,
      numHashes: Int, bandSize: Int, threshold: Double): DataFrame = {
    val cand = nearDupBandTable(newDocs, idCol, textCol, n, numHashes, bandSize)
      .join(corpusBands.select(col("doc").as("id_b"), col("band"), col("key")),
        Seq("band", "key"))
      .select(col("doc").as("id_a"), col("id_b"))
      .distinct()
    val sh = shingleIndex(newDocs, idCol, textCol, n)
      .unionByName(corpusShingles)
    val dupNew = verifyJaccard(cand, sh, threshold)
      .select(col("id_a").as(idCol)).distinct()
    newDocs.join(dupNew, Seq(idCol), "left_anti")
  }

  /** [[incrementalNearDupServe]] with the persisted build-parameter check:
    * `corpusMeta` is the 1-row [[nearDupIndexMeta]] table written next to
    * the index; probe parameters must equal build parameters or this
    * fails loudly instead of silently passing near-dups through.
    */
  def incrementalNearDupServeChecked(newDocs: DataFrame,
      corpusBands: DataFrame, corpusShingles: DataFrame, corpusMeta: DataFrame,
      idCol: String, textCol: String, n: Int, numHashes: Int, bandSize: Int,
      threshold: Double): DataFrame = {
    requireNearDupIndexMeta(corpusMeta, n, numHashes, bandSize)
    incrementalNearDupServe(newDocs, corpusBands, corpusShingles,
      idCol, textCol, n, numHashes, bandSize, threshold)
  }

  /** Content-defined chunking + first-wins chunk dedup — the SHIFT-ROBUST
    * sibling of [[chunkDedup]] (FastCDC/rsync's gear-hash idea rendered
    * over tokens): a chunk boundary falls AFTER any token whose w-token
    * rolling gear hash satisfies `g % 2^maskBits == 0`, so boundaries are
    * a function of local CONTENT, not position — inserting one token
    * early in a near-duplicate document shifts every fixed-width chunk
    * but leaves all content-defined chunks beyond the edit identical,
    * which is exactly what lets the first-wins pass dedup them.
    *
    * Plan: positioned tokens → per-token gear hash g = Σ_{k<w}
    * hash(token_{p-k})·31^k mod p (w explicit lag terms over ONE
    * doc-partitioned window — no self-join), boundary flags → prefix-sum
    * chunk ids (same window) → chunk reassembly + the chunkDedup
    * winner/rebuild shape. Expected chunk length = 2^maskBits tokens.
    * Output: (doc, n_chunks, n_kept, cleaned) — chunkDedup's contract.
    */
  /** Rolling gear hash g = Σ_{k<window} h_{p-k}·31^k mod p over an `h`
    * column already reduced mod [[RollingHash.Mod]]. Each lag term is
    * < Mod (~1e9); the 31^k coefficient is REDUCED mod p before the
    * multiply so every product stays < Mod² (~1e18 < Long.MaxValue) even
    * at window=8, where the raw 31^7 (~2.75e10) coefficient would silently
    * overflow Long. Per-term pmod is bit-identical for windows 1–7 (no
    * overflow there), so existing oracles are unchanged.
    */
  private[graft] def gearExpr(window: Int,
      byPos: org.apache.spark.sql.expressions.WindowSpec): Column =
    (0 until window).map { k =>
      val term = if (k == 0) col("h") else lag(col("h"), k, 0L).over(byPos)
      val coef = (0 until k).foldLeft(1L)((a, _) => a * 31 % RollingHash.Mod)
      pmod(term * coef, lit(RollingHash.Mod))
    }.reduce(_ + _) % lit(RollingHash.Mod)

  def cdcChunkDedup(docs: DataFrame, idCol: String, textCol: String,
      window: Int = 4, maskBits: Int = 3): DataFrame = {
    require(window >= 1 && window <= 8, s"bad window $window")
    require(maskBits >= 1 && maskBits <= 16, s"bad maskBits $maskBits")
    val mask = 1L << maskBits
    val toks = docs
      .filter(col(idCol).isNotNull)
      .select(col(idCol).as("doc"),
        posexplode(Fns.tokens(col(textCol))).as(Seq("p", "w0")))
      .filter(col("w0") =!= "")
      .withColumn("h", Fns.rollingHash(col("w0")))
    val byPos = Window.partitionBy("doc").orderBy("p")
    val gear = gearExpr(window, byPos)
    val flagged = toks.withColumn("b",
      when(pmod(gear, lit(mask)) === 0, 1L).otherwise(0L))
    // chunk id = boundaries BEFORE this token (boundary cuts AFTER the
    // flagged token, so the flagged token closes its chunk)
    val withChunk = flagged.withColumn("ci",
      coalesce(sum(col("b")).over(byPos.rowsBetween(
        Window.unboundedPreceding, -1)), lit(0L)))
    val chunks = withChunk.groupBy("doc", "ci")
      .agg(array_join(transform(array_sort(collect_list(struct(col("p"), col("w0")))),
        s => s.getField("w0")), " ").as("chunk"))
      .select(col("doc"), col("ci"), col("chunk"))
    val winners = chunks.groupBy("chunk")
      .agg(min(struct(col("doc"), col("ci"))).as("w"))
    val kept = chunks.join(winners, "chunk")
      .filter(struct(col("doc"), col("ci")) === col("w"))
    val rebuilt = kept.groupBy("doc").agg(
      count(lit(1)).as("n_kept"),
      array_join(transform(array_sort(collect_list(struct(col("ci"), col("chunk")))),
        s => s.getField("chunk")), " ").as("cleaned"))
    chunks.groupBy("doc").agg(count(lit(1)).as("n_chunks"))
      .join(rebuilt, Seq("doc"), "left")
      .select(col("doc"), col("n_chunks"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("cleaned"), lit("")).as("cleaned"))
  }

  /** Cross-document exact-substring duplication statistics (Lee et al.
    * 2022, "Deduplicating Training Data Makes Language Models Better",
    * arXiv:2107.06499 §3 ExactSubstr; MassiveText's duplicate-content
    * fraction, Rae et al. 2021 §A.1.2). Every `w`-token window of every
    * document — BY POSITION, repeats included — is matched against the
    * corpus; a window is duplicated when the identical token sequence
    * occurs in at least `minDocs` (default 2) DISTINCT documents. Output
    * per doc: (doc, n_windows, n_dup_windows, dup_frac) — the gate signal
    * for dropping or trimming mass-duplicated boilerplate. Docs shorter
    * than `w` tokens emit no windows and are absent from the output.
    *
    * True suffix-array ExactSubstr does not distribute; fixed-width
    * windows are the standard cluster-scale approximation (a duplicated
    * run of length ≥ w is caught by construction). Plan: the same
    * posexplode + lead-window stitching as [[shingleIndex]] but WITHOUT
    * the per-doc distinct (positions count), then one groupBy on the
    * window hash for corpus doc-frequencies, one join back, one groupBy
    * doc — every shuffle keyed, map-side combined, linear in corpus
    * tokens. The shuffle key is a 128-BIT HASH of the window text —
    * `(xxhash64(s), xxhash64(1, s))`, 16 bytes instead of w words
    * (50-500 bytes at w=5..50): the dominant cost of this operator at
    * corpus scale is exactly these shuffles' bytes. Collision odds at
    * 128 bits are ~n²/2¹²⁹ — ~10⁻²⁰ even at 10¹⁰ windows — and a
    * collision only conflates two window texts' doc-frequencies, the
    * standard hashed-shingle trade every MinHash pipeline already makes.
    */
  def substringDupStats(docs: DataFrame, idCol: String, textCol: String,
      w: Int, minDocs: Int = 2): DataFrame = {
    require(w >= 2, s"window width must be >= 2, got $w")
    val win = Window.partitionBy("doc").orderBy("p")
    val parts = (0 until w).map(k => if (k == 0) col("tok") else lead("tok", k).over(win))
    val wins = docs
      .select(col(idCol).as("doc"),
        posexplode(Fns.tokens(col(textCol))).as(Seq("p", "tok")))
      .withColumn("s", when(parts.last.isNotNull, concat_ws(" ", parts: _*)))
      .filter(col("s").isNotNull)
      .select(col("doc"),
        struct(xxhash64(col("s")).as("h1"), xxhash64(lit(1L), col("s")).as("h2")).as("sh"))
    val dupWins = wins.groupBy("sh")
      .agg(countDistinct(col("doc")).as("nd"))
      .filter(col("nd") >= minDocs)
      .select(col("sh"), lit(1L).as("isdup"))
    wins
      .join(dupWins, Seq("sh"), "left")
      .groupBy("doc")
      .agg(count(lit(1)).as("n_windows"),
        sum(coalesce(col("isdup"), lit(0L))).as("n_dup_windows"))
      .select(col("doc"), col("n_windows"), col("n_dup_windows"),
        round(col("n_dup_windows") / col("n_windows").cast("double"), 4)
          .as("dup_frac"))
  }

  /** Cross-document exact-substring REMOVAL — the transform side of
    * [[substringDupStats]] (Lee et al. 2022, arXiv:2107.06499 §3: all but
    * the first occurrence of a duplicated span are cut from the corpus).
    * A window (w consecutive tokens) duplicated across ≥ `minDocs`
    * distinct docs (with `crossDocOnly=false`: ≥ `minDocs` total
    * occurrences, within-doc repeats included) keeps its globally-first
    * occurrence (smallest
    * (doc, position) — deterministic) and every other occurrence is
    * removed: the tokens it covers are dropped and the document is
    * reassembled from the survivors. Output per doc:
    * (doc, n_tokens, n_kept, cleaned); docs shorter than `w` pass
    * through untouched, docs that lose everything survive with
    * n_kept = 0 (accounting, like [[chunkDedup]]).
    *
    * Plan: winner-per-window is ONE map-side-combined `min(struct)`
    * aggregation (the [[chunkDedup]]/[[keepBestPerKey]] shape — never a
    * corpus-wide window sort over occurrences); covered positions explode
    * to ≤ w rows per removed occurrence; the token drop is a keyed
    * left-anti join; reassembly groups by doc. Everything is linear in
    * corpus tokens with keyed shuffles only. Per-doc `collect_list`
    * during reassembly is bounded by document length — the pipeline
    * chunking contract.
    */
  def substringDedup(docs: DataFrame, idCol: String, textCol: String,
      w: Int, minDocs: Int = 2, crossDocOnly: Boolean = true): DataFrame = {
    require(w >= 2, s"window width must be >= 2, got $w")
    val win = Window.partitionBy("doc").orderBy("p")
    val parts = (0 until w).map(k => if (k == 0) col("tok") else lead("tok", k).over(win))
    // isnotnull stated once so every branch's scan subtree is canonically
    // identical and the exchange is reused, not recomputed (see shingleIndex)
    val toks = docs.filter(col(idCol).isNotNull)
      .select(col(idCol).as("doc"),
        posexplode(Fns.tokens(col(textCol))).as(Seq("p", "tok")))
    // 128-bit window hash as the shuffle/join key (16 bytes, not w words)
    // — same collision contract as [[substringDupStats]]
    val wins = toks
      .withColumn("s", when(parts.last.isNotNull, concat_ws(" ", parts: _*)))
      .filter(col("s").isNotNull)
      .select(col("doc"), col("p"),
        struct(xxhash64(col("s")).as("h1"), xxhash64(lit(1L), col("s")).as("h2")).as("sh"))
    // crossDocOnly=true: a span is duplicated when >= minDocs DISTINCT
    // docs carry it (the stats-side contract). crossDocOnly=false is the
    // full Lee et al. semantics: ANY repeat — including within one doc —
    // counts, so minDocs gates total OCCURRENCES (default 2 = any repeat).
    val dupCount =
      if (crossDocOnly) countDistinct(col("doc")) else count(lit(1))
    val minCount = minDocs
    val dupFirst = wins.groupBy("sh")
      .agg(dupCount.as("nd"),
        min(struct(col("doc"), col("p"))).as("first"))
      .filter(col("nd") >= minCount)
      .select("sh", "first")
    val losers = wins.join(dupFirst, "sh")
      .filter(struct(col("doc"), col("p")) =!= col("first"))
    val covered = losers
      .select(col("doc"), explode(sequence(col("p"), col("p") + lit(w - 1))).as("p"))
      .distinct()
    val kept = toks.join(covered, Seq("doc", "p"), "left_anti")
    val rebuilt = kept.groupBy("doc").agg(
      count(lit(1)).as("n_kept"),
      array_join(transform(array_sort(collect_list(struct(col("p"), col("tok")))),
        s => s.getField("tok")), " ").as("cleaned"))
    toks.groupBy("doc").agg(count(lit(1)).as("n_tokens"))
      .join(rebuilt, Seq("doc"), "left")
      .select(col("doc"), col("n_tokens"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("cleaned"), lit("")).as("cleaned"))
  }

  /** Corpus-wide exact LINE dedup — the boilerplate-removal rule of the
    * C4 lineage (Raffel et al. 2020 §2.2 deduplicates repeated spans
    * corpus-wide; CCNet and most open curation stacks run the per-LINE
    * variant): every distinct non-empty line keeps its globally first
    * occurrence (smallest (doc, line_idx) — deterministic) and all other
    * occurrences are dropped; each document is reassembled from its
    * surviving lines in order. Headers, footers, navigation chrome,
    * cookie banners — lines repeated across pages — vanish from all but
    * the first page carrying them. EMPTY lines are exempt (they always
    * survive): deduping them would collapse every paragraph break in the
    * corpus onto one page. Output per doc: (doc, n_lines, n_kept,
    * cleaned); a doc whose every line is claimed elsewhere survives with
    * n_kept = 0 (accounting, like [[chunkDedup]]).
    *
    * Plan: lines posexplode (linear in corpus); winner per line is ONE
    * map-side-combined min(struct) aggregation keyed by a 128-bit line
    * hash (16-byte shuffle keys, the [[substringDedup]] collision
    * contract — line text never shuffles in the winner agg); the drop is
    * a keyed join + struct-inequality filter feeding a keyed left-anti;
    * reassembly groups by doc with a per-doc-bounded collect_list. Keyed
    * shuffles only — no corpus-wide window or sort.
    */
  def lineDedup(docs: DataFrame, idCol: String, textCol: String,
      delim: String = "\n"): DataFrame = {
    val lines = docs.filter(col(idCol).isNotNull)
      .select(col(idCol).as("doc"),
        posexplode(split(col(textCol),
          java.util.regex.Pattern.quote(delim))).as(Seq("p", "line")))
    val keyed = lines.filter(length(trim(col("line"))) > 0)
      .select(col("doc"), col("p"), Fns.lineKey128(col("line")).as("lh"))
    val first = keyed.groupBy("lh")
      .agg(min(struct(col("doc"), col("p"))).as("first"))
    val losers = keyed.join(first, "lh")
      .filter(struct(col("doc"), col("p")) =!= col("first"))
      .select("doc", "p")
    val kept = lines.join(losers, Seq("doc", "p"), "left_anti")
    val rebuilt = kept.groupBy("doc").agg(
      count(lit(1)).as("n_kept"),
      array_join(transform(array_sort(collect_list(struct(col("p"), col("line")))),
        s => s.getField("line")), delim).as("cleaned"))
    lines.groupBy("doc").agg(count(lit(1)).as("n_lines"))
      .join(rebuilt, Seq("doc"), "left")
      .select(col("doc"), col("n_lines"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("cleaned"), lit("")).as("cleaned"))
  }

  /** Dedup audit: histogram of exact-duplicate cluster sizes under
    * `keyCols` — for each cluster size s, how many clusters have exactly s
    * members and how many documents they hold. Two keyed aggregations (the
    * second over ≤ |distinct sizes| ≪ n rows); the corpus shuffles once.
    * The (1, n₁) row is the unique mass; Σ over s>1 of n_docs - n_clusters
    * is exactly what exact dedup would remove — the audit that sizes a
    * dedup pass BEFORE running it.
    */
  def dupClusterHistogram(df: DataFrame, keyCols: Seq[String]): DataFrame =
    df.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("cluster_size"))
      .groupBy("cluster_size")
      .agg(count(lit(1)).as("n_clusters"),
        sum("cluster_size").cast("long").as("n_docs"))

  /** Keep the best row per key WITHOUT a window sort: one map-side-combined
    * `min(struct(rank…, payload…))` aggregation — the scale-correct form of
    * `row_number() = 1` when only the winner is needed (the window form
    * shuffles AND sorts every row; this shuffles one partially-aggregated
    * struct per key per map task). Rank columns order ascending, so pass
    * e.g. `-n_chars` for keep-largest; include a unique id to break ties
    * deterministically. Payload columns ride along and are returned.
    */
  def keepBestPerKey(df: DataFrame, keyCols: Seq[String], rankCols: Seq[Column],
      payloadCols: Seq[String], countAs: Option[String] = None): DataFrame = {
    val ranked = struct(
      rankCols.zipWithIndex.map { case (c, i) => c.as(s"__r$i") } ++
        payloadCols.map(col): _*)
    // group-size accounting rides the SAME aggregation when requested
    // (countAs = output column name) — never a second pass over the input
    val aggs = min(ranked).as("__best") +:
      countAs.map(n => count(lit(1)).as(n)).toSeq
    df.groupBy(keyCols.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
      .select(keyCols.map(col) ++
        payloadCols.map(c => col(s"__best.$c").as(c)) ++
        countAs.map(col).toSeq: _*)
  }

  /** Default ceiling on the within-cluster pair volume Σ(cluster²) a
    * [[semanticDedup]] call may generate — the `maxExactRows` pattern from
    * [[embeddingCosinePairs]]: the guard exists so an under-clustered call
    * fails loudly with sizing guidance instead of silently attempting a
    * near-quadratic join at corpus scale.
    */
  val SemanticDedupMaxPairComparisons: Long = 100000000L

  /** Cluster-count sizing for [[semanticDedup]]: nLists ≈ n / target so the
    * EXPECTED cluster size — and with it the Σ(cluster²) ≈ n·target pair
    * volume — stays constant as the corpus grows. With no target the
    * default is ⌈√n⌉ clusters (the SemDeDup paper's regime, §3 of
    * arXiv:2303.09540 uses k ~ √n), making pair volume O(n^1.5). A
    * CONSTANT nLists is the one choice that does not survive scale-up:
    * Σ(cluster²) ≈ n²/nLists is all-pairs in disguise.
    */
  def semanticDedupNLists(n: Long, targetClusterSize: Option[Long] = None): Int = {
    val raw = targetClusterSize match {
      case Some(t) =>
        require(t > 0, s"targetClusterSize must be positive, got $t")
        math.ceil(n.toDouble / t.toDouble)
      case None => math.ceil(math.sqrt(n.toDouble.max(1.0)))
    }
    math.max(1, math.min(raw, n.toDouble.max(1.0)).toInt)
  }

  /** Semantic deduplication (SemDeDup, Abbas et al. 2023, arXiv:2303.09540):
    * cluster embeddings with k-means, compare vectors ONLY within their
    * cluster, and keep one representative per connected duplicate group.
    * The k-means step is the deterministic [[Ann.ivfAssignments]] (the same
    * coarse quantizer the IVF index uses); within-cluster pairing is a
    * centroid-keyed equi-join (Σ cluster² — nLists dials the cost exactly
    * like the paper's k); transitive groups collapse via
    * [[nearDupClusters]] so chains A~B~C keep exactly one doc. The kept
    * representative is the smallest vector id of each group (the paper
    * keeps one arbitrary member; smallest-id is the deterministic choice).
    *
    * Scale contract: `nLists` must GROW with the corpus — size it with
    * [[semanticDedupNLists]] (n/target, √n default) or call
    * [[semanticDedupAuto]]. The realized pair volume Σ(cluster²) is
    * computed from the actual assignments (one tiny aggregation over
    * nLists rows) and the call REFUSES to run past `maxPairComparisons` —
    * under-clustering at 100× data is an all-pairs join in disguise, and
    * the failure must be loud, not a hung stage.
    *
    * Output: surviving (vid, centroid) rows — input minus semantic dups.
    */
  def semanticDedup(emb: DataFrame, idCol: String, vecCol: String,
      nLists: Int, threshold: Double,
      maxPairComparisons: Long = SemanticDedupMaxPairComparisons): DataFrame = {
    val (assign, _) = Ann.ivfAssignments(emb, idCol, vecCol, nLists)
    // Pair-volume guard: Σ over clusters of size² from the realized
    // assignment — an aggregation over ≤ nLists rows, negligible next to
    // the pairing join it gates.
    val pairVolume = Option(assign.groupBy("centroid").agg(count(lit(1)).as("cn"))
      .agg(sum(col("cn") * col("cn")).as("pv"))
      .head().get(0)).map(_.asInstanceOf[Long]).getOrElse(0L)
    require(pairVolume <= maxPairComparisons,
      s"semanticDedup within-cluster pair volume $pairVolume exceeds " +
        s"maxPairComparisons=$maxPairComparisons — nLists=$nLists is too " +
        "coarse for this corpus; size it with semanticDedupNLists " +
        "(nLists ≈ n/targetClusterSize, √n default) or raise the guard")
    val vecs = emb
      .select(col(idCol).cast("long").as("vid"),
        col(vecCol).cast("array<double>").as("v"))
      .join(assign.select(col(idCol).cast("long").as("vid"), col("centroid")), "vid")
    val a = vecs.select(col("vid").as("id_a"), col("v").as("va"), col("centroid"))
    val b = vecs.select(col("vid").as("id_b"), col("v").as("vb"), col("centroid"))
    val pairs = a.join(b, Seq("centroid"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("c0", graft.functions.Fns.cosineSim(col("va"), col("vb")))
      .filter(col("c0") >= threshold)
      .select("id_a", "id_b")
    val dropped = nearDupClusters(pairs)
      .filter(col("node") =!= col("component"))
      .select(col("node").as("vid"))
    vecs.select("vid", "centroid").join(dropped, Seq("vid"), "left_anti")
  }

  /** [[semanticDedup]] with the cluster count sized from the corpus itself:
    * nLists = ⌈n / targetClusterSize⌉ (or ⌈√n⌉ when no target is given) via
    * [[semanticDedupNLists]]. The one extra `count()` job is the price of
    * not hard-coding a cluster count that silently stops scaling.
    */
  def semanticDedupAuto(emb: DataFrame, idCol: String, vecCol: String,
      threshold: Double, targetClusterSize: Option[Long] = None,
      maxPairComparisons: Long = SemanticDedupMaxPairComparisons): DataFrame = {
    val n = emb.count()
    semanticDedup(emb, idCol, vecCol,
      semanticDedupNLists(n, targetClusterSize), threshold, maxPairComparisons)
  }

  /** Sub-quadratic embedding near-dup pairs: candidates are limited to
    * vectors sharing a deterministic random-hyperplane sign bucket
    * ([[Ann.hyperplaneBuckets]] — one bucket per vector), then scored
    * exactly with the codegen'd cosine kernel. Cost is Σ(bucket²) instead
    * of n² and every stage is a keyed shuffle — the default at corpus
    * scale. Recall is governed by `numPlanes` (fewer planes → bigger
    * buckets → higher recall, more work); near-identical vectors land in
    * the same bucket with high probability. Fully deterministic, so
    * oracle-verifiable.
    */
  /** Cross-group content-overlap matrix — the dedup AUDIT that tells a
    * corpus owner which source pairs ship the same documents (mirror
    * sites, re-crawls, syndication): for every pair of groups, the
    * count of distinct content keys present in both. One distinct
    * projection + one self-equi-join on the key + one keyed agg; the
    * join output is bounded by Σ_key (groups-per-key choose 2) —
    * groups-per-key ≤ |groups|, so the exchange never exceeds
    * |distinct keys|·|groups|²/2 and is in practice ≈ the dup mass.
    */
  def sourceOverlap(df: DataFrame, keyCol: String, groupCol: String): DataFrame = {
    val ks = df.select(col(groupCol).as("grp"), col(keyCol).as("k")).distinct()
    ks.select(col("grp").as("src_a"), col("k"))
      .join(ks.select(col("grp").as("src_b"), col("k")), "k")
      .filter(col("src_a") < col("src_b"))
      .groupBy("src_a", "src_b")
      .agg(count(lit(1)).as("n_shared"))
  }

  /** Incremental (snapshot-over-corpus) dedup — the shape every periodic
    * crawl refresh runs: keep each NEW doc whose content key appears
    * neither in the existing corpus nor earlier in its own batch.
    *
    * Scale posture: within-batch first-wins is one keyed aggregation
    * ([[exactFirstWins]]); the corpus side is summarized as a BOUNDED
    * bloom bitset (numBits/8 bytes, built in one aggregation over hashed
    * keys) that routes the batch: bloom-negative rows are DEFINITELY new
    * and skip the anti-join entirely, bloom-positive rows (true dups +
    * false-positive rate) go through an exact left_anti join for
    * confirmation. The anti-join shuffle therefore carries only
    * ~dup_rate + FP mass, not the batch — and never the corpus text,
    * only its distinct keys. The two branches share the first-wins
    * exchange (identical subplans → ReusedExchange).
    */
  def incrementalDedup(newDocs: DataFrame, corpusKeys: DataFrame,
      keyCol: String, idCol: String,
      numBits: Int = BloomPrefilterJoin.DefaultNumBits,
      numHashes: Int = BloomPrefilterJoin.DefaultNumHashes): DataFrame = {
    val batchUnique = exactFirstWins(newDocs.select(col(idCol), col(keyCol)),
      Seq(keyCol), Seq(idCol))
    val ck = corpusKeys.select(col(keyCol)).distinct()
    val bloom = BloomPrefilterJoin.buildBloom(
      ck.select(xxhash64(col(keyCol)).as("__kh")), "__kh",
      numBits, numHashes)
    val probe = graft.functions.Fns.bloomMightContain(
      xxhash64(col(keyCol)), bloom, numHashes)
    val definitelyNew = batchUnique.filter(!probe)
    val confirmed = batchUnique.filter(probe)
      .join(ck, Seq(keyCol), "left_anti")
    definitelyNew.unionByName(confirmed)
  }

  def embeddingCosinePairsBlocked(emb: DataFrame, idCol: String, vecCol: String,
      threshold: Double, numPlanes: Int): DataFrame = {
    val buckets = Ann.hyperplaneBuckets(emb, idCol, vecCol, numPlanes)
    val vecs = emb.select(col(idCol).cast("long").as("vid"),
        col(vecCol).cast("array<double>").as("v"))
      .join(buckets, "vid")
    val a = vecs.select(col("vid").as("id_a"), col("v").as("va"), col("bucket"))
    val b = vecs.select(col("vid").as("id_b"), col("v").as("vb"), col("bucket"))
    a.join(b, Seq("bucket"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("c0", graft.functions.Fns.cosineSim(col("va"), col("vb")))
      .filter(col("c0") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("c0"), 4).as("cos"))
  }
}
