package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.Fns

/** Sparse lexical retrieval: distributed inverted index + TF-IDF scoring
  * with a bounded top-k — the term-based sibling of the dense [[Ann]]
  * stack, and the retrieval primitive decontamination / near-dup triage
  * pipelines use when embeddings are too expensive (one keyed join per
  * query batch instead of a vector scan).
  *
  * Scoring is INTEGER-EXACT: idf is the rational surrogate
  * `(N · idfScale) div df` (monotone in 1/df, floor division) instead of
  * a float log — the engine's log-free exactness pattern (quality logit,
  * DSIR, bigram-LM precedents) — and a hit scores `tf · idf`, summed per
  * (query, doc). Every value is a commutative integer sum, so results
  * are bit-identical under any partitioning and a relational oracle can
  * replay them.
  *
  * Scale posture: the index build is one keyed aggregation on
  * (term, doc); df is one keyed aggregation on term; N is a 1-row
  * broadcast scalar (never a driver round-trip inside the plan); the
  * query batch broadcasts into the posting join (sharded-posting-list
  * retrieval); the final ranking is [[graft.functions.TopKByScore]] —
  * map-side-bounded, O(queries × k) exchange bytes, NO corpus-wide
  * window sort.
  */
object Retrieval {

  /** Inverted index over whitespace tokens: (term, doc_id, tf). */
  def invertedIndex(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).cast("long").as("doc_id"),
        explode(Fns.tokens(col(textCol))).as("term"))
      .filter(col("term") =!= "")
      .groupBy("term", "doc_id").agg(count(lit(1)).as("tf"))

  /** Positional inverted index: (term, doc_id, pos) — one exploded
    * projection, no aggregation (positions ARE the payload).
    */
  def positionalIndex(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).cast("long").as("doc_id"),
        posexplode(Fns.tokens(col(textCol))).as(Seq("pos", "term")))
      .filter(col("term") =!= "")

  /** Materialized lexical index artifact — the build/serve split for the
    * retrieval family, mirroring [[Ann.IvfPqIndex]]: build ONCE (persist
    * the three relations to parquet; raw text gone from the serving
    * scan), then serve any number of phrase / TF-IDF query batches
    * against the reads. `positional` = (term, doc_id, pos); `postings` =
    * (term, doc_id, tf); `idf` = (term, idf) with the integer-rational
    * idf already folded in (so serving never recomputes N or df).
    */
  final case class LexIndex(positional: DataFrame, postings: DataFrame,
      idf: DataFrame)

  /** Build the [[LexIndex]]: two keyed aggregations + the df/idf table.
    * The one-shot [[phraseSearch]]/[[tfIdfTopK]] overloads delegate to
    * the served forms through this, so build-once/serve-many equality
    * holds by construction (and is spec-proven over a parquet
    * round-trip).
    */
  def lexIndexBuild(docs: DataFrame, idCol: String, textCol: String,
      idfScale: Long = 1000000L): LexIndex = {
    require(idfScale > 0)
    val postings = invertedIndex(docs, idCol, textCol)
    val nDocs = docs.agg(count_distinct(col(idCol)).as("n_docs"))
    val idf = postings.groupBy("term").agg(count(lit(1)).as("df"))
      .crossJoin(broadcast(nDocs))
      .select(col("term"), expr(s"(n_docs * $idfScale) div df").as("idf"))
    LexIndex(positionalIndex(docs, idCol, textCol), postings, idf)
  }

  /** Exact phrase search over the positional index — decontamination's
    * verbatim-quote detector. The relational formulation needs ONE join
    * and ONE aggregation for ANY phrase length (no per-term join chain):
    * each phrase explodes to (phrase_id, offset, term); a posting
    * (term, doc, pos) joined on term votes for candidate start
    * `pos − offset`; a start with ALL `plen` DISTINCT offsets present is
    * a match (count(DISTINCT offset) handles phrases with repeated
    * terms). Returns (phrase_id, doc_id, n_matches ≥ 1).
    *
    * Scale: the join shuffles postings by term — only terms that occur
    * in some phrase survive (the join prunes first via the broadcast
    * phrase side), so the exchange carries the matched posting mass,
    * not the corpus.
    */
  def phraseSearch(docs: DataFrame, idCol: String, textCol: String,
      phrases: Map[Int, String]): DataFrame =
    phraseSearch(lexIndexBuild(docs, idCol, textCol), phrases)

  /** Serving form of [[phraseSearch]]: same plan from the broadcast
    * phrase table down, but the posting side is the PRE-BUILT index —
    * no tokenize/explode of the corpus per query batch.
    */
  def phraseSearch(index: LexIndex, phrases: Map[Int, String]): DataFrame = {
    require(phrases.nonEmpty)
    val spark = index.positional.sparkSession
    import spark.implicits._
    val pt = phrases.toSeq.flatMap { case (pid, p) =>
      val ts = p.trim.toLowerCase.split("\\s+").toSeq.filter(_.nonEmpty)
      require(ts.nonEmpty, s"empty phrase $pid")
      ts.zipWithIndex.map { case (t, off) => (pid, off, t, ts.length) }
    }.toDF("phrase_id", "offset", "term", "plen")
    index.positional
      .join(broadcast(pt), "term")
      .select(col("phrase_id"), col("plen"), col("doc_id"),
        (col("pos") - col("offset")).as("start"), col("offset"))
      .filter(col("start") >= 0)
      .groupBy("phrase_id", "plen", "doc_id", "start")
      .agg(count_distinct(col("offset")).as("n_off"))
      .filter(col("n_off") === col("plen"))
      .groupBy("phrase_id", "doc_id")
      .agg(count(lit(1)).as("n_matches"))
  }

  /** Posting-list compression accounting — the index-sizing audit an IR
    * deployment runs before choosing a posting codec: per term, the
    * Elias-gamma cost of the doc-id delta (d-gap) stream vs raw 64-bit
    * ids. gamma(g) costs `2·⌊log2 g⌋ + 1` bits; ⌊log2 g⌋ + 1 is exactly
    * `length(bin(g))` in BOTH engines (binary string without leading
    * zeros), so the whole computation is integer-exact. First gap =
    * doc_id + 1 (ids are 0-based).
    *
    * One term-partitioned window (ordered by doc_id) computes the gaps —
    * partition size = df(term), the posting list itself; stopword-heavy
    * terms are the known skew and exactly the lists a deployment would
    * chunk — then one keyed agg. ratio_ppm = gamma_bits·1e6 div raw_bits.
    */
  def indexCompressionStats(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("term").orderBy("doc_id")
    invertedIndex(docs, idCol, textCol)
      .select(col("term"), col("doc_id"))
      .withColumn("gap",
        col("doc_id") - coalesce(lag("doc_id", 1).over(w), lit(-1L)))
      .withColumn("gamma_bits", length(bin(col("gap"))) * 2 - 1)
      .groupBy("term")
      .agg(count(lit(1)).as("df"),
        sum(col("gamma_bits").cast("long")).as("gamma_bits"),
        (count(lit(1)) * 64).as("raw_bits"))
      .select(col("term"), col("df"), col("gamma_bits"), col("raw_bits"),
        expr("(gamma_bits * 1000000) div raw_bits").as("ratio_ppm"))
  }

  /** Top-`k` docs per query by integer TF-IDF. `queries` is
    * (query_id INT, term STRING) with DISTINCT terms per query (duplicate
    * terms collapse — each distinct query term contributes once).
    * Returns (query_id, rank 1-based, doc_id, score), rank ties broken by
    * ascending doc_id.
    */
  def tfIdfTopK(docs: DataFrame, idCol: String, textCol: String,
      queries: DataFrame, k: Int, idfScale: Long = 1000000L): DataFrame =
    tfIdfTopK(lexIndexBuild(docs, idCol, textCol, idfScale), queries, k)

  /** BM25 top-`k` — the saturating, length-normalized upgrade of
    * [[tfIdfTopK]] (Robertson–Spärck Jones; the default ranking of every
    * production lexical engine). Same integer-exactness contract as the
    * rest of the family: k1/b arrive milli-scaled (1200/750 = the
    * textbook 1.2/0.75), avgdl is the ppm-scaled rational
    * `(Σdl · 1e6) div N`, and a hit contributes
    *
    *   (idf · tf · (1000 + k1m)) div
    *     (tf·1000 + (k1m · ((1000 − bm) + (bm·dl·1e6) div avgdl_ppm)) div 1000)
    *
    * — floor-division rationals only (no float log, no float division),
    * so per-hit contributions are exact integers and the per-(query,doc)
    * sum is order-independent. The idf surrogate is the index's monotone
    * `(N·scale) div df` table (same ranking family as BM25's log-idf for
    * df ≪ N; documented engine-wide).
    *
    * Scale shape: doc lengths are ONE keyed aggregation over the index's
    * posting relation (df-bounded, no raw text touched); avgdl is a 1-row
    * broadcast scalar; the dl join keys on doc_id against the
    * query-matched posting mass only. Ranking is the bounded
    * [[graft.functions.TopKByScore]] aggregate — no corpus-wide sort.
    */
  def bm25TopK(index: LexIndex, queries: DataFrame, k: Int,
      k1Milli: Long = 1200L, bMilli: Long = 750L): DataFrame = {
    require(k > 0 && k1Milli >= 0 && bMilli >= 0 && bMilli <= 1000)
    val dl = index.postings.groupBy("doc_id").agg(sum("tf").as("dl"))
    val avgdl = dl
      .agg((sum(col("dl")) * lit(1000000L)).as("tot"), count(lit(1)).as("nd"))
      .select(expr("tot div nd").as("avgdl_ppm"))
    val q = broadcast(queries.select(col("query_id").cast("int").as("query_id"),
      col("term")).distinct())
    val scored = index.postings
      .join(q, "term")
      .join(index.idf, "term")
      .join(dl, "doc_id")
      .crossJoin(broadcast(avgdl))
      .select(col("query_id"), col("doc_id"),
        expr(s"""(idf * tf * (1000 + $k1Milli)) div
                |  (tf * 1000 + ($k1Milli * ((1000 - $bMilli) +
                |    ($bMilli * dl * 1000000) div avgdl_ppm)) div 1000)"""
          .stripMargin.replace('\n', ' ')).as("contrib"))
      .groupBy("query_id", "doc_id")
      .agg(sum("contrib").as("score"))
    scored.groupBy("query_id")
      .agg(Fns.topKByScore(col("score").cast("double"), col("doc_id"), k)
        .as("top"))
      .select(col("query_id"), posexplode(col("top")).as(Seq("pos", "hit")))
      .select(col("query_id"), (col("pos") + 1).cast("int").as("rank"),
        col("hit.id").as("doc_id"), col("hit.score").cast("long").as("score"))
  }

  /** One-shot [[bm25TopK]] — builds the index inline (delegates, so
    * build-once/serve-many equality holds by construction).
    */
  def bm25TopK(docs: DataFrame, idCol: String, textCol: String,
      queries: DataFrame, k: Int): DataFrame =
    bm25TopK(lexIndexBuild(docs, idCol, textCol), queries, k)

  /** Reciprocal-rank fusion (Cormack et al. 2009 — the default hybrid-
    * search combiner): each input ranking contributes
    * ⌊1e6 / (kConst + rank)⌋ per (query, id) hit and the fused score is
    * the sum — rank-only, so lexical scores (integer BM25 units) and
    * vector scores (cosine) fuse without calibration. Micro-integer
    * contributions keep the fusion ORDER-INDEPENDENT and engine-exact
    * (the library-wide integer discipline). Inputs are normalized
    * rankings: (query_id, rank, id) — select/alias from [[bm25TopK]]
    * (`doc_id`) or the ANN tiers (`neighbor_id`) at the call site.
    *
    * Scale shape: one union of bounded top-k outputs (≤ Σ inputs·k rows
    * per query — never corpus-sized), one keyed sum, one bounded top-k.
    * Output: (query_id, rank, id, rrf_micro).
    */
  def rrfFuse(rankings: Seq[DataFrame], kConst: Int = 60,
      topK: Int = 10): DataFrame = {
    require(rankings.nonEmpty, "need at least one ranking")
    require(kConst >= 0 && topK > 0, s"bad kConst=$kConst topK=$topK")
    val all = rankings.map(_.select(col("query_id").cast("long"),
        col("id").cast("long"),
        expr(s"1000000 div ($kConst + rank)").cast("long").as("contrib")))
      .reduce(_ unionByName _)
    all.groupBy("query_id", "id").agg(sum("contrib").as("rrf_micro"))
      .groupBy("query_id")
      .agg(Fns.topKByLongScore(col("rrf_micro"), col("id"), topK).as("top"))
      .select(col("query_id"), posexplode(col("top")).as(Seq("pos", "hit")))
      .select(col("query_id"), (col("pos") + 1).cast("int").as("rank"),
        col("hit.id").as("id"), col("hit.score").as("rrf_micro"))
  }

  /** ColBERT-style late-interaction re-rank (Khattab & Zaharia 2020's
    * MaxSim): score(q, d) = Σ over query slots of the MAX cosine against
    * any doc slot, computed ONLY over an explicit first-stage candidate
    * set (the PLAID serving shape — a cheap single-vector retrieval
    * proposes, MaxSim re-ranks). Per-slot cosines are rounded to 1e-4
    * units and cast to LONG before max/sum (round-THEN-cast — DuckDB's
    * double→bigint cast rounds while Spark's truncates, so the rounding
    * must happen explicitly on both sides) so the score is
    * order-independent and engine-exact.
    * `queryVecs`/`docVecs`: (query_id|doc_id, slot, vec).
    *
    * Scale shape: two keyed joins fan the candidate pairs out to
    * slot-pair grain (|cand|·qSlots·dSlots rows — candidate-bounded,
    * never corpus×corpus), then two bounded aggregations (max per query
    * slot, sum per pair) and the bounded top-k.
    * Output: (query_id, rank, doc_id, maxsim_micro).
    */
  def maxSimRerank(candidates: DataFrame, queryVecs: DataFrame,
      docVecs: DataFrame, topK: Int): DataFrame = {
    require(topK > 0, s"bad topK $topK")
    val qv = queryVecs.select(col("query_id").cast("long"),
      col("slot").cast("int").as("qslot"),
      col("vec").cast("array<double>").as("qv"))
    val dv = docVecs.select(col("doc_id").cast("long"),
      col("slot").cast("int").as("dslot"),
      col("vec").cast("array<double>").as("dv"))
    val pairs = candidates
      .select(col("query_id").cast("long"), col("doc_id").cast("long"))
      .join(qv, "query_id").join(dv, "doc_id")
      .select(col("query_id"), col("doc_id"), col("qslot"),
        round(Fns.cosineSim(col("qv"), col("dv")) * 10000L)
          .cast("long").as("cos_micro"))
    pairs.groupBy("query_id", "doc_id", "qslot")
      .agg(max("cos_micro").as("best"))
      .groupBy("query_id", "doc_id")
      .agg(sum("best").as("maxsim_micro"))
      .groupBy("query_id")
      .agg(Fns.topKByLongScore(col("maxsim_micro"), col("doc_id"), topK)
        .as("top"))
      .select(col("query_id"), posexplode(col("top")).as(Seq("pos", "hit")))
      .select(col("query_id"), (col("pos") + 1).cast("int").as("rank"),
        col("hit.id").as("doc_id"), col("hit.score").as("maxsim_micro"))
  }

  /** Serving form of [[tfIdfTopK]]: postings and the folded idf table
    * come from the PRE-BUILT index — per batch the plan is one posting
    * join + one idf join + the bounded top-k aggregate.
    */
  def tfIdfTopK(index: LexIndex, queries: DataFrame, k: Int): DataFrame = {
    require(k > 0)
    val q = broadcast(queries.select(col("query_id").cast("int").as("query_id"),
      col("term")).distinct())
    val scored = index.postings
      .join(q, "term")
      .join(index.idf, "term")
      .groupBy("query_id", "doc_id")
      .agg(sum(col("tf") * col("idf")).as("score"))
    scored.groupBy("query_id")
      .agg(Fns.topKByScore(col("score").cast("double"), col("doc_id"), k)
        .as("top"))
      .select(col("query_id"), posexplode(col("top")).as(Seq("pos", "hit")))
      .select(col("query_id"), (col("pos") + 1).cast("int").as("rank"),
        col("hit.id").as("doc_id"), col("hit.score").cast("long").as("score"))
  }
}
