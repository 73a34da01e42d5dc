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

  /** Top-`k` docs per query by integer TF-IDF. `queries` is
    * (query_id INT, term STRING) with DISTINCT terms per query (duplicate
    * terms collapse — each distinct query term contributes once).
    * Returns (query_id, rank 1-based, doc_id, score), rank ties broken by
    * ascending doc_id.
    */
  def tfIdfTopK(docs: DataFrame, idCol: String, textCol: String,
      queries: DataFrame, k: Int, idfScale: Long = 1000000L): DataFrame = {
    require(k > 0 && idfScale > 0)
    val postings = invertedIndex(docs, idCol, textCol)
    val nDocs = docs.agg(count_distinct(col(idCol)).as("n_docs"))
    val dfs = postings.groupBy("term").agg(count(lit(1)).as("df"))
    val idf = dfs.crossJoin(broadcast(nDocs))
      .select(col("term"), expr(s"(n_docs * $idfScale) div df").as("idf"))
    val q = broadcast(queries.select(col("query_id").cast("int").as("query_id"),
      col("term")).distinct())
    val scored = postings
      .join(q, "term")
      .join(idf, "term")
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
