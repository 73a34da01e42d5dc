package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.Fns

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Two tiers:
  *  - [[bruteForceTopK]]: exact cosine top-k — the baseline. The query side
  *    is expected to be small and is broadcast; cost is |queries|×|corpus|
  *    per-row arithmetic with no shuffle of the corpus.
  *  - [[lshTopK]]: random-hyperplane LSH — corpus is bucketed by sign
  *    pattern; a query only scores candidates in its own bucket. The
  *    hyperplanes are pseudo-random ±1 vectors derived from a deterministic
  *    integer hash so the bucketing is reproducible across engines (and
  *    verifiable against a SQL oracle). At scale the bucket join replaces
  *    the cross product: cost ~ Σ bucket² instead of n².
  */
object Ann {

  /** Exact top-k neighbors by cosine for each query vector.
    * Output: (query_id, rank, neighbor_id, cos).
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
    val scored = c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", Fns.cosine(col("qv"), col("cv")))
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), round(col("cos"), 4).as("cos"))
  }

  /** Deterministic ±1 hyperplane sign for (plane p, dimension d):
    * parity of (p*1315423911 + d*2654435761) mod 1e9+7 — engine-portable
    * 64-bit arithmetic (no overflow for p,d in sane ranges).
    */
  private def planeSign(p: org.apache.spark.sql.Column, d: org.apache.spark.sql.Column) =
    when(((p * lit(1315423911L) + d * lit(2654435761L)) % lit(Fns.HashMod)) % 2 === 0,
      lit(1.0)).otherwise(lit(-1.0))

  /** Bucket id per vector: `numPlanes`-bit sign pattern of projections onto
    * the deterministic hyperplanes. Relational formulation (posexplode ×
    * plane index) — one shuffle on (vec, plane), then one on vec.
    */
  def hyperplaneBuckets(emb: DataFrame, idCol: String, vecCol: String,
      numPlanes: Int): DataFrame = {
    val dims = emb.select(col(idCol).as("vid"), posexplode(col(vecCol)).as(Seq("d", "x")))
    val proj = dims
      .select(col("vid"), col("d"), col("x"), explode(sequence(lit(0), lit(numPlanes - 1))).as("p"))
      .withColumn("contrib", col("x").cast("double") * planeSign(col("p"), col("d")))
      .groupBy("vid", "p").agg(sum("contrib").as("s"))
    proj.groupBy("vid")
      .agg(array_join(
        transform(
          array_sort(collect_list(struct(col("p"), when(col("s") > 0, "1").otherwise("0").as("b")))),
          x => x.getField("b")),
        "").as("bucket"))
  }

  /** LSH top-k: rank only candidates sharing the query's bucket.
    * Output: (query_id, rank, neighbor_id, cos) — recall depends on
    * numPlanes (fewer planes → bigger buckets → higher recall, more work).
    */
  def lshTopK(corpus: DataFrame, queryIds: DataFrame, idCol: String,
      vecCol: String, numPlanes: Int, k: Int): DataFrame = {
    val buckets = hyperplaneBuckets(corpus, idCol, vecCol, numPlanes)
    val withB = corpus.select(col(idCol).as("vid"), col(vecCol).as("v"))
      .join(buckets, "vid")
    val q = withB.join(queryIds.select(col(idCol).as("vid")), Seq("vid"), "left_semi")
      .select(col("vid").as("query_id"), col("v").as("qv"), col("bucket"))
    val scored = withB
      .select(col("vid").as("neighbor_id"), col("v").as("cv"), col("bucket"))
      .join(broadcast(q), Seq("bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", Fns.cosine(col("qv"), col("cv")))
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), round(col("cos"), 4).as("cos"))
  }
}
