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

  /** Final ranker shared by all ANN tiers: per-query top-k via the bounded
    * [[graft.functions.TopKByScore]] aggregate — identical output to
    * `row_number().over(partitionBy(query).orderBy(cos.desc, id))` but with
    * map-side partial aggregation, so the shuffle carries O(queries × k)
    * pairs instead of every scored candidate row through a full sort (the
    * window formulation is the classic 100×-scale bottleneck).
    */
  private def rankTopK(scored: DataFrame, k: Int): DataFrame =
    scored.groupBy("query_id")
      .agg(Fns.topKByScore(col("cos"), col("neighbor_id").cast("long"), k).as("top"))
      .select(col("query_id"), posexplode(col("top")).as(Seq("r", "t")))
      .select(col("query_id"), (col("r") + 1).cast("int").as("rank"),
        col("t.id").as("neighbor_id"), round(col("t.score"), 4).as("cos"))

  /** Exact top-k neighbors by cosine for each query vector.
    * Output: (query_id, rank, neighbor_id, cos).
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
    val scored = c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", Fns.cosineSim(col("qv"), col("cv")))
    rankTopK(scored, k)
  }

  /** Deterministic ±1 hyperplane sign for (plane p, dimension d):
    * parity of (p*1315423911 + d*2654435761) mod 1e9+7 — engine-portable
    * 64-bit arithmetic (no overflow for p,d in sane ranges).
    */
  private def planeSign(p: org.apache.spark.sql.Column, d: org.apache.spark.sql.Column) =
    when(((p * lit(1315423911L) + d * lit(2654435761L)) % lit(Fns.HashMod)) % 2 === 0,
      lit(1.0)).otherwise(lit(-1.0))

  /** Bucket id per vector: `numPlanes`-bit sign pattern of projections onto
    * the deterministic hyperplanes. Computed per row as a left fold over
    * the vector — a pure projection with ZERO shuffles (the previous
    * posexplode × plane formulation shuffled |corpus|×dims×planes rows);
    * at cluster scale bucketing is embarrassingly parallel.
    */
  def hyperplaneBuckets(emb: DataFrame, idCol: String, vecCol: String,
      numPlanes: Int): DataFrame = {
    val v = col(vecCol).cast("array<double>")
    val bits = transform(sequence(lit(0), lit(numPlanes - 1)), p =>
      when(
        aggregate(
          zip_with(v, sequence(lit(0), size(v) - 1), (x, d) => x * planeSign(p, d)),
          lit(0.0), (acc, t) => acc + t) > 0, "1").otherwise("0"))
    // null/empty vectors are DROPPED (they cannot be bucketed — an
    // all-zero sign pattern would funnel every null embedding into one
    // bucket and emit null cosines downstream)
    emb.filter(v.isNotNull && size(v) > 0)
      .select(col(idCol).as("vid"), array_join(bits, "").as("bucket"))
  }

  /** IVF (inverted-file) coarse quantization: k-means centroids over the
    * corpus, each vector assigned to its nearest centroid's list. Search
    * probes only the `nprobe` nearest lists — the classic recall/cost dial
    * for billion-vector corpora (cost ≈ nprobe/k of brute force).
    *
    * Deterministic across engines AND partitionings: init is the k
    * smallest vec ids; assignment distances are per-row LEFT FOLDS over
    * the vector arrays (IEEE double addition in index order — bit-stable
    * regardless of shuffle layout, and identical to the oracle's
    * `list_reduce` fold); the only cross-row arithmetic — the centroid
    * means — accumulates in DECIMAL(38,18) (exact, order-independent).
    * Argmin ties break by centroid id via `min(struct(dist, c))` — one
    * aggregation, no window sort.
    *
    * Scale shape: centroids are k arrays (broadcast); assignment is a
    * broadcast nested loop over corpus rows — no shuffle of the corpus —
    * followed by one keyed aggregation per Lloyd round for the means.
    */
  def ivfAssignments(emb: DataFrame, idCol: String, vecCol: String,
      k: Int, iterations: Int = 2): (DataFrame, DataFrame) = {
    val base = emb.select(col(idCol).cast("long").as("id"),
      col(vecCol).cast("array<double>").as("v"))

    // nearest centroid per vector: per-row double L2 fold, tie-break by c
    def assignStep(cent: DataFrame): DataFrame =
      base.crossJoin(broadcast(cent))
        .withColumn("dist",
          aggregate(
            zip_with(col("v"), col("center"), (x, cx) => (x - cx) * (x - cx)),
            lit(0.0), (acc, t) => acc + t))
        .groupBy("id")
        .agg(min(struct(col("dist"), col("c"))).as("m"))
        .select(col("id"), col("m.c").as("c"))

    // init: centroid c = the vector whose id is c, for the k smallest ids
    var cent = base.filter(col("id") < k)
      .select(col("id").cast("int").as("c"), col("v").as("center"))
    for (_ <- 0 until iterations) {
      val assign = assignStep(cent)
      // exact decimal mean per (c, d), re-assembled into centroid arrays
      cent = base.join(assign, "id")
        .select(col("c"), posexplode(col("v")).as(Seq("d", "x")))
        .groupBy("c", "d")
        .agg((sum(col("x").cast("decimal(38,18)")).cast("double") /
          count(lit(1))).as("cx"))
        .groupBy("c")
        .agg(array_sort(collect_list(struct(col("d"), col("cx")))).as("a"))
        .select(col("c"), transform(col("a"), s => s.getField("cx")).as("center"))
    }
    val assignments = assignStep(cent)
      .select(col("id").as(idCol), col("c").as("centroid"))
    (assignments, cent.select(col("c").as("centroid"), col("center")))
  }

  /** IVF top-k search: score only vectors in the query's `nprobe` nearest
    * centroid lists. Output: (query_id, rank, neighbor_id, cos).
    */
  def ivfTopK(corpus: DataFrame, queryIds: DataFrame, idCol: String,
      vecCol: String, k: Int, nLists: Int, nprobe: Int): DataFrame = {
    val (assign, centroids) = ivfAssignments(corpus, idCol, vecCol, nLists)
    val withList = corpus.select(col(idCol), col(vecCol)).join(assign, idCol)
    // query → its nprobe nearest centroids. This window is NOT a scale
    // hazard: its partitions are bounded by nLists rows per query (the
    // centroid count, a fixed parameter), unlike the candidate ranker.
    val q = withList.join(queryIds.select(col(idCol)), Seq(idCol), "left_semi")
      .select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val qCent = q.crossJoin(broadcast(centroids))
      .withColumn("dist", Fns.dotProduct(col("qv"), col("qv")) +
        Fns.dotProduct(col("center"), col("center")) -
        lit(2.0) * Fns.dotProduct(col("qv"), col("center")))
    val wq = Window.partitionBy("query_id").orderBy(col("dist"), col("centroid"))
    val probes = qCent.withColumn("pr", row_number().over(wq))
      .filter(col("pr") <= nprobe)
      .select(col("query_id"), col("qv"), col("centroid"))
    // score only the probed lists
    val cands = withList.select(col(idCol).as("neighbor_id"),
      col(vecCol).as("cv"), col("centroid"))
    val scored = cands.join(broadcast(probes), Seq("centroid"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", Fns.cosineSim(col("qv"), col("cv")))
    rankTopK(scored, k)
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
      .withColumn("cos", Fns.cosineSim(col("qv"), col("cv")))
    rankTopK(scored, k)
  }
}
