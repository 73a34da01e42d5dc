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
      .withColumn("cos", Fns.cosineSim(col("qv"), col("cv")))
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

  /** IVF (inverted-file) coarse quantization: k-means centroids over the
    * corpus (deterministic — init from the k smallest vec ids, fixed Lloyd
    * iteration count), each vector assigned to its nearest centroid's
    * list. Search probes only the `nprobe` nearest lists — the classic
    * recall/cost dial for billion-vector corpora (cost ≈ nprobe/k of
    * brute force). All stages are DataFrame ops: the centroid table stays
    * tiny and broadcasts; assignment is one narrow pass over the corpus.
    */
  def ivfAssignments(emb: DataFrame, idCol: String, vecCol: String,
      k: Int, iterations: Int = 2): (DataFrame, DataFrame) = {
    val spark = emb.sparkSession
    import spark.implicits._
    val vecs = emb.select(col(idCol).cast("long"), col(vecCol).cast("array<double>"))
      .as[(Long, Array[Double])]
    def l2(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }
      s
    }
    var centroids: Array[(Int, Array[Double])] = vecs
      .filter(_._1 < k).collect().sortBy(_._1)
      .zipWithIndex.map { case ((_, v), c) => (c, v) }
    for (_ <- 0 until iterations) {
      val bc = spark.sparkContext.broadcast(centroids)
      val assigned = vecs.map { case (id, v) =>
        val cs = bc.value
        var best = 0; var bestD = Double.MaxValue
        cs.foreach { case (c, cv) =>
          val d = l2(v, cv); if (d < bestD) { bestD = d; best = c }
        }
        (best, v)
      }
      centroids = assigned.rdd
        .aggregateByKey((new Array[Double](centroids(0)._2.length), 0L))(
          (acc, v) => { var i = 0; while (i < v.length) { acc._1(i) += v(i); i += 1 }; (acc._1, acc._2 + 1) },
          (a, b) => { var i = 0; while (i < a._1.length) { a._1(i) += b._1(i); i += 1 }; (a._1, a._2 + b._2) })
        .map { case (c, (s, n)) => (c, s.map(_ / n)) }
        .collect().sortBy(_._1)
    }
    val bc = spark.sparkContext.broadcast(centroids)
    val assignments = vecs.map { case (id, v) =>
      val cs = bc.value
      var best = 0; var bestD = Double.MaxValue
      cs.foreach { case (c, cv) => val d = l2(v, cv); if (d < bestD) { bestD = d; best = c } }
      (id, best)
    }.toDF(idCol, "centroid")
    val centroidDf = centroids.toSeq.toDF("centroid", "center")
    (assignments, centroidDf)
  }

  /** IVF top-k search: score only vectors in the query's `nprobe` nearest
    * centroid lists. Output: (query_id, rank, neighbor_id, cos).
    */
  def ivfTopK(corpus: DataFrame, queryIds: DataFrame, idCol: String,
      vecCol: String, k: Int, nLists: Int, nprobe: Int): DataFrame = {
    val (assign, centroids) = ivfAssignments(corpus, idCol, vecCol, nLists)
    val withList = corpus.select(col(idCol), col(vecCol)).join(assign, idCol)
    // query → its nprobe nearest centroids
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
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), round(col("cos"), 4).as("cos"))
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
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), round(col("cos"), 4).as("cos"))
  }
}
