package graft

import org.apache.spark.sql.functions._
import graft.operators.Ann

/** Round-11 operator specs: true OPQ rotation learning (Ge et al. 2013
  * non-parametric — alternating PQ fit / orthogonal-Procrustes update),
  * replacing the round-robin-PCA stand-in as the learned pretransform.
  */
class Round11OpsSpec extends SparkSpec {

  /** Deterministic correlated fixture adversarial to coordinate-aligned
    * subspace splits: dim pairs (i, i+4) carry the same latent factor,
    * so the slice subspaces (0,1|2,3|4,5|6,7) each see two independent
    * latents while the cross-subspace correlation is free information a
    * learned rotation can exploit.
    */
  private def correlatedRows(n: Int) = {
    import spark.implicits._
    (0 until n).map { i =>
      def lcg(s: Int) = { var x = i * 2654435761L + s * 40503L
        x = (x ^ (x >>> 13)) * 1099511628211L
        ((x >>> 20) % 2000).toDouble / 1000.0 - 1.0 }
      val l = Array.tabulate(4)(s => lcg(s))
      val eps = Array.tabulate(8)(d => lcg(100 + d) * 0.05)
      val v = Array.tabulate(8)(d => l(d % 4) * (if (d < 4) 1.0 else 0.8) + eps(d))
      (i.toLong, v.toSeq.map(_.toFloat))
    }.toDF("vec_id", "embedding")
  }

  test("procrustesRotation: orthogonal, and trace-dominant over fixed rotations") {
    val a = Array(
      Array(3.0, 1.0, -0.5, 0.2),
      Array(0.7, 2.0, 0.4, -1.0),
      Array(-0.3, 0.6, 1.5, 0.9),
      Array(0.2, -0.8, 0.3, 2.5))
    val r = Ann.procrustesRotation(a)
    for (i <- 0 until 4; j <- 0 until 4) {
      val dot = (0 until 4).map(k => r(i)(k) * r(j)(k)).sum
      assert(math.abs(dot - (if (i == j) 1.0 else 0.0)) < 1e-9,
        s"R R^T [$i][$j] = $dot")
    }
    def tr(q: Array[Array[Double]]) =
      (0 until 4).map(i => (0 until 4).map(k => q(i)(k) * a(k)(i)).sum).sum
    val id = Array.tabulate(4, 4)((i, j) => if (i == j) 1.0 else 0.0)
    val perm = Array(id(1), id(0), id(3), id(2))
    val neg = Array.tabulate(4, 4)((i, j) => if (i == j) -1.0 else 0.0)
    for (q <- Seq(id, perm, neg))
      assert(tr(r) >= tr(q) - 1e-9, s"Procrustes trace ${tr(r)} < ${tr(q)}")
  }

  test("opqTrain: orthogonal rotation, bit-deterministic across runs") {
    val emb = correlatedRows(300)
    val (mu1, r1, b1) = Ann.opqTrain(emb, "vec_id", "embedding", m = 4, k = 8)
    val (mu2, r2, b2) = Ann.opqTrain(emb, "vec_id", "embedding", m = 4, k = 8)
    assert(mu1.toSeq == mu2.toSeq)
    assert(r1.map(_.toSeq).toSeq == r2.map(_.toSeq).toSeq,
      "rotation matrix not bit-reproducible")
    assert(b1 == b2, "codebooks not bit-reproducible")
    for (i <- r1.indices; j <- r1.indices) {
      val dot = r1(i).indices.map(k => r1(i)(k) * r1(j)(k)).sum
      assert(math.abs(dot - (if (i == j) 1.0 else 0.0)) < 1e-9,
        s"R R^T [$i][$j] = $dot")
    }
  }

  /** Driver-side replica of project→assign→reconstruct for fixture-sized
    * checks: total squared PQ reconstruction error in the rotated space.
    */
  private def reconError(raw: Seq[(Long, Seq[Float])], mu: Array[Double],
      rot: Array[Array[Double]], books: Seq[Seq[(Int, Seq[Double])]]): Double = {
    val m = books.size
    val sub = mu.length / m
    raw.map { case (_, vf) =>
      val x = vf.toArray.map(_.toDouble).zip(mu).map { case (a, b) => a - b }
      val y = rot.map(row => row.zip(x).map { case (w, c) => w * c }.sum)
      (0 until m).map { s =>
        val sv = y.slice(s * sub, (s + 1) * sub)
        books(s).map { case (_, c) =>
          sv.zip(c).map { case (a, b) => (a - b) * (a - b) }.sum
        }.min
      }.sum
    }.sum
  }

  test("opqTrain: learned rotation cuts reconstruction error vs identity PQ") {
    import spark.implicits._
    val emb = correlatedRows(400)
    val raw = emb.select("vec_id", "embedding").as[(Long, Seq[Float])]
      .collect().toSeq.sortBy(_._1)
    val d = 8
    val id = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    val (mu0, r0, b0) = Ann.opqTrain(emb, "vec_id", "embedding", 4, 8,
      iterations = 1, initRotation = "identity")
    assert(r0.map(_.toSeq).toSeq == id.map(_.toSeq).toSeq,
      "identity-init iterations=1 must return the identity rotation")
    val (mu, r, b) = Ann.opqTrain(emb, "vec_id", "embedding", 4, 8,
      iterations = 3)
    val e0 = reconError(raw, mu0, r0, b0)
    val e1 = reconError(raw, mu, r, b)
    assert(e1 < e0,
      s"OPQ error $e1 not below identity-rotation PQ error $e0")
  }

  /** The OPQ paper's showcase shape (Ge et al. 2013 §1, fast-decaying
    * spectrum): 8 independent latents with GEOMETRIC variances 2^-d,
    * mixed by the (orthogonal, deterministic) normalized 8×8 Hadamard —
    * round-robin PCA then pairs PCs (s, s+4) into subspaces with ~60×
    * variance imbalance, exactly the state a learned rotation fixes.
    */
  private def geometricRows(n: Int) = {
    import spark.implicits._
    (0 until n).map { i =>
      def lcg(s: Int) = { var x = i * 2654435761L + s * 40503L
        x = (x ^ (x >>> 13)) * 1099511628211L
        ((x >>> 20) % 2000).toDouble / 1000.0 - 1.0 }
      val z = Array.tabulate(8)(d => lcg(d) * math.pow(2.0, -d.toDouble))
      val v = Array.tabulate(8) { r =>
        (0 until 8).map { c =>
          val sign = if (Integer.bitCount(r & c) % 2 == 0) 1.0 else -1.0
          sign * z(c)
        }.sum / math.sqrt(8.0)
      }
      (i.toLong, v.toSeq.map(_.toFloat))
    }.toDF("vec_id", "embedding")
  }

  test("opqTrain: OPQ recall and objective >= round-robin-PCA on correlated data") {
    import spark.implicits._
    val emb = geometricRows(400)
    val raw = emb.select("vec_id", "embedding").as[(Long, Seq[Float])]
      .collect().toSeq.sortBy(_._1)
    val nQ = 50
    // exact L2 top-5 per query (same metric as ADC; rotation-invariant)
    val vecs = raw.map { case (id, v) => id -> v.map(_.toDouble).toArray }.toMap
    val exact = (0L until nQ.toLong).map { q =>
      q -> vecs.keys.filter(_ != q).toSeq.sortBy { c =>
        (vecs(q).zip(vecs(c)).map { case (a, b) => (a - b) * (a - b) }.sum, c)
      }.take(5).toSet
    }.toMap
    def recallOf(mu: Array[Double], rot: Array[Array[Double]],
        books: Seq[Seq[(Int, Seq[Double])]]): Double = {
      val proj = Ann.pcaProject(emb, "vec_id", "embedding", mu, rot)
        .select(col("vec_id"), col("rotated"))
      val top = Ann.pqTopK(proj, proj.filter(col("vec_id") < nQ),
          "vec_id", "rotated", books, k = 8, topK = 5)
        .select("query_id", "neighbor_id").as[(Long, Long)].collect()
      val hits = top.count { case (q, nb) => exact(q).contains(nb) }
      hits.toDouble / (nQ * 5)
    }
    val (muO, rO, bO) = Ann.opqTrain(emb, "vec_id", "embedding", 4, 8,
      iterations = 5, pqIterations = 3)
    val (muP, rP) = Ann.pcaTrain(emb, "vec_id", "embedding", outDims = 8,
      pqSubspaces = 4)
    val projP = Ann.pcaProject(emb, "vec_id", "embedding", muP, rP)
      .select(col("vec_id"), col("rotated"))
    val bP = Ann.pqCodebooks(projP, "vec_id", "rotated", 4, 8, iterations = 3)
    // the guaranteed relation first: OPQ starts FROM the PCA-RR rotation
    // and every alternation (Lloyd, Procrustes) non-increases the
    // quantization objective
    val errO = reconError(raw, muO, rO, bO)
    val errP = reconError(raw, muP, rP, bP)
    assert(errO <= errP + 1e-9,
      s"OPQ objective $errO above its PCA-RR starting point $errP")
    val rOpq = recallOf(muO, rO, bO)
    val rPca = recallOf(muP, rP, bP)
    assert(rOpq >= rPca,
      s"OPQ recall $rOpq below round-robin-PCA recall $rPca")
  }

  test("LexIndex: build-once/serve-many equals the one-shot forms across a parquet round-trip") {
    import spark.implicits._
    import graft.operators.Retrieval
    val docs = Tables.t(spark, sfDir, "documents").limit(300)
    val idx = Retrieval.lexIndexBuild(docs, "doc_id", "text")
    val d = java.nio.file.Files.createTempDirectory("lexidx").toString
    idx.positional.write.mode("overwrite").parquet(s"$d/positional")
    idx.postings.write.mode("overwrite").parquet(s"$d/postings")
    idx.idf.write.mode("overwrite").parquet(s"$d/idf")
    val served = Retrieval.LexIndex(
      spark.read.parquet(s"$d/positional"),
      spark.read.parquet(s"$d/postings"),
      spark.read.parquet(s"$d/idf"))
    val phrases = Map(1 -> "table hash", 2 -> "slow key", 3 -> "a a")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).toSet
    assert(rows(Retrieval.phraseSearch(served, phrases)) ==
      rows(Retrieval.phraseSearch(docs, "doc_id", "text", phrases)),
      "served phrase search diverged from the one-shot form")
    val queries = Seq((0, "slow"), (0, "key"), (1, "table"), (1, "hash"))
      .toDF("query_id", "term")
    assert(rows(Retrieval.tfIdfTopK(served, queries, 5)) ==
      rows(Retrieval.tfIdfTopK(docs, "doc_id", "text", queries, 5)),
      "served TF-IDF diverged from the one-shot form")
  }

  test("relational GA profiles equal the typed-flatMap tier on the full fixture") {
    import graft.operators.GaTransform
    val sessions = graft.queries.VendorPackOps.gaFixture(spark, sfDir,
      withHit = false)
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select(col("distinct_id"),
          map_entries(col("set")).as("es"))
        .selectExpr("distinct_id",
          "array_sort(es, (a, b) -> CASE WHEN a.key < b.key THEN -1 " +
            "WHEN a.key > b.key THEN 1 ELSE 0 END) AS es")
        .collect().map(r => (r.getString(0), r.getSeq[Any](1))).toMap
    val rel = canon(GaTransform.profiles(spark, sessions))
    val typed = canon(GaTransform.profilesTyped(spark, sessions))
    assert(rel.size == typed.size && rel == typed,
      s"relational profiles diverged: ${rel.size} vs ${typed.size} rows")
  }
}
