package graft

import org.apache.spark.sql.functions._
import graft.operators.Ann

/** Round-11 second-session specs: IVF-PQ incremental append (index
  * maintenance without retraining — the FAISS `add()` contract).
  */
class Round11bOpsSpec extends SparkSpec {

  private def emb = Tables.t(spark, sfDir, "embeddings")

  private def encRows(i: Ann.IvfPqIndex): Set[(Long, Seq[Int], Int)] =
    i.encoded.select(col("id"), col("codes"), col("centroid").cast("int"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Int](1).toList: Seq[Int], r.getInt(2)))
      .toSet

  test("ivfPqAppend: count, frozen-quantizer codes, associativity") {
    val base = emb.filter(col("vec_id") < 300)
    val b1 = emb.filter(col("vec_id") >= 300 && col("vec_id") < 400)
    val b2 = emb.filter(col("vec_id") >= 400)
    val idx = Ann.ivfPqBuild(base, "vec_id", "embedding", nLists = 8, m = 4, k = 16)

    val oneShot = Ann.ivfPqAppend(idx, b1.unionByName(b2), "vec_id", "embedding")
    val chained = Ann.ivfPqAppend(
      Ann.ivfPqAppend(idx, b1, "vec_id", "embedding"), b2, "vec_id", "embedding")

    assert(oneShot.encoded.count() === 500L)
    // quantizers are frozen: append order cannot change a single code row
    assert(encRows(oneShot) === encRows(chained))
    // old rows are untouched — the base index's rows survive verbatim
    val baseRows = encRows(idx)
    assert(baseRows.subsetOf(encRows(oneShot)))
    // books and centroids are the SAME objects (no retrain happened)
    assert(oneShot.books == idx.books && chained.books == idx.books)
  }

  test("ivfPqAppend: residual-coded index displaces against the assigned centroid") {
    val base = emb.filter(col("vec_id") < 400)
    val batch = emb.filter(col("vec_id") >= 400)
    val idx = Ann.ivfPqBuild(base, "vec_id", "embedding",
      nLists = 8, m = 4, k = 16, byResidual = true)
    val app = Ann.ivfPqAppend(idx, batch, "vec_id", "embedding")
    assert(app.encoded.count() === 500L)
    // bit-determinism: appending the same batch twice to the same index
    // yields identical code rows
    val app2 = Ann.ivfPqAppend(idx, batch, "vec_id", "embedding")
    assert(encRows(app) === encRows(app2))
  }

  test("ivfPqAppend: serving sees appended rows through the same plan") {
    val base = emb.filter(col("vec_id") < 450)
    val batch = emb.filter(col("vec_id") >= 450)
    val idx = Ann.ivfPqBuild(base, "vec_id", "embedding", nLists = 8, m = 4, k = 16)
    val app = Ann.ivfPqAppend(idx, batch, "vec_id", "embedding")
    val queries = emb.filter(col("vec_id") >= 450)
    val res = Ann.ivfPqSearch(app, queries, "vec_id", "embedding",
      nprobe = 4, topK = 10)
    assert(res.count() > 0)
    // a query never ranks itself, but appended ids ARE rankable neighbors
    val neighbors = res.select("neighbor_id").distinct()
      .collect().map(_.getLong(0)).toSet
    assert(neighbors.exists(_ >= 450),
      "appended vectors never surfaced as neighbors")
    val self = res.filter(col("query_id") === col("neighbor_id")).count()
    assert(self === 0L)
  }
}
