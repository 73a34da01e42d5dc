package graft.functions

import java.io.{ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded top-k aggregate: keeps the k (score, id) pairs with the highest
  * score per group — ties broken by ascending id, matching
  * `row_number().over(orderBy(score.desc, id))` exactly.
  *
  * Exists because the window formulation shuffles AND FULLY SORTS every
  * scored candidate row per group — at ANN scale that is |queries|×|corpus|
  * rows through one sort. As a TypedImperativeAggregate this runs with
  * map-side partial aggregation: each task reduces its slice to ≤k pairs
  * per group before the shuffle, so the exchange carries O(groups × k)
  * bytes no matter how many candidates were scored — the 100×-safe plan.
  *
  * Buffer is a k-bounded binary min-heap keyed by "badness" (lowest score
  * worst; ties: larger id worse), so update is O(log k) and memory is O(k).
  *
  * `distinctIds=true` additionally drops an (score, id) candidate whose id
  * is already held (O(k) membership scan — k is a beam width, ≤ ~100).
  * ONLY valid when every occurrence of an id within a group carries the
  * SAME score (true for the graph walks: the score is a deterministic
  * function of (query, id)); it lets the beam-search rounds feed raw
  * multi-hop frontier expansions straight into the aggregate with NO
  * distinct() exchange and NO seen-set anti-join — each removed exchange
  * is a removed AQE job barrier, the measured cost driver at serve grain.
  */
case class TopKByScore(
    scoreExpr: Expression,
    idExpr: Expression,
    k: Int,
    distinctIds: Boolean = false,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKByScore.Buf] {

  require(k > 0, s"topk needs k > 0, got $k")

  // callers cast: score to double, id to long (no ExpectsInputTypes —
  // AbstractDataType is sql-private)
  override def children: Seq[Expression] = Seq(scoreExpr, idExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("score", DoubleType), StructField("id", LongType))), containsNull = false)

  override def createAggregationBuffer(): TopKByScore.Buf =
    new TopKByScore.Buf(k, distinctIds)

  override def update(buf: TopKByScore.Buf, input: InternalRow): TopKByScore.Buf = {
    val s = scoreExpr.eval(input)
    val i = idExpr.eval(input)
    if (s != null && i != null) buf.add(s.asInstanceOf[Double], i.asInstanceOf[Long])
    buf
  }

  override def merge(buf: TopKByScore.Buf, other: TopKByScore.Buf): TopKByScore.Buf = {
    other.foreach(buf.add)
    buf
  }

  /** best-first array<struct<score,id>> */
  override def eval(buf: TopKByScore.Buf): Any =
    new GenericArrayData(buf.sortedBestFirst.map(p =>
      InternalRow(p._1, p._2): Any))

  override def serialize(buf: TopKByScore.Buf): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { (s, i) => out.writeDouble(s); out.writeLong(i) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): TopKByScore.Buf = {
    val in = new DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = new TopKByScore.Buf(k, distinctIds)
    var j = 0
    while (j < n) { buf.add(in.readDouble(), in.readLong()); j += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKByScore =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKByScore =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKByScore =
    copy(scoreExpr = newChildren(0), idExpr = newChildren(1))
  override def prettyName: String = "topk_by_score"
}

object TopKByScore {

  /** k-bounded binary min-heap on "badness": heap root is the WORST kept
    * pair, evicted when a better candidate arrives at capacity.
    * `distinctIds` drops candidates whose id is already held (callers
    * guarantee same-id ⇒ same-score, so which copy wins is immaterial).
    */
  final class Buf(k: Int, distinctIds: Boolean = false) {
    private val scores = new Array[Double](k)
    private val ids = new Array[Long](k)
    private var n = 0

    def size: Int = n

    // a is worse than b: lower score, or same score and larger id
    private def worse(sa: Double, ia: Long, sb: Double, ib: Long): Boolean =
      sa < sb || (sa == sb && ia > ib)

    private def contains(i: Long): Boolean = {
      var j = 0
      while (j < n) { if (ids(j) == i) return true; j += 1 }
      false
    }

    def add(s: Double, i: Long): Unit = {
      if (distinctIds && contains(i)) return
      if (n < k) {
        var c = n
        scores(c) = s; ids(c) = i; n += 1
        // sift up (root = worst)
        while (c > 0 && worse(scores(c), ids(c), scores((c - 1) / 2), ids((c - 1) / 2))) {
          swap(c, (c - 1) / 2); c = (c - 1) / 2
        }
      } else if (worse(scores(0), ids(0), s, i)) {
        scores(0) = s; ids(0) = i
        siftDown(0)
      }
    }

    private def swap(a: Int, b: Int): Unit = {
      val ts = scores(a); scores(a) = scores(b); scores(b) = ts
      val ti = ids(a); ids(a) = ids(b); ids(b) = ti
    }

    private def siftDown(start: Int): Unit = {
      var c = start
      var done = false
      while (!done) {
        val l = 2 * c + 1
        val r = 2 * c + 2
        var w = c
        if (l < n && worse(scores(l), ids(l), scores(w), ids(w))) w = l
        if (r < n && worse(scores(r), ids(r), scores(w), ids(w))) w = r
        if (w == c) done = true else { swap(c, w); c = w }
      }
    }

    def foreach(f: (Double, Long) => Unit): Unit = {
      var j = 0
      while (j < n) { f(scores(j), ids(j)); j += 1 }
    }

    /** (score, id) pairs, best (highest score, then lowest id) first. */
    def sortedBestFirst: Array[(Double, Long)] = {
      val arr = new Array[(Double, Long)](n)
      var j = 0
      while (j < n) { arr(j) = (scores(j), ids(j)); j += 1 }
      arr.sortWith((a, b) => worse(b._1, b._2, a._1, a._2))
    }
  }
}
