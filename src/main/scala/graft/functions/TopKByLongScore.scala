package graft.functions

import java.io.{ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** [[TopKByScore]] with a LONG score — bounded per-group top-k (score
  * desc, id asc) whose comparisons stay in 64-bit integer space end to
  * end. Exists because casting an integer selection key to double loses
  * exactness above 2^53: the DSIR resampler's `key_micro` is a micro-unit
  * LONG with a documented integer-exact tie-break contract, and a
  * double-keyed heap would silently merge distinct keys for very
  * high-weight docs at large scale. Same map-side-partial economics as
  * [[TopKByScore]]: each task reduces to ≤k pairs per group before the
  * shuffle.
  */
case class TopKByLongScore(
    scoreExpr: Expression,
    idExpr: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKByLongScore.Buf] {

  require(k > 0, s"topk needs k > 0, got $k")

  // callers cast: score and id to long
  override def children: Seq[Expression] = Seq(scoreExpr, idExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("score", LongType), StructField("id", LongType))), containsNull = false)

  override def createAggregationBuffer(): TopKByLongScore.Buf =
    new TopKByLongScore.Buf(k)

  override def update(buf: TopKByLongScore.Buf, input: InternalRow): TopKByLongScore.Buf = {
    val s = scoreExpr.eval(input)
    val i = idExpr.eval(input)
    if (s != null && i != null) buf.add(s.asInstanceOf[Long], i.asInstanceOf[Long])
    buf
  }

  override def merge(buf: TopKByLongScore.Buf, other: TopKByLongScore.Buf): TopKByLongScore.Buf = {
    other.foreach(buf.add)
    buf
  }

  /** best-first array<struct<score,id>> */
  override def eval(buf: TopKByLongScore.Buf): Any =
    new GenericArrayData(buf.sortedBestFirst.map(p =>
      InternalRow(p._1, p._2): Any))

  override def serialize(buf: TopKByLongScore.Buf): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { (s, i) => out.writeLong(s); out.writeLong(i) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): TopKByLongScore.Buf = {
    val in = new DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = new TopKByLongScore.Buf(k)
    var j = 0
    while (j < n) { buf.add(in.readLong(), in.readLong()); j += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKByLongScore =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKByLongScore =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKByLongScore =
    copy(scoreExpr = newChildren(0), idExpr = newChildren(1))
  override def prettyName: String = "topk_by_long_score"
}

object TopKByLongScore {

  /** k-bounded binary min-heap on "badness" (root = worst kept pair) —
    * the [[TopKByScore.Buf]] layout with exact LONG comparisons.
    */
  final class Buf(k: Int) {
    private val scores = new Array[Long](k)
    private val ids = new Array[Long](k)
    private var n = 0

    def size: Int = n

    // a is worse than b: lower score, or same score and larger id
    private def worse(sa: Long, ia: Long, sb: Long, ib: Long): Boolean =
      sa < sb || (sa == sb && ia > ib)

    def add(s: Long, i: Long): Unit = {
      if (n < k) {
        var c = n
        scores(c) = s; ids(c) = i; n += 1
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

    def foreach(f: (Long, Long) => Unit): Unit = {
      var j = 0
      while (j < n) { f(scores(j), ids(j)); j += 1 }
    }

    /** (score, id) pairs, best (highest score, then lowest id) first. */
    def sortedBestFirst: Array[(Long, Long)] = {
      val arr = new Array[(Long, Long)](n)
      var j = 0
      while (j < n) { arr(j) = (scores(j), ids(j)); j += 1 }
      arr.sortWith((a, b) => worse(b._1, b._2, a._1, a._2))
    }
  }
}
