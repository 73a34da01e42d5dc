package graft.functions

import java.io.{ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Log-bucketed quantile histogram — the DDSketch idea (Masson et al.,
  * VLDB 2019: relative-error quantiles from logarithmic buckets) with the
  * float log replaced by INTEGER bucket arithmetic, so the sketch is
  * bit-exact across engines and partitionings:
  *
  *  - exact region: values v < 2^(subBits+1) are their own bucket
  *    (small values answered exactly — the standard DDSketch low-range
  *    trick);
  *  - log region: bucket = (e, sub) where e = floor(log2 v) computed as
  *    63−nlz(v) and sub = the subBits bits after the leading one —
  *    relative error ≤ 2^−subBits per bucket, ~2^subBits buckets per
  *    octave, ≤ 64·2^subBits + 2^(subBits+1) buckets TOTAL for any
  *    long input (bounded state, like every sketch in this library);
  *  - negatives count into the dedicated bucket −1 (an error channel the
  *    caller can assert empty), nulls are skipped.
  *
  * Unlike KLL/GK/t-digest, bucket counts are SUMS — merge is addition,
  * so the sketch is order-independent and partitioning-invariant (the
  * library-wide determinism contract KLL-style compaction cannot meet).
  * Map-side partial aggregation reduces each task slice to the bounded
  * bucket map before the shuffle.
  *
  * Output: array<struct<b: long, n: long>> ascending by bucket id.
  * Quantile read-off (relational, both engines): walk the cumulative
  * counts to the target rank; the estimate is the bucket's LOWER BOUND
  * ([[LogHistogram.lowerBound]]) — integer, no geometric-mean float.
  */
case class LogHistogram(
    child: Expression,
    subBits: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeMap[java.lang.Long, java.lang.Long]] {

  require(subBits >= 1 && subBits <= 8,
    s"log_histogram needs subBits in 1..8, got $subBits")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("b", LongType, nullable = false),
      StructField("n", LongType, nullable = false))),
    containsNull = false)

  override def createAggregationBuffer(): java.util.TreeMap[java.lang.Long, java.lang.Long] =
    new java.util.TreeMap[java.lang.Long, java.lang.Long]()

  private def bump(buf: java.util.TreeMap[java.lang.Long, java.lang.Long],
      b: Long, n: Long): Unit = {
    val prev = buf.get(b)
    buf.put(b, if (prev == null) n else prev.longValue() + n)
  }

  override def update(buf: java.util.TreeMap[java.lang.Long, java.lang.Long],
      input: InternalRow): java.util.TreeMap[java.lang.Long, java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) bump(buf, LogHistogram.bucketOf(v.asInstanceOf[Long], subBits), 1L)
    buf
  }

  override def merge(buf: java.util.TreeMap[java.lang.Long, java.lang.Long],
      other: java.util.TreeMap[java.lang.Long, java.lang.Long]): java.util.TreeMap[java.lang.Long, java.lang.Long] = {
    val it = other.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      bump(buf, e.getKey.longValue(), e.getValue.longValue())
    }
    buf
  }

  override def eval(buf: java.util.TreeMap[java.lang.Long, java.lang.Long]): Any = {
    val arr = new Array[Any](buf.size)
    val it = buf.entrySet().iterator()
    var i = 0
    while (it.hasNext) {
      val e = it.next()
      arr(i) = InternalRow(e.getKey.longValue(), e.getValue.longValue())
      i += 1
    }
    new GenericArrayData(arr)
  }

  override def serialize(buf: java.util.TreeMap[java.lang.Long, java.lang.Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    val it = buf.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      out.writeLong(e.getKey.longValue())
      out.writeLong(e.getValue.longValue())
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeMap[java.lang.Long, java.lang.Long] = {
    val in = new DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) { bump(buf, in.readLong(), in.readLong()); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): LogHistogram =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): LogHistogram =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): LogHistogram =
    copy(child = newChildren(0))
  override def prettyName: String = "log_histogram"
}

object LogHistogram {

  /** Integer bucket id — see class doc. SQL dual (DuckDB):
    * `CASE WHEN v < 2^(s+1) THEN v ELSE 2^(s+1) + (length(bin(v))-1)*2^s
    *  + ((v >> (length(bin(v))-1-s)) - 2^s) END` (v ≥ 0; −1 for v < 0).
    */
  def bucketOf(v: Long, subBits: Int): Long = {
    val exactMax = 1L << (subBits + 1)
    if (v < 0) -1L
    else if (v < exactMax) v
    else {
      val e = 63 - java.lang.Long.numberOfLeadingZeros(v)
      val sub = (v >>> (e - subBits)) - (1L << subBits)
      exactMax + e.toLong * (1L << subBits) + sub
    }
  }

  /** Smallest value in bucket `b` — the integer quantile estimate. */
  def lowerBound(b: Long, subBits: Int): Long = {
    val exactMax = 1L << (subBits + 1)
    if (b < exactMax) b
    else {
      val code = b - exactMax
      val e = code >> subBits
      val sub = code & ((1L << subBits) - 1)
      ((1L << subBits) + sub) << (e.toInt - subBits)
    }
  }
}
