package graft.functions

import java.io.{ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries heavy-hitters sketch as a mergeable aggregate (Misra &
  * Gries 1982; merge rule from Agarwal et al. 2013, "Mergeable
  * Summaries") — the streaming/distributed answer to "which keys exceed
  * an n/k frequency share" WITHOUT a full groupBy when the key domain is
  * unbounded (URLs, user ids, shingles at 100 TB).
  *
  * Buffer: ≤ k-1 (key, counter) pairs. Update is the classic offer —
  * increment a present key, insert below capacity, otherwise decrement
  * every counter (each decrement retires k arrivals, which is where the
  * n/k error bound comes from). Merge sums two summaries then subtracts
  * the k-th largest count from all and drops the non-positives — the
  * Agarwal et al. rule that keeps the TOTAL error ≤ n/k across any merge
  * tree, which is exactly what map-side partial aggregation needs: each
  * task sketches its slice, the exchange carries O(k) bytes per group.
  *
  * Guarantees (any merge order, any partitioning):
  *   est(x) ≤ true(x) ≤ est(x) + n/k, and every key with
  *   true(x) > n/k IS in the summary.
  * The summary CONTENT is merge-order dependent (like any sketch); only
  * the guarantees are deterministic — oracle queries must gate on
  * guarantee booleans (the approx_distinct/approx_quantile precedent),
  * never on raw estimates.
  *
  * eval returns map<string, bigint> with keys in sorted order (stable
  * output encoding for tests; lookups via element_at are order-blind).
  */
case class MisraGries(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[String, Long]] {

  require(k >= 2 && k <= 65536,
    s"misra_gries needs k in [2, 65536], got $k — the summary is O(k) " +
      "memory per group")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType =
    MapType(StringType, LongType, valueContainsNull = false)

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    new mutable.HashMap[String, Long]

  override def update(buf: mutable.HashMap[String, Long],
      input: InternalRow): mutable.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) MisraGries.offer(buf, v.toString, k)
    buf
  }

  override def merge(buf: mutable.HashMap[String, Long],
      other: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    other.foreach { case (key, c) =>
      buf.update(key, buf.getOrElse(key, 0L) + c)
    }
    MisraGries.shrink(buf, k)
    buf
  }

  override def eval(buf: mutable.HashMap[String, Long]): Any = {
    val entries = buf.toArray.sortBy(_._1)
    new ArrayBasedMapData(
      new GenericArrayData(entries.map(e => UTF8String.fromString(e._1): Any)),
      new GenericArrayData(entries.map(e => e._2: Any)))
  }

  override def serialize(buf: mutable.HashMap[String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (key, c) => out.writeUTF(key); out.writeLong(c) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Long] = {
    val in = new DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = new mutable.HashMap[String, Long]
    var j = 0
    while (j < n) { buf.update(in.readUTF(), in.readLong()); j += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGries =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGries =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MisraGries =
    copy(child = newChildren(0))
  override def prettyName: String = "misra_gries"
}

object MisraGries {

  /** Classic MG offer: increment / insert below k-1 / decrement-all.
    * The decrement pass is O(size) but retires k arrivals' worth of
    * count, so the amortized cost per row is O(1).
    */
  def offer(buf: mutable.HashMap[String, Long], key: String, k: Int): Unit =
    buf.get(key) match {
      case Some(c) => buf.update(key, c + 1)
      case None if buf.size < k - 1 => buf.update(key, 1L)
      case None =>
        val dead = mutable.ArrayBuffer.empty[String]
        buf.foreach { case (kk, c) =>
          if (c == 1L) dead += kk else buf.update(kk, c - 1)
        }
        dead.foreach(buf.remove)
    }

  /** Agarwal et al. merge shrink: subtract the k-th largest counter from
    * every counter and drop the non-positive — at most k-1 survive and
    * the error bound telescopes across any merge tree.
    */
  def shrink(buf: mutable.HashMap[String, Long], k: Int): Unit =
    if (buf.size > k - 1) {
      val cs = buf.values.toArray.sorted
      val sub = cs(cs.length - k)
      val dead = mutable.ArrayBuffer.empty[String]
      buf.foreach { case (kk, c) =>
        if (c - sub <= 0L) dead += kk else buf.update(kk, c - sub)
      }
      dead.foreach(buf.remove)
    }
}
