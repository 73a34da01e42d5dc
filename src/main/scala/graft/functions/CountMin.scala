package graft.functions

import java.io.{ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Count-Min sketch (Cormode & Muthukrishnan 2005) as a mergeable
  * aggregate — the OVERESTIMATING counterpart of [[MisraGries]]: `d`
  * hash rows × `w` counters, update adds 1 to one counter per row,
  * merge is ELEMENTWISE SUM. Because every cell is a commutative sum,
  * the sketch content is fully DETERMINISTIC — independent of
  * partitioning and merge order — unlike MG, so an oracle can replicate
  * every estimate exactly: est(x) = min_i Σ_{y: h_i(y) = h_i(x)}
  * true(y), computable relationally from exact counts and the same
  * portable hash. Guarantees: est(x) ≥ true(x) always (point query
  * never undercounts); overestimate is bounded by colliding mass.
  *
  * Row hashes derive from the engine-wide portable rolling hash:
  * h_i(key) = rollingHash(key) permuted by the MinHash family
  * ((2i+1)·h + i²+i+41 mod p — [[Fns.permuteHash]]'s constants), then
  * mod w — every engine that can compute `rolling_hash` can replay the
  * sketch bit-for-bit.
  *
  * eval returns the full d×w counter matrix row-major as
  * array<bigint> (driver-bounded by d·w — size it like a bloom bitset).
  */
case class CountMin(
    child: Expression,
    d: Int,
    w: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  require(d >= 1 && d <= 16, s"count_min needs d in [1, 16], got $d")
  require(w >= 2 && w <= (1 << 20),
    s"count_min needs w in [2, 2^20], got $w — the sketch is d*w longs " +
      "per group")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): Array[Long] = new Array[Long](d * w)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = CountMin.baseHash(v.asInstanceOf[UTF8String])
      var i = 0
      while (i < d) {
        buf(i * w + CountMin.rowSlot(h, i, w)) += 1L
        i += 1
      }
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buf.length) { buf(i) += other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any =
    new GenericArrayData(buf.map(x => x: Any))

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    var i = 0
    while (i < buf.length) { out.writeLong(buf(i)); i += 1 }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val in = new DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val buf = new Array[Long](d * w)
    var i = 0
    while (i < buf.length) { buf(i) = in.readLong(); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CountMin =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CountMin =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): CountMin =
    copy(child = newChildren(0))
  override def prettyName: String = "count_min"
}

object CountMin {

  val P = 1000000007L

  /** The engine's portable rolling hash — the [[RollingHash]] kernel
    * itself, so sketch and oracle share one fold definition.
    */
  def baseHash(s: UTF8String): Long = RollingHash.hash(s)

  /** Row-i slot: the MinHash permutation family applied to the base hash,
    * then mod w — replayable as ((2i+1)*h + i*i+i+41) % p % w in SQL.
    */
  def rowSlot(h: Long, i: Int, w: Int): Int =
    ((((2L * i + 1) * h + (i.toLong * i + i + 41)) % P) % w).toInt
}
