package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** HyperLogLog register vector (Flajolet et al. 2007) as a mergeable
  * aggregate — the CARDINALITY member of the engine's sketch family
  * ([[MisraGries]] = heavy hitters, [[CountMin]] = point frequency):
  * `m` registers, update takes elementwise MAX of the observed rank,
  * merge is elementwise MAX. Max is commutative and idempotent, so like
  * CountMin (and unlike MG) the sketch content is fully DETERMINISTIC —
  * independent of partitioning, merge order, and duplicate arrivals —
  * and an oracle can replay every register relationally from the same
  * portable hashes.
  *
  * Hash derivation (all mod P = 1e9+7, the engine-wide constants):
  *   bucket(key) = rollingHash(key) mod m
  *   v(key)      = (3·rollingHash(key) + 43) mod P    (the i=1 member of
  *                 the MinHash permutation family — decorrelates the
  *                 rank bits from the bucket bits)
  *   rank(key)   = trailingZeros(v) + 1, or 31 when v = 0 (v < 2^30 ⇒
  *                 31 exceeds any attainable trailing-zero rank + 1)
  * register[j] = max rank over keys with bucket = j (0 when empty).
  * Replayable in SQL as bit_count((v & -v) - 1) + 1.
  *
  * eval returns the m registers as array<int>; the standard HLL
  * estimate is a downstream fold over them — its integer-exact core,
  * Σ 2^(30 − register), is SQL-expressible, while the final
  * alpha-corrected float division is not hash-portable and is left to
  * the caller (the approx_distinct precedent: gate the deterministic
  * part).
  */
case class HllRegisters(
    child: Expression,
    m: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Int]] {

  require(m >= 16 && m <= (1 << 16) && (m & (m - 1)) == 0,
    s"hll_registers needs m a power of two in [16, 65536], got $m")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def createAggregationBuffer(): Array[Int] = new Array[Int](m)

  override def update(buf: Array[Int], input: InternalRow): Array[Int] = {
    val v = child.eval(input)
    if (v != null) {
      val h = CountMin.baseHash(v.asInstanceOf[UTF8String])
      val bucket = (h % m).toInt
      val perm = (3L * h + 43L) % CountMin.P
      val rank =
        if (perm == 0L) 31
        else java.lang.Long.numberOfTrailingZeros(perm) + 1
      if (rank > buf(bucket)) buf(bucket) = rank
    }
    buf
  }

  override def merge(buf: Array[Int], other: Array[Int]): Array[Int] = {
    var i = 0
    while (i < m) { if (other(i) > buf(i)) buf(i) = other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Int]): Any =
    new GenericArrayData(buf.map(x => x: Any))

  override def serialize(buf: Array[Int]): Array[Byte] = {
    // registers are ≤ 31: one byte each
    val out = new Array[Byte](m)
    var i = 0
    while (i < m) { out(i) = buf(i).toByte; i += 1 }
    out
  }

  override def deserialize(bytes: Array[Byte]): Array[Int] = {
    val buf = new Array[Int](m)
    var i = 0
    while (i < m) { buf(i) = bytes(i).toInt; i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): HllRegisters =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HllRegisters =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): HllRegisters =
    copy(child = newChildren(0))
  override def prettyName: String = "hll_registers"
}
