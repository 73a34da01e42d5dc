package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType, LongType}

/** Shared hashing for the bloom build/probe pair. Double hashing
  * (Kirsch–Mitzenmacher): probe_i = h1 + i·h2 over the 64-bit
  * Murmur3 finalizer of the key — public-domain mixing constants.
  * Build (aggregate) and probe (scalar expression) MUST use this one
  * implementation so a bit set on the build side is the bit tested on
  * the probe side.
  */
object BloomUtil {
  /** Murmur3 64-bit finalizer (public domain). */
  def fmix64(k0: Long): Long = {
    var k = k0
    k ^= k >>> 33
    k *= 0xff51afd7ed558ccdL
    k ^= k >>> 33
    k *= 0xc4ceb9fe1a85ec53L
    k ^= k >>> 33
    k
  }

  def setBit(words: Array[Long], key: Long, numHashes: Int): Unit = {
    val numBits = words.length.toLong * 64
    val h1 = fmix64(key)
    val h2 = fmix64(key ^ 0x9e3779b97f4a7c15L)
    var i = 0
    while (i < numHashes) {
      val bit = ((h1 + i * h2) & Long.MaxValue) % numBits
      words((bit >>> 6).toInt) |= 1L << (bit & 63)
      i += 1
    }
  }

  /** Probe entry point referenced from generated code (see
    * [[BloomMightContain.doGenCode]]) — keep signature stable.
    */
  def mightContain(bytes: Array[Byte], key: Long, numHashes: Int): Boolean = {
    val numBits = bytes.length.toLong * 8
    val h1 = fmix64(key)
    val h2 = fmix64(key ^ 0x9e3779b97f4a7c15L)
    var i = 0
    while (i < numHashes) {
      val bit = ((h1 + i * h2) & Long.MaxValue) % numBits
      if ((bytes((bit >>> 3).toInt) & (1 << (bit & 7))) == 0) return false
      i += 1
    }
    true
  }

  def wordsToBytes(words: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(words.length * 8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.asLongBuffer().put(words)
    bb.array()
  }

  def bytesToWords(bytes: Array[Byte]): Array[Long] = {
    val words = new Array[Long](bytes.length / 8)
    java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .asLongBuffer().get(words)
    words
  }
}

/** Bloom-filter build aggregate over a LONG key column → BinaryType bitset.
  *
  * This is the build half of runtime semi-join pruning (the same idea as
  * Spark's own InjectRuntimeFilter rewrite, re-expressed as a first-class
  * operator): aggregate the SMALL side's join keys into a fixed-size
  * bitset, then prefilter the BIG side with [[BloomMightContain]] before
  * the exact join. The bitset size is chosen at plan time (numBits), so
  * the aggregate's shuffle carries exactly numBits/8 bytes per partial —
  * map-side combine reduces each task's slice to one buffer, and the merge
  * is a word-wise OR. At 100 TB the big side never shuffles rows that
  * cannot join (modulo the false-positive rate); the exact join that
  * follows removes false positives, so results stay exact.
  */
case class BloomFilterAgg(
    child: Expression,
    numBits: Int,
    numHashes: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  require(numBits > 0 && numBits % 64 == 0, s"numBits must be a positive multiple of 64, got $numBits")
  require(numHashes > 0, s"numHashes must be positive, got $numHashes")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bloom_filter_build needs BIGINT input, got ${child.dataType.catalogString}")

  override def createAggregationBuffer(): Array[Long] = new Array[Long](numBits / 64)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) BloomUtil.setBit(buf, v.asInstanceOf[Long], numHashes)
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buf.length) { buf(i) |= other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any = BloomUtil.wordsToBytes(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = BloomUtil.wordsToBytes(buf)
  override def deserialize(bytes: Array[Byte]): Array[Long] = BloomUtil.bytesToWords(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomFilterAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomFilterAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BloomFilterAgg =
    copy(child = newChildren(0))
  override def prettyName: String = "bloom_filter_build"
}

/** Probe half: true when `child` (LONG) may be in the bloom bitset built by
  * [[BloomFilterAgg]]; false means definitely absent. The bitset is a
  * plan-time constant (driver-materialized, like broadcast join keys), held
  * as a reference object so generated code indexes the shared byte array
  * directly — the probe stays inside whole-stage codegen with zero
  * per-row allocation.
  */
case class BloomMightContain(child: Expression, bloom: Array[Byte], numHashes: Int)
  extends UnaryExpression {

  override def dataType: DataType = BooleanType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bloom_might_contain needs BIGINT input, got ${child.dataType.catalogString}")

  override def nullSafeEval(input: Any): Any =
    BloomUtil.mightContain(bloom, input.asInstanceOf[Long], numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bloomRef = ctx.addReferenceObj("bloom", bloom, "byte[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.BloomUtil.mightContain($bloomRef, $c, $numHashes)")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomMightContain =
    copy(child = newChild)

  override def prettyName: String = "bloom_might_contain"
}
