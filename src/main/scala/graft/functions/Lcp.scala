package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for the longest-common-prefix length (in
  * CHARACTERS, capped at `cap`) of two string columns.
  *
  * This is the per-edge kernel of suffix-array duplicate-span detection
  * ([[graft.operators.SuffixArray.dupSpans]]): every rank-adjacent suffix
  * pair computes one LCP, so the corpus pays n of these. The composable
  * form — `aggregate(sequence(1, cap), ...)` over per-prefix `substring`
  * equality — allocates cap substrings and compares O(cap²) characters per
  * pair; this expression is a single allocation-free byte loop with early
  * exit, inside whole-stage codegen (`defineCodeGen` → static call).
  *
  * Byte-level compare is char-exact: a byte mismatch inside a UTF-8
  * sequence implies a codepoint mismatch, so the byte-LCP truncated back
  * to a codepoint boundary equals the char-LCP. The char walk also
  * enforces the cap in characters, matching the oracle's
  * `list_filter(range(1, cap+1), i -> prefix_i(a) = prefix_i(b))` count.
  */
case class CommonPrefixLen(left: Expression, right: Expression, cap: Int)
  extends BinaryExpression {

  require(cap > 0, s"cap must be positive, got $cap")

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"common_prefix_len needs two STRING inputs, got ${l.catalogString}, ${r.catalogString}")
    }

  override def nullSafeEval(a: Any, b: Any): Any =
    CommonPrefixLen.lcpChars(
      a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String], cap)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.CommonPrefixLen.lcpChars($a, $b, $cap)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CommonPrefixLen =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "common_prefix_len"
}

object CommonPrefixLen {

  /** Tight loop shared by codegen and interpreted eval: byte-LCP with
    * early exit, then a char walk that counts whole codepoints inside the
    * common byte prefix, capped at `cap` chars.
    */
  def lcpChars(a: UTF8String, b: UTF8String, cap: Int): Int = {
    val max = math.min(a.numBytes(), b.numBytes())
    var i = 0
    while (i < max && a.getByte(i) == b.getByte(i)) i += 1
    // i = common prefix in BYTES; count whole chars that fit inside it
    var chars = 0
    var p = 0
    while (chars < cap && p < i) {
      val w = UTF8String.numBytesForFirstByte(a.getByte(p))
      if (p + w > i) return chars
      p += w
      chars += 1
    }
    chars
  }
}
