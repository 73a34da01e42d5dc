package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for the engine's portable polynomial rolling
  * hash: h = fold(0, (h*31 + byte) mod 1e9+7) over the string's ASCII
  * bytes.
  *
  * Exists because the composable form
  * (`aggregate(transform(split(s,"")...))`) runs as an interpreted
  * higher-order-function lambda — no whole-stage codegen, one closure call
  * per character. This expression participates in codegen with a tight
  * byte loop (`doGenCode`), keeping MinHash/SimHash/fingerprint pipelines
  * inside WholeStageCodegen at corpus scale.
  *
  * Semantics match [[Fns.rollingHash]] exactly for ASCII input (the
  * engine's tokenizers lowercase + split on whitespace first); for
  * multi-byte UTF-8, bytes are folded individually which matches
  * DuckDB's `ascii()` only on ASCII — documented engine contract.
  */
case class RollingHash(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"rolling_hash needs STRING input, got ${child.dataType.catalogString}")

  override def nullSafeEval(input: Any): Any =
    RollingHash.hash(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.RollingHash.hash($c)")

  override protected def withNewChildInternal(newChild: Expression): RollingHash =
    copy(child = newChild)

  override def prettyName: String = "rolling_hash"
}

object RollingHash {
  final val Mod: Long = 1000000007L

  /** Tight loop over UTF-8 bytes (codegen + interpreted entry point). */
  def hash(s: UTF8String): Long = {
    if (s == null) return 0L
    val bytes = s.getBytes
    var h = 0L
    var i = 0
    while (i < bytes.length) {
      h = (h * 31 + (bytes(i) & 0xff)) % Mod
      i += 1
    }
    h
  }
}
