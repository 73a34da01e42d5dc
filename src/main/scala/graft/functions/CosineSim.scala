package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst expression for cosine similarity of two `array<double>`
  * columns.
  *
  * Exists because the composable HOF form ([[Fns.cosine]]:
  * `aggregate(zip_with(...))`) runs as an interpreted lambda — one closure
  * call and one boxed Double per element per pair, which dominates all-pairs
  * similarity joins. This expression participates in whole-stage codegen
  * (`defineCodeGen` → static tight loop), so a broadcast-nested-loop
  * similarity join stays entirely inside generated code.
  *
  * Arithmetic is the same sequential left-fold as [[Fns.cosine]] (dot and
  * both norms accumulate in element order), so results are bit-identical to
  * the HOF form and stable across partitionings — required for the DuckDB
  * hash oracle (`list_dot_product` form, with `round(...,4)` absorbing
  * engine-boundary noise).
  *
  * Array elements must be non-null (the engine's embedding columns are);
  * null ARRAYS propagate null via the BinaryExpression null contract.
  */
case class CosineSim(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"cosine_sim needs two ARRAY<DOUBLE> inputs, got ${l.catalogString}, ${r.catalogString}")
    }

  override def nullSafeEval(a: Any, b: Any): Any =
    CosineSim.cosine(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.CosineSim.cosine($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSim =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "cosine_sim"
}

object CosineSim {

  /** Tight loop shared by codegen and interpreted eval. Fold order is
    * element order for dot and both norms — see class doc.
    */
  def cosine(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getDouble(i)
      val y = b.getDouble(i)
      dot += x * y
      na += x * x
      nb += y * y
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }
}
