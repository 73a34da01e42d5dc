package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst expression for squared L2 distance of two
  * `array<double>` columns: Σ (a_i − b_i)², accumulated in element order.
  *
  * Exists for the same reason as [[CosineSim]]: the composable HOF form
  * (`aggregate(zip_with(a, b, (x,y) => (x-y)*(x-y)), 0.0, _+_)`) is an
  * interpreted lambda — one closure call and one boxed Double per element —
  * which dominates IVF k-means assignment (corpus × centroids × dims
  * evaluations per Lloyd round). The tight loop here is the SAME sequential
  * left-fold, so results are bit-identical to the HOF form and to the
  * DuckDB oracle's `list_reduce` fold.
  *
  * Array elements must be non-null; null ARRAYS propagate null via the
  * BinaryExpression null contract.
  */
case class L2Dist(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"l2_dist needs two ARRAY<DOUBLE> inputs, got ${l.catalogString}, ${r.catalogString}")
    }

  override def nullSafeEval(a: Any, b: Any): Any =
    L2Dist.dist2(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.L2Dist.dist2($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): L2Dist =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "l2_dist"
}

object L2Dist {

  /** Tight loop shared by codegen and interpreted eval; element-order fold. */
  def dist2(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    var acc = 0.0
    var i = 0
    while (i < n) {
      val d = a.getDouble(i) - b.getDouble(i)
      acc += d * d
      i += 1
    }
    acc
  }
}
