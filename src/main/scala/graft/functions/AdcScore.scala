package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Native Catalyst expression for the PQ asymmetric-distance (ADC) fold:
  * `Σ_s lut[s][codes[s]]` over subspaces in ascending order — the inner
  * loop of product-quantized search (Jégou et al. 2011, §III: m table
  * lookups + m−1 adds per corpus vector).
  *
  * Exists for the same reason as [[CosineSim]]: the composable
  * `element_at` chain interprets one boxed lookup per subspace per
  * (query, vector) pair, which dominates the pruned ADC scan; this
  * expression rides whole-stage codegen as one static tight loop. The
  * fold order is subspace-ascending — identical to the `t_0 + t_1 + …`
  * chain and the DuckDB oracle — so swapping it in changes no hash.
  *
  * `codes` holds 0-based slot indices (array<int>, length m); `lut` is
  * the per-query array<array<double>> of m×k distances. Out-of-range
  * codes are a caller-contract violation (pqEncode never emits one);
  * null ARRAYS propagate null via the BinaryExpression contract.
  */
case class AdcScore(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(IntegerType, _), ArrayType(ArrayType(DoubleType, _), _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          "adc_score needs (ARRAY<INT> codes, ARRAY<ARRAY<DOUBLE>> lut), " +
            s"got ${l.catalogString}, ${r.catalogString}")
    }

  override def nullSafeEval(a: Any, b: Any): Any =
    AdcScore.fold(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.AdcScore.fold($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): AdcScore =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "adc_score"
}

object AdcScore {

  /** Tight loop shared by codegen and interpreted eval; subspace-ascending
    * accumulation — see class doc.
    */
  def fold(codes: ArrayData, lut: ArrayData): Double = {
    val m = codes.numElements()
    var acc = 0.0
    var s = 0
    while (s < m) {
      acc += lut.getArray(s).getDouble(codes.getInt(s))
      s += 1
    }
    acc
  }
}
