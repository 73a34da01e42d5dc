package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst expression for a literal-matrix rotation of a centered
  * vector: y_j = Σ_i (v_i − μ_i) · R_{j,i}, accumulated in ascending-i
  * order per output dim.
  *
  * Exists for the same reason as [[L2Dist]]/[[CosineSim]]: the composable
  * HOF form (one `aggregate(zip_with(zip_with(v,μ,−), R_j, ·))` column per
  * output dim) is an interpreted lambda — d² closure calls and d² boxed
  * Doubles per ROW — and, worse, Catalyst freely inlines the d-column
  * array alias into downstream consumers (centArgmin's fold evaluates its
  * argument once per centroid), multiplying that cost by 16·m. Measured on
  * the OPQ build at sf0.1: 335 s HOF vs sub-second with this kernel. The
  * tight loop is the SAME per-dim sequential fold (center first, then
  * multiply-accumulate ascending i), so outputs are bit-identical to the
  * HOF form.
  *
  * The mean and matrix ride along as reference objects (driver-bounded by
  * [[graft.operators.Ann.MaxRotDims]]), not as literal expression trees —
  * the d=64 HOF tree serialized at 17 MiB per task binary; this is 33 KB.
  */
case class MatVec(child: Expression, mean: Array[Double],
    rot: Array[Array[Double]]) extends UnaryExpression {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"mat_vec needs an ARRAY<DOUBLE> input, got ${other.catalogString}")
    }

  override def nullSafeEval(v: Any): Any =
    MatVec.rotate(v.asInstanceOf[ArrayData], mean, rot)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val meanRef = ctx.addReferenceObj("mvMean", mean, "double[]")
    val rotRef = ctx.addReferenceObj("mvRot", rot, "double[][]")
    defineCodeGen(ctx, ev, v =>
      s"graft.functions.MatVec.rotate($v, $meanRef, $rotRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): MatVec =
    copy(child = newChild)

  override def prettyName: String = "mat_vec"
}

object MatVec {

  /** Tight loop shared by codegen and interpreted eval. Center in
    * ascending-i order, then per output dim the ascending-i
    * multiply-accumulate — the exact fold order of the HOF form it
    * replaces, so every double is bit-identical.
    */
  def rotate(v: ArrayData, mean: Array[Double],
      rot: Array[Array[Double]]): ArrayData = {
    val d = v.numElements()
    val c = new Array[Double](d)
    var i = 0
    while (i < d) { c(i) = v.getDouble(i) - mean(i); i += 1 }
    val out = new Array[Double](rot.length)
    var j = 0
    while (j < rot.length) {
      val r = rot(j)
      var acc = 0.0
      var k = 0
      while (k < d) { acc += c(k) * r(k); k += 1 }
      out(j) = acc
      j += 1
    }
    new GenericArrayData(out)
  }
}
