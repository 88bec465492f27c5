package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Squared L2 distance of two float-array columns as a native binary
  * expression — the [[CosineSimF]] treatment applied to the k-means /
  * cell-family hot loop. The composed `zip_with`+`aggregate` form is
  * a codegen-fallback higher-order function that allocates an
  * intermediate array and dispatches a lambda per element; measured
  * on the in-cell NN self-join (emb_reciprocal_knn, ~0.5 M pairs ×
  * 64 dims at sf0.1) the native loop is the difference between the
  * composed form's cost and a tight codegen'd loop.
  *
  * Accumulates in double, index order — the SAME left-to-right fold
  * as the composed `KMeans.sqDist` it replaces and the oracle's
  * `list_reduce`, so every downstream integer snap is bit-identical.
  */
case class SqDistF(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "sq_dist_f"
  override def inputTypes = Seq(ArrayType(FloatType), ArrayType(FloatType))

  protected override def nullSafeEval(a: Any, b: Any): Any =
    SqDistImpl.sqDist(
      a.asInstanceOf[ArrayData].toFloatArray(),
      b.asInstanceOf[ArrayData].toFloatArray())

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.SqDistImpl.sqDist($a.toFloatArray(), $b.toFloatArray())")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SqDistF =
    copy(left = newLeft, right = newRight)
}

object SqDistImpl {
  def sqDist(a: Array[Float], b: Array[Float]): Double = {
    if (a.length != b.length)
      throw new IllegalArgumentException(
        s"sq_dist_f: dimension mismatch ${a.length} vs ${b.length}")
    var acc = 0.0
    var i = 0
    val n = a.length
    while (i < n) {
      val d = a(i).toDouble - b(i).toDouble
      acc += d * d
      i += 1
    }
    acc
  }
}
