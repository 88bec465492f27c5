package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Cosine similarity of two float-array columns as a native binary
  * expression: one primitive loop over the vectors, no per-element
  * lambda dispatch or boxing (the `zip_with`+`aggregate` composition
  * allocates an intermediate array per pair — measured 2.3 s for 80 K
  * pairs at sf0.1; this expression does the same work in a tight
  * double loop inside whole-stage codegen).
  *
  * Accumulates in double with the same left-to-right order as the
  * composed version, so results are bit-identical to the DuckDB oracle.
  */
case class CosineSimF(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_sim_f"
  // analysis-time typing: float arrays required; array<double> input is
  // coerced by the analyzer instead of being reinterpreted as garbage
  // by UnsafeArrayData.toFloatArray at runtime
  override def inputTypes = Seq(ArrayType(FloatType), ArrayType(FloatType))

  protected override def nullSafeEval(a: Any, b: Any): Any =
    CosineSimImpl.cosine(
      a.asInstanceOf[ArrayData].toFloatArray(),
      b.asInstanceOf[ArrayData].toFloatArray())

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.CosineSimImpl.cosine($a.toFloatArray(), $b.toFloatArray())")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimF =
    copy(left = newLeft, right = newRight)
}

object CosineSimImpl {
  def cosine(a: Array[Float], b: Array[Float]): Double = {
    if (a.length != b.length)
      throw new IllegalArgumentException(
        s"cosine_sim_f: dimension mismatch ${a.length} vs ${b.length}")
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    val n = a.length
    while (i < n) {
      val x = a(i).toDouble; val y = b(i).toDouble
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    // zero/empty vectors: similarity 0, not NaN (NaN sorts above every
    // double desc and would corrupt top-k rankings)
    if (na == 0.0 || nb == 0.0) 0.0 else dot / math.sqrt(na * nb)
  }
}
