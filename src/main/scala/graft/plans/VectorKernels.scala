package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types._

/** Native vector kernels for the embedding operators (IVF assignment,
  * ANN scoring, cosine near-dup verify). The composed HOF forms
  * (`aggregate(zip_with(...))`) evaluate interpreted — per-element
  * lambda dispatch plus an intermediate product array per pair; these
  * run one fused loop per row inside whole-stage codegen.
  *
  * BIT-IDENTICAL to the HOF forms (VectorKernelsSpec): elements widen
  * float→double exactly, products accumulate left-to-right from 0.0
  * (the same IEEE op sequence), cosine keeps the contract shape
  * `dot / sqrt(aa*bb)` with all three dots folded in ONE pass — the
  * three accumulators are independent, so fusing changes no value.
  * Length-mismatched inputs return null exactly like zip_with's
  * null-padding turns the aggregate null. */
abstract class VectorBinaryKernel extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects two array<float|double>, got " +
        s"${left.dataType.simpleString}, ${right.dataType.simpleString}")
  }
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  protected def leftIsFloat: Boolean =
    left.dataType.asInstanceOf[ArrayType].elementType == FloatType
  protected def rightIsFloat: Boolean =
    right.dataType.asInstanceOf[ArrayType].elementType == FloatType
}

case class DotProductKernel(left: Expression, right: Expression)
    extends VectorBinaryKernel {
  override def prettyName: String = "dot_product"

  override def nullSafeEval(a: Any, b: Any): Any =
    VectorKernels.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      leftIsFloat, rightIsFloat)

  override protected def doGenCode(cg: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(cg, ev, (a, b) => {
      val cls = VectorKernels.getClass.getName.stripSuffix("$")
      val r = cg.freshName("dotRes")
      s"""
         |java.lang.Double $r = $cls.dot($a, $b, $leftIsFloat, $rightIsFloat);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r; }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

case class CosineSimKernel(left: Expression, right: Expression)
    extends VectorBinaryKernel {
  override def prettyName: String = "cosine_sim"

  override def nullSafeEval(a: Any, b: Any): Any =
    VectorKernels.cosine(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      leftIsFloat, rightIsFloat)

  override protected def doGenCode(cg: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(cg, ev, (a, b) => {
      val cls = VectorKernels.getClass.getName.stripSuffix("$")
      val r = cg.freshName("cosRes")
      s"""
         |java.lang.Double $r = $cls.cosine($a, $b, $leftIsFloat, $rightIsFloat);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r; }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object VectorKernels {

  @inline private def elem(v: ArrayData, i: Int, isFloat: Boolean): Double =
    if (isFloat) v.getFloat(i).toDouble else v.getDouble(i)

  /** Σ a_i·b_i, left-to-right from 0.0; null on length mismatch
    * (boxed so generated code can branch on it). */
  def dot(a: ArrayData, b: ArrayData, af: Boolean, bf: Boolean): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) { acc += elem(a, i, af) * elem(b, i, bf); i += 1 }
    acc
  }

  /** dot/sqrt(aa·bb) with all three dots in one fused pass — the
    * accumulators are independent, so values match the three-pass
    * composed form bit-for-bit. */
  def cosine(a: ArrayData, b: ArrayData, af: Boolean, bf: Boolean): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var ab = 0.0; var aa = 0.0; var bb = 0.0
    var i = 0
    while (i < n) {
      val x = elem(a, i, af); val y = elem(b, i, bf)
      ab += x * y; aa += x * x; bb += y * y
      i += 1
    }
    ab / math.sqrt(aa * bb)
  }

  /** Column-API entry points. */
  def dotProduct(a: Column, b: Column): Column =
    bridge.column(DotProductKernel(bridge.expression(a), bridge.expression(b)))

  def cosineSim(a: Column, b: Column): Column =
    bridge.column(CosineSimKernel(bridge.expression(a), bridge.expression(b)))
}
