package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
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

/** Top-`probes` anchor cells of one vector by (cosine DESC, cid ASC)
  * — the IVF assignment ranking in ONE codegen'd pass. Replaces the
  * composed `slice(array_sort(transform(anchors, struct(-cos, cid))),
  * 1, probes)`: higher-order transform + per-row struct-array
  * allocation + comparator lambdas all evaluate interpreted, and the
  * path measured degrading ~10× in long-lived sessions (megamorphic
  * `Expression.eval` — the round-4 post-mortem's mechanism). Ranking
  * semantics are identical: cosine from the same fused
  * [[VectorKernels.cosine]] (bit-equal doubles), ties on cid
  * ascending, NaN ordered greatest like SQL doubles, a
  * length-mismatched anchor (null cosine in the composed form)
  * ordered last. */
case class IvfTopCells(left: Expression, right: Expression, probes: Int)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def vecOk(t: DataType) = t match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    val anchorsOk = right.dataType match {
      case ArrayType(StructType(Array(f1, f2)), _) =>
        f1.dataType == LongType && vecOk(f2.dataType)
      case _ => false
    }
    if (vecOk(left.dataType) && anchorsOk) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"ivf_top_cells expects (array<float|double>, array<struct<bigint, array<float|double>>>), " +
        s"got ${left.dataType.simpleString}, ${right.dataType.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "ivf_top_cells"

  private def vecIsFloat: Boolean =
    left.dataType.asInstanceOf[ArrayType].elementType == FloatType
  private def anchorIsFloat: Boolean =
    right.dataType.asInstanceOf[ArrayType].elementType
      .asInstanceOf[StructType].fields(1).dataType
      .asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(vec: Any, anchors: Any): Any =
    VectorKernels.topCells(vec.asInstanceOf[ArrayData],
      anchors.asInstanceOf[ArrayData], probes, vecIsFloat, anchorIsFloat)

  override protected def doGenCode(cg: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(cg, ev, (v, a) => {
      val cls = VectorKernels.getClass.getName.stripSuffix("$")
      s"${ev.value} = $cls.topCells($v, $a, $probes, $vecIsFloat, $anchorIsFloat);"
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
  /** [[IvfTopCells]]'s kernel: rank all anchors by (−cosine, cid)
    * ascending — i.e. cosine DESC, ties cid ASC — and return the
    * first `probes` cids. NaN/null cosines (zero vector / length
    * mismatch) order last, matching SQL double ordering and the
    * composed form's null propagation. */
  def topCells(vec: ArrayData, anchors: ArrayData, probes: Int,
      vf: Boolean, af: Boolean): ArrayData = {
    val n = anchors.numElements()
    val negs = new Array[Double](n)
    val cids = new Array[Long](n)
    val idx = new Array[Integer](n)
    var i = 0
    while (i < n) {
      val row = anchors.getStruct(i, 2)
      cids(i) = row.getLong(0)
      val c = cosine(vec, row.getArray(1), vf, af)
      // null cosine (length mismatch) → order last, like the composed
      // form's null struct field; NaN already orders greatest via
      // Double.compare, same as SQL
      negs(i) = if (c == null) Double.NaN else 0.0 - c
      idx(i) = i
      i += 1
    }
    java.util.Arrays.sort(idx, (a: Integer, b: Integer) => {
      val cmp = java.lang.Double.compare(negs(a), negs(b))
      if (cmp != 0) cmp else java.lang.Long.compare(cids(a), cids(b))
    })
    val k = math.min(probes, n)
    val out = new Array[Long](k)
    i = 0
    while (i < k) { out(i) = cids(idx(i)); i += 1 }
    new GenericArrayData(out)
  }

  def dotProduct(a: Column, b: Column): Column =
    bridge.column(DotProductKernel(bridge.expression(a), bridge.expression(b)))

  def ivfTopCells(vec: Column, anchors: Column, probes: Int): Column =
    bridge.column(IvfTopCells(bridge.expression(vec),
      bridge.expression(anchors), probes))

  def cosineSim(a: Column, b: Column): Column =
    bridge.column(CosineSimKernel(bridge.expression(a), bridge.expression(b)))
}
