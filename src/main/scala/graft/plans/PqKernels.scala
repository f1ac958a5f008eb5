package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types._

/** Native product-quantization kernels: per-subspace argmin ENCODE and
  * the per-query ADC distance TABLE. The unrolled-literal expression
  * forms of these (one (x−c)² term per codebook component) generate
  * >64 KB of Java per Project at m=8·ks=16·dim=64, janino refuses the
  * method, and the whole stage bails to interpreted eval — the exact
  * failure mode the LSH family hit in round 4
  * ([[LshKernels]]). These run one fused loop per row with the
  * flattened codebook attached as a codegen reference object.
  *
  * BIT-IDENTICAL to the unrolled forms and the SQL oracle: each
  * sub-distance accumulates (x−c)² LEFT TO RIGHT from 0.0 in
  * component order (`list_reduce(list_prepend(0.0, …))`'s twin); the
  * argmin keeps strict `<`, so ties stay with the LOWER centroid id
  * (`ORDER BY dist, c` / first-index-of-min). Parity is spec-pinned
  * against the unrolled expression form (PipelineSpec).
  *
  * Codebooks ride the expression as a VALUE-equal `IndexedSeq`
  * (case-class equality must compare contents, not array identity,
  * or Catalyst canonicalization would treat equal encodes as
  * distinct); the hot path reads a `@transient lazy` flat array.
  * A vector of the wrong length or with a null element yields null. */
object PqKernels {

  private def checkVec(vec: ArrayData, dim: Int): Boolean = {
    if (vec.numElements() != dim) return false
    var i = 0
    while (i < dim) {
      if (vec.isNullAt(i)) return false
      i += 1
    }
    true
  }

  /** codes(j) = argmin over c of Σ_d (vec[j·subDim+d] − cb[(j·ks+c)·subDim+d])². */
  def encode(vec: ArrayData, cb: Array[Double], m: Int, ks: Int,
      subDim: Int, isFloat: Boolean): ArrayData = {
    val dim = m * subDim
    if (!checkVec(vec, dim)) return null
    val out = new Array[Int](m)
    var j = 0
    while (j < m) {
      var best = 0
      var bd = Double.PositiveInfinity
      var c = 0
      while (c < ks) {
        val base = (j * ks + c) * subDim
        var acc = 0.0
        var d = 0
        while (d < subDim) {
          val e = j * subDim + d
          val x = (if (isFloat) vec.getFloat(e).toDouble
                   else vec.getDouble(e)) - cb(base + d)
          acc += x * x
          d += 1
        }
        if (acc < bd) { bd = acc; best = c }
        c += 1
      }
      out(j) = best
      j += 1
    }
    new GenericArrayData(out)
  }

  /** tbl(j·ks + c) = Σ_d (vec[j·subDim+d] − cb[(j·ks+c)·subDim+d])². */
  def adcTable(vec: ArrayData, cb: Array[Double], m: Int, ks: Int,
      subDim: Int, isFloat: Boolean): ArrayData = {
    val dim = m * subDim
    if (!checkVec(vec, dim)) return null
    val out = new Array[Double](m * ks)
    var j = 0
    while (j < m) {
      var c = 0
      while (c < ks) {
        val base = (j * ks + c) * subDim
        var acc = 0.0
        var d = 0
        while (d < subDim) {
          val e = j * subDim + d
          val x = (if (isFloat) vec.getFloat(e).toDouble
                   else vec.getDouble(e)) - cb(base + d)
          acc += x * x
          d += 1
        }
        out(j * ks + c) = acc
        c += 1
      }
      j += 1
    }
    new GenericArrayData(out)
  }

  abstract class PqVecKernel extends UnaryExpression {
    def cb: IndexedSeq[Double]
    def m: Int
    def ks: Int
    def subDim: Int

    @transient protected lazy val flat: Array[Double] = cb.toArray

    override def checkInputDataTypes(): TypeCheckResult =
      child.dataType match {
        case ArrayType(FloatType | DoubleType, _) =>
          if (cb.length == m * ks * subDim) TypeCheckResult.TypeCheckSuccess
          else TypeCheckResult.TypeCheckFailure(
            s"codebook has ${cb.length} components, need ${m * ks * subDim}")
        case other => TypeCheckResult.TypeCheckFailure(
          s"$prettyName expects array<float|double>, got ${other.simpleString}")
      }

    override def nullable: Boolean = true

    protected def isFloat: Boolean =
      child.dataType.asInstanceOf[ArrayType].elementType == FloatType

    protected def kernelName: String

    override protected def doGenCode(cg: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(cg, ev, v => {
        val cbRef = cg.addReferenceObj("pqcb", flat, "double[]")
        val cls = PqKernels.getClass.getName.stripSuffix("$")
        val r = cg.freshName("pqRes")
        s"""
           |org.apache.spark.sql.catalyst.util.ArrayData $r =
           |  $cls.$kernelName($v, $cbRef, $m, $ks, $subDim, $isFloat);
           |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r; }
         """.stripMargin
      })
  }

  case class PqEncode(child: Expression, cb: IndexedSeq[Double],
      m: Int, ks: Int, subDim: Int) extends PqVecKernel {
    override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
    override def prettyName: String = "pq_encode"
    override protected def kernelName: String = "encode"
    override def nullSafeEval(vec: Any): Any =
      PqKernels.encode(vec.asInstanceOf[ArrayData], flat, m, ks, subDim, isFloat)
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  case class PqAdcTable(child: Expression, cb: IndexedSeq[Double],
      m: Int, ks: Int, subDim: Int) extends PqVecKernel {
    override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
    override def prettyName: String = "pq_adc_table"
    override protected def kernelName: String = "adcTable"
    override def nullSafeEval(vec: Any): Any =
      PqKernels.adcTable(vec.asInstanceOf[ArrayData], flat, m, ks, subDim, isFloat)
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** Column-API entry points; `cb` is the (j)(c)(d) codebook from
    * [[graft.ops.SimilaritySearch.pqCodebook]]. */
  def pqEncode(vec: Column, cb: Array[Array[Array[Double]]]): Column = {
    val (m, ks, subDim) = (cb.length, cb(0).length, cb(0)(0).length)
    bridge.column(PqEncode(bridge.expression(vec),
      cb.flatten.flatten.toIndexedSeq, m, ks, subDim))
  }

  def pqAdcTable(vec: Column, cb: Array[Array[Array[Double]]]): Column = {
    val (m, ks, subDim) = (cb.length, cb(0).length, cb(0)(0).length)
    bridge.column(PqAdcTable(bridge.expression(vec),
      cb.flatten.flatten.toIndexedSeq, m, ks, subDim))
  }
}
