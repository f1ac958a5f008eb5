package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types._

/** int8 vector storage kernels: the quantized `array<int>` a
  * [[graft.ops.VectorCompression]] pass produces is semantically one
  * byte per component, but Spark's array<int> row layout spends 4
  * bytes each — these kernels move the corpus into a `binary` column
  * (1 byte per component, the real 4× compression) and back.
  *
  * This is the representation the quantized ANN path shuffles: at
  * 100 TB the corpus-side candidate re-attach join is the largest
  * exchange in a vector query, and with (q8 binary, scale double) it
  * carries dim + 8 bytes per vector instead of dim·8 for the raw
  * double array — the whole point of quantizing before indexing.
  * Dequantization reproduces EXACTLY the pinned ss4 arithmetic
  * (q_i·scale in double), so results over the packed corpus are
  * bit-identical to results over `VectorCompression.dequantize` of
  * the unpacked ints (Q8KernelsSpec asserts the roundtrip).
  */
case class PackInt8(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(IntegerType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"pack_int8 expects array<int>, got ${other.simpleString}")
    }

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "pack_int8"

  override def nullSafeEval(q: Any): Any =
    Q8Kernels.pack(q.asInstanceOf[ArrayData])

  override protected def doGenCode(cg: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(cg, ev, q => {
      val cls = Q8Kernels.getClass.getName.stripSuffix("$")
      s"${ev.value} = $cls.pack($q);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class DequantizeQ8(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, DoubleType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"dequantize_q8 expects (binary, double), got " +
          s"${l.simpleString}, ${r.simpleString}")
    }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "dequantize_q8"

  override def nullSafeEval(q8: Any, scale: Any): Any =
    Q8Kernels.dequantize(q8.asInstanceOf[Array[Byte]],
      scale.asInstanceOf[Double])

  override protected def doGenCode(cg: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(cg, ev, (q, s) => {
      val cls = Q8Kernels.getClass.getName.stripSuffix("$")
      s"${ev.value} = $cls.dequantize($q, $s);"
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object Q8Kernels {

  /** array<int> (each in [-128, 127] — guaranteed by the ss4 scale
    * construction, |q_i| ≤ 127) → one byte per element. A value
    * outside byte range means the input was NOT an int8 quantization;
    * fail loudly rather than wrap. */
  def pack(q: ArrayData): Array[Byte] = {
    val n = q.numElements()
    val out = new Array[Byte](n)
    var i = 0
    while (i < n) {
      val v = q.getInt(i)
      if (v < Byte.MinValue || v > Byte.MaxValue)
        throw new IllegalArgumentException(
          s"pack_int8: element $v at $i outside int8 range")
      out(i) = v.toByte
      i += 1
    }
    out
  }

  /** bytes → q_i·scale doubles: exactly [[graft.ops.VectorCompression
    * .dequantize]] of the unpacked ints (signed byte widens to the
    * same int value, ·scale in double is the same IEEE product). */
  def dequantize(q8: Array[Byte], scale: Double): ArrayData = {
    val out = new Array[Double](q8.length)
    var i = 0
    while (i < q8.length) { out(i) = q8(i).toDouble * scale; i += 1 }
    new GenericArrayData(out)
  }

  /** Column-API entry points. */
  def packInt8(q: Column): Column =
    bridge.column(PackInt8(bridge.expression(q)))

  def dequantizeQ8(q8: Column, scale: Column): Column =
    bridge.column(DequantizeQ8(bridge.expression(q8), bridge.expression(scale)))
}
