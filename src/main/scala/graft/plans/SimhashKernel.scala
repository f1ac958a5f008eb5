package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native 32-bit SimHash kernel: array<long> token hashes → one long.
  *
  * Replaces the composed form ([[graft.functions.TextFunctions
  * .simhash32FromHashes]]): 32 unrolled `aggregate` folds — each an
  * interpreted pass over the hash array with per-element lambda
  * dispatch, i.e. 32·n fold steps per document — with ONE pass that
  * maintains all 32 bit counters at once. Bit-identical by
  * construction (SimhashKernelSpec asserts it on randomized inputs):
  * `(h >> i) % 2 = 1` on a non-negative 60-bit hash is exactly bit
  * test `(h >> i) & 1`, the per-bit score is the same +1/−1 sum, and
  * the packing `score > 0 ? 1<<i : 0` is unchanged. Empty arrays fold
  * to score 0 per bit → simhash 0, like the composed form.
  */
case class Simhash32(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"simhash32 expects array<bigint>, got ${other.simpleString}")
    }

  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "simhash32"

  override def nullSafeEval(hs: Any): Any =
    SimhashKernel.run(hs.asInstanceOf[ArrayData])

  override protected def doGenCode(cg: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(cg, ev, hs => {
      val cls = SimhashKernel.getClass.getName.stripSuffix("$")
      s"${ev.value} = $cls.run($hs);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimhashKernel {

  /** One pass over the hashes, 32 counters; static for codegen. */
  def run(hs: ArrayData): Long = {
    val n = hs.numElements()
    val score = new Array[Int](32)
    var i = 0
    while (i < n) {
      val h = hs.getLong(i)
      var b = 0
      while (b < 32) {
        if (((h >> b) & 1L) == 1L) score(b) += 1 else score(b) -= 1
        b += 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 32) {
      if (score(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  /** Column-API entry point. */
  def simhash32(hs: Column): Column =
    bridge.column(Simhash32(bridge.expression(hs)))
}
