package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native SimHash kernel: array<long> token hashes → one long sketch
  * of `width` bits (1..64).
  *
  * Replaces the composed form ([[graft.functions.TextFunctions
  * .simhash32FromHashes]]): `width` unrolled `aggregate` folds — each
  * an interpreted pass over the hash array with per-element lambda
  * dispatch, i.e. width·n fold steps per document — with ONE pass that
  * maintains all `width` bit counters at once. Bit-identical by
  * construction (SimhashKernelSpec asserts it on randomized inputs):
  * `(h >> i) % 2 = 1` on a non-negative 60-bit hash is exactly bit
  * test `(h >> i) & 1`, the per-bit score is the same +1/−1 sum, and
  * the packing `score > 0 ? 1<<i : 0` is unchanged. Empty arrays fold
  * to score 0 per bit → simhash 0, like the composed form.
  *
  * Width notes: 32 is the reference's sketch width (kept for the
  * d3/d7 oracles' bit parity). The portable md5-prefix token hash
  * carries exactly 60 cross-engine bits, so 60 is the widest sketch
  * whose every counter sees a live hash bit AND whose DuckDB oracle
  * replica stays in signed-BIGINT arithmetic — that is the
  * scale-deployment setting (d7b gate). Widths 61..64 are legal for
  * callers supplying a genuine 64-bit token hash (e.g. xxhash64 when
  * running without an oracle); on the 60-bit hash their top counters
  * would only ever see zeros.
  */
case class SimhashWide(child: Expression, width: Int)
    extends UnaryExpression {
  require(width >= 1 && width <= 64, "simhash width must be in [1, 64]")

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"simhash expects array<bigint>, got ${other.simpleString}")
    }

  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = s"simhash$width"

  override def nullSafeEval(hs: Any): Any =
    SimhashKernel.run(hs.asInstanceOf[ArrayData], width)

  override protected def doGenCode(cg: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(cg, ev, hs => {
      val cls = SimhashKernel.getClass.getName.stripSuffix("$")
      s"${ev.value} = $cls.run($hs, $width);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimhashKernel {

  /** One pass over the hashes, `width` counters; static for codegen. */
  def run(hs: ArrayData, width: Int): Long = {
    val n = hs.numElements()
    val score = new Array[Int](width)
    var i = 0
    while (i < n) {
      val h = hs.getLong(i)
      var b = 0
      while (b < width) {
        if (((h >>> b) & 1L) == 1L) score(b) += 1 else score(b) -= 1
        b += 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < width) {
      if (score(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  /** Column-API entry points. */
  def simhash32(hs: Column): Column = simhashWide(hs, 32)

  def simhashWide(hs: Column, width: Int): Column =
    bridge.column(SimhashWide(bridge.expression(hs), width))
}
