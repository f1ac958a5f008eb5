package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native one-pass repetition-statistics kernel for Gopher-style
  * quality filtering (duplicate-token fraction, most-frequent-bigram
  * fraction — the standard "is this document degenerate repetition?"
  * signals in training-data curation).
  *
  * A composed form needs `array_distinct` plus, for the top-bigram
  * count, a `transform(distinct, d -> size(filter(bigrams, = d)))`
  * tower — O(d·n) interpreted lambda dispatches per document, the
  * exact pattern round 4 measured degrading megamorphically in
  * long-lived sessions (PLANS.md round-4 appendix, root cause 3).
  * This kernel is ONE pass per document inside whole-stage codegen:
  * a token hash-set for the distinct count and a bigram hash-map for
  * the max multiplicity. Exact string keys (no hashing shortcut), so
  * counts are collision-free and the DuckDB oracle replicates them
  * with plain list/group-by arithmetic.
  *
  * Returns struct(n_tokens, n_distinct, n_bigrams, top_bigram_n), all
  * exact ints; callers derive ratios with single int/int divisions
  * (the house determinism rule). Empty / single-token docs yield
  * n_bigrams = 0, top_bigram_n = 0.
  */
case class RepetitionStats(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"repetition_stats expects array<string>, got ${other.simpleString}")
    }

  override def dataType: DataType = StructType(Seq(
    StructField("n_tokens", IntegerType, nullable = false),
    StructField("n_distinct", IntegerType, nullable = false),
    StructField("n_bigrams", IntegerType, nullable = false),
    StructField("top_bigram_n", IntegerType, nullable = false)))
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "repetition_stats"

  override def nullSafeEval(toks: Any): Any =
    RepetitionKernel.run(toks.asInstanceOf[ArrayData])

  override protected def doGenCode(cg: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(cg, ev, toks => {
      val cls = RepetitionKernel.getClass.getName.stripSuffix("$")
      s"${ev.value} = $cls.run($toks);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object RepetitionKernel {

  /** One pass: distinct tokens via a hash set, adjacent-bigram
    * multiplicities via a hash map keyed on the exact token pair.
    * Static for codegen. */
  def run(toks: ArrayData): GenericInternalRow = {
    val n = toks.numElements()
    val seen = new java.util.HashSet[UTF8String](Math.max(16, n * 2))
    val bigrams =
      new java.util.HashMap[UTF8String, java.lang.Integer](Math.max(16, n * 2))
    // \u0001 never appears in whitespace-split tokens, so the joined
    // key is unambiguous ("a"+"bc" never collides with "ab"+"c"); the
    // oracle uses the same chr(1) join.
    val sep = UTF8String.fromString("\u0001")
    var top = 0
    var prev: UTF8String = null
    var i = 0
    while (i < n) {
      val t = toks.getUTF8String(i)
      seen.add(t)
      if (prev != null) {
        val key = UTF8String.concat(prev, sep, t)
        val c: Int = bigrams.getOrDefault(key, 0) + 1
        bigrams.put(key, c)
        if (c > top) top = c
      }
      prev = t
      i += 1
    }
    new GenericInternalRow(Array[Any](
      n, seen.size(), if (n > 1) n - 1 else 0, top))
  }

  /** Column-API entry point. */
  def repetitionStats(toks: Column): Column =
    bridge.column(RepetitionStats(bridge.expression(toks)))
}
