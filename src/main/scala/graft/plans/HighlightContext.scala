package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** F6 (reference display.py:604-620) as a native Catalyst expression:
  * case-insensitively find `query` in `text`, slice ±`ctx` characters
  * around the first hit, wrap the hit in `**`; null when absent.
  *
  * This is the one §7.3 candidate where a custom Expression pays off:
  * transcript-search highlighting runs per row over multi-KB text, and
  * the composed-builtin form ([[graft.functions.YtFunctions
  * .searchContext]]) lowercases the text TWICE and walks it four
  * times (locate + three substrings). This expression does one
  * lowercase + one scan + direct slice assembly, and participates in
  * whole-stage codegen via a static-call `doGenCode` (the common
  * Spark pattern for string kernels — the call stays inside the
  * generated loop, rows never materialize).
  *
  * Semantics are byte-compatible with the composed form: the same
  * UTF8String primitives back `lower`/`locate`/`substring`
  * (StringLocate / Substring use `indexOf` / `substringSQL`), so the
  * DuckDB oracle for f6 verifies this expression too.
  */
case class HighlightContext(text: Expression, query: Expression, ctx: Expression)
    extends TernaryExpression {

  override def first: Expression = text
  override def second: Expression = query
  override def third: Expression = ctx

  // (ImplicitCastInputTypes is private[sql]; explicit check instead)
  override def checkInputDataTypes(): TypeCheckResult =
    if (text.dataType == StringType && query.dataType == StringType &&
      ctx.dataType == IntegerType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects (string, string, int), got " +
        Seq(text, query, ctx).map(_.dataType.simpleString).mkString(", "))

  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "highlight_context"

  override def nullSafeEval(t: Any, q: Any, c: Any): Any =
    HighlightContext.run(t.asInstanceOf[UTF8String],
      q.asInstanceOf[UTF8String], c.asInstanceOf[Int])

  override protected def doGenCode(cg: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(cg, ev, (t, q, c) => {
      val cls = HighlightContext.getClass.getName.stripSuffix("$")
      s"""
         |${ev.value} = $cls.run($t, $q, $c);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): Expression =
    copy(text = newFirst, query = newSecond, ctx = newThird)
}

object HighlightContext {

  private val Stars = UTF8String.fromString("**")

  /** The kernel; static so generated code calls it directly. Null =
    * no match (SQL null). Uses the same UTF8String primitives as the
    * built-in lower/locate/substring chain, so results are identical.
    */
  def run(text: UTF8String, query: UTF8String, ctx: Int): UTF8String = {
    val q = query.toLowerCase
    // StringLocate semantics: 1-based char position, 0 = miss
    val pos = text.toLowerCase.indexOf(q, 0) + 1
    if (pos == 0) return null
    val qLen = q.numChars()
    val start = math.max(1, pos - ctx)
    val before = text.substringSQL(start, pos - start)
    val hit = text.substringSQL(pos, qLen)
    val after = text.substringSQL(pos + qLen, ctx)
    UTF8String.concat(before, Stars, hit, Stars, after)
  }

  /** Column-API entry point. */
  def highlightContext(text: Column, query: String, ctx: Int = 100): Column =
    bridge.column(HighlightContext(
      bridge.expression(text),
      bridge.expression(org.apache.spark.sql.functions.lit(query)),
      bridge.expression(org.apache.spark.sql.functions.lit(ctx))))

  /** Arity-checked SQL builder (wrong arity would otherwise surface
    * as a bare IndexOutOfBoundsException). */
  def fromExpressions(exprs: Seq[Expression]): HighlightContext = {
    require(exprs.length == 3,
      s"highlight_context requires (text, query, ctx); got ${exprs.length} argument(s)")
    HighlightContext(exprs(0), exprs(1), exprs(2))
  }

  /** Register as a SQL function (`highlight_context(text, q, ctx)`). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "highlight_context", fromExpressions, "scala_udf")
}
