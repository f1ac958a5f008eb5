package graft.plans

import java.text.Normalizer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Unicode NFC normalization — the canonical-composition pass
  * every text-corpus build runs before hashing/shingling (a decomposed
  * "é" (e + U+0301) and the composed one are DIFFERENT shingle and
  * MinHash inputs but the same text to a reader; un-normalized crawl
  * text silently halves near-dup recall on such pairs).
  *
  * Spark ships no normalization builtin, so the idiomatic fallback is
  * a Scala UDF — which breaks whole-stage codegen and serializes
  * UTF8String→String→UTF8String per row on the interpreted path. This
  * expression keeps the operator inside codegen (one static call, no
  * closure dispatch) with an already-normalized fast path: NFC-clean
  * input (the overwhelming majority of real text — all-ASCII is
  * trivially NFC) returns the ORIGINAL UTF8String with zero
  * allocation beyond the verification scan.
  *
  * DuckDB's `nfc_normalize` implements the same Unicode canonical
  * composition, which is what makes the ts19 oracle exact: NFC is
  * Unicode-standardized, not engine-defined. */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"nfc_normalize expects string, got ${other.simpleString}")
    }

  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "nfc_normalize"

  override def nullSafeEval(s: Any): Any =
    TextNormalizeKernel.nfc(s.asInstanceOf[UTF8String])

  override protected def doGenCode(cg: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(cg, ev, s => {
      val cls = TextNormalizeKernel.getClass.getName.stripSuffix("$")
      s"${ev.value} = $cls.nfc($s);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TextNormalizeKernel {

  /** Static for codegen. Fast path: already-NFC input (all ASCII is)
    * returns the input UTF8String untouched. */
  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    if (Normalizer.isNormalized(str, Normalizer.Form.NFC)) s
    else UTF8String.fromString(Normalizer.normalize(str, Normalizer.Form.NFC))
  }

  /** Column form. */
  def nfcNormalize(text: Column): Column =
    bridge.column(NfcNormalize(bridge.expression(text)))
}
