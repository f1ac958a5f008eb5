package graft.plans

import java.nio.charset.StandardCharsets
import java.security.MessageDigest
import java.util.regex.Pattern

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native text→hashed-item-set kernels: one codegen'd pass from the
  * raw text column straight to the `array<long>` of portable 60-bit
  * item hashes the LSH dedup pipeline consumes.
  *
  * Why these exist (round-4 root cause): the composed form —
  * `transform(wordShingles(tokens(text)), portableHash64)` — is a
  * tower of higher-order functions, and HOFs have no doGenCode: every
  * element evaluates through interpreted `Expression.eval` with
  * per-element lambda dispatch, `Conv` doing per-character base
  * conversion of md5 hex strings, and `ArrayDistinct` probing
  * `UTF8String` hash sets. Stack-sampled at sf0.1 those two
  * interpreted passes were the entire d4 hot path — and, worse,
  * interpreted eval degrades further in long-lived sessions as the
  * `Expression.eval` call sites go megamorphic (measured 6s → 100s+
  * for the identical query later in one session). A static-call
  * kernel inside whole-stage codegen is immune to both.
  *
  * Value-identical to the composed forms (randomized parity specs in
  * HashKernelsSpec) up to element ORDER — the output arrays are
  * sorted ascending so the Jaccard verify can run as an
  * allocation-free merge ([[SortedHashedJaccard]]); every consumer
  * (minhash slot minima, set Jaccard, simhash bit sums) is
  * order-insensitive, and the DuckDB oracle needs no change:
  *  - tokens:   trim spaces, split on `\s+` (Java regex, limit -1) —
  *    exactly `split(trim(text), "\\s+")`;
  *  - shingles: n consecutive tokens joined with a single space —
  *    exactly `array_join(slice(toks, i, n), " ")`;
  *  - n-grams:  code-point n-grams, distinct on the gram BYTES (not
  *    the hash — hash-collision distinctness must match
  *    `array_distinct` on strings);
  *  - hash:     top 60 bits of md5 = `conv(substr(md5(s),1,15),16,10)`.
  */
case class HashedWordShingles(child: Expression, n: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"hashed_word_shingles expects string, got ${other.simpleString}")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "hashed_word_shingles"

  override def nullSafeEval(text: Any): Any =
    HashKernels.wordShingleHashes(text.asInstanceOf[UTF8String], n)

  override protected def doGenCode(cg: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(cg, ev, t => {
      val cls = HashKernels.getClass.getName.stripSuffix("$")
      s"${ev.value} = $cls.wordShingleHashes($t, $n);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class HashedCharNgrams(child: Expression, n: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"hashed_char_ngrams expects string, got ${other.simpleString}")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "hashed_char_ngrams"

  override def nullSafeEval(text: Any): Any =
    HashKernels.charNgramHashes(text.asInstanceOf[UTF8String], n)

  override protected def doGenCode(cg: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(cg, ev, t => {
      val cls = HashKernels.getClass.getName.stripSuffix("$")
      s"${ev.value} = $cls.charNgramHashes($t, $n);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object HashKernels {

  private val Ws = Pattern.compile("\\s+")
  private val digestTL = ThreadLocal.withInitial[MessageDigest](() =>
    MessageDigest.getInstance("MD5"))

  /** portableHash64: top 60 bits (15 hex chars) of md5 — identical to
    * conv(substr(md5(s),1,15),16,10). */
  private def hash60(md: MessageDigest, bytes: Array[Byte]): Long = {
    md.reset()
    val d = md.digest(bytes)
    var h = 0L
    var i = 0
    while (i < 7) { h = (h << 8) | (d(i) & 0xffL); i += 1 }
    (h << 4) | ((d(7) & 0xf0L) >>> 4)
  }

  /** Hashes of the n-token shingles (n = 1 ⇒ hashed tokens): trim
    * spaces, split `\s+` with Java regex limit -1 (exactly Spark's
    * `split(trim(text), "\\s+")`), join n consecutive tokens with one
    * space, hash each. Empty array when fewer than n tokens (the
    * composed `when(size < n, [])` guard). Static so generated code
    * calls it directly. */
  def wordShingleHashes(text: UTF8String, n: Int): ArrayData = {
    val t = text.trim().toString
    if (t.isEmpty) return new GenericArrayData(Array.empty[Long])
    val toks = Ws.split(t, -1)
    if (toks.length < n) return new GenericArrayData(Array.empty[Long])
    val md = digestTL.get()
    val out = new Array[Long](toks.length - n + 1)
    val sb = new java.lang.StringBuilder(64)
    var i = 0
    while (i < out.length) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      out(i) = hash60(md, sb.toString.getBytes(StandardCharsets.UTF_8))
      i += 1
    }
    java.util.Arrays.sort(out)
    new GenericArrayData(out)
  }

  /** Hashes of the DISTINCT code-point n-grams, first-occurrence
    * order, distinct decided on the gram bytes (so a 60-bit hash
    * collision between different grams still yields two entries,
    * matching `array_distinct` over the strings). Empty array when
    * the text is shorter than n code points. */
  def charNgramHashes(text: UTF8String, n: Int): ArrayData = {
    val numChars = text.numChars()
    if (numChars < n) return new GenericArrayData(Array.empty[Long])
    val bytes = text.getBytes
    // byte offset of each code point (one linear pass)
    val offs = new Array[Int](numChars + 1)
    var c = 0
    var b = 0
    while (c < numChars) {
      offs(c) = b
      b += UTF8String.numBytesForFirstByte(bytes(b))
      c += 1
    }
    offs(numChars) = bytes.length
    val seen = new java.util.LinkedHashSet[java.nio.ByteBuffer](
      Math.max(16, numChars * 2))
    var i = 0
    while (i <= numChars - n) {
      seen.add(java.nio.ByteBuffer.wrap(bytes, offs(i), offs(i + n) - offs(i)))
      i += 1
    }
    val md = digestTL.get()
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) {
      val bb = it.next()
      val gram = java.util.Arrays.copyOfRange(
        bytes, bb.position(), bb.position() + bb.remaining())
      out(k) = hash60(md, gram)
      k += 1
    }
    java.util.Arrays.sort(out)
    new GenericArrayData(out)
  }

  /** Column-API entry points. */
  def hashedWordShingles(text: Column, n: Int): Column =
    bridge.column(HashedWordShingles(bridge.expression(text), n))

  def hashedCharNgrams(text: Column, n: Int): Column =
    bridge.column(HashedCharNgrams(bridge.expression(text), n))
}
