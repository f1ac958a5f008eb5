package graft.plans

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.TextFunctions

/** Native MinHash signature kernel: array<string> items → array<long>
  * of k affine slots over the portable md5-prefix hash.
  *
  * Replaces the composed form (`transform(items, md5…)` then k ×
  * `array_min(transform(base, affine))`): higher-order functions
  * evaluate interpreted with per-element lambda dispatch and k
  * intermediate arrays per row, and the shared base array needs an
  * exchange barrier to evaluate once. This kernel runs one tight
  * loop per row — one digest per item, k running minima, zero
  * intermediate allocation — inside whole-stage codegen via a
  * static-call doGenCode. Measured ~3× on the LSH dedup queries.
  *
  * Bit-identical to the composed form and the DuckDB oracle: same
  * md5-prefix base hash (`('0x'||substr(md5(g),1,15))::BIGINT % p`),
  * same (a·h + b) mod p slots from [[TextFunctions.minhashCoeffs]].
  */
case class MinhashSlots(child: Expression, numHashes: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"minhash_slots expects array<string>, got ${other.simpleString}")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "minhash_slots"

  override def nullSafeEval(items: Any): Any =
    MinhashSlots.run(items.asInstanceOf[ArrayData], numHashes)

  override protected def doGenCode(cg: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(cg, ev, items => {
      val cls = MinhashSlots.getClass.getName.stripSuffix("$")
      s"""
         |${ev.value} = $cls.run($items, $numHashes);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** MinHash signature from PRE-COMPUTED raw portable hashes
  * (array<long> of portableHash64 values, un-modded): the affine
  * slots over `h % p` — arithmetically identical to [[MinhashSlots]]
  * on the original items, but with zero digest work. This is what lets the
  * LSH pipeline pay its md5 pass exactly once: the hashed item sets
  * are materialized for the verify stage anyway, and the signature
  * derives from them instead of re-digesting the strings. */
case class MinhashSlotsFromHashes(child: Expression, numHashes: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"minhash_slots_from_hashes expects array<bigint>, got ${other.simpleString}")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "minhash_slots_from_hashes"

  override def nullSafeEval(hs: Any): Any =
    MinhashSlots.runFromHashes(hs.asInstanceOf[ArrayData], numHashes)

  override protected def doGenCode(cg: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(cg, ev, hs => {
      val cls = MinhashSlots.getClass.getName.stripSuffix("$")
      s"""
         |${ev.value} = $cls.runFromHashes($hs, $numHashes);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinhashSlots {

  private val P = TextFunctions.MinhashP
  // coefficient cache per k (k is a plan constant; tiny map)
  private val coeffCache =
    new java.util.concurrent.ConcurrentHashMap[Int, (Array[Long], Array[Long])]()
  private def coeffs(k: Int): (Array[Long], Array[Long]) =
    coeffCache.computeIfAbsent(k, k2 => {
      val c = TextFunctions.minhashCoeffs(k2)
      (c.map(_._1).toArray, c.map(_._2).toArray)
    })
  private val digestTL = ThreadLocal.withInitial[MessageDigest](() =>
    MessageDigest.getInstance("MD5"))

  /** base hash: first 15 hex chars of md5 = top 60 bits of the first
    * 8 digest bytes, then mod p — identical to
    * conv(substr(md5(s),1,15),16,10) % p. */
  private def baseHash(md: MessageDigest, s: UTF8String): Long = {
    md.reset()
    val d = md.digest(s.getBytes)
    // 15 hex chars = 60 bits = bytes 0..6 (56 bits) + high nibble of byte 7
    var h = 0L
    var i = 0
    while (i < 7) { h = (h << 8) | (d(i) & 0xffL); i += 1 }
    h = (h << 4) | ((d(7) & 0xf0L) >>> 4)
    h % P
  }

  /** The kernel; static so generated code calls it directly. Null for
    * empty item arrays (mirrors the composed form's guard). */
  def run(items: ArrayData, k: Int): ArrayData = {
    val n = items.numElements()
    if (n == 0) return null
    val (as, bs) = coeffs(k)
    val md = digestTL.get()
    val mins = Array.fill(k)(Long.MaxValue)
    var i = 0
    while (i < n) {
      val h = baseHash(md, items.getUTF8String(i))
      var j = 0
      while (j < k) {
        val v = (h * as(j) + bs(j)) % P
        if (v < mins(j)) mins(j) = v
        j += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  /** [[MinhashSlotsFromHashes]]'s kernel: same affine minima, base =
    * `h % p` over the supplied raw hashes — no digests. Null for
    * empty arrays (same guard as [[run]]). */
  def runFromHashes(hs: ArrayData, k: Int): ArrayData = {
    val n = hs.numElements()
    if (n == 0) return null
    val (as, bs) = coeffs(k)
    val mins = Array.fill(k)(Long.MaxValue)
    var i = 0
    while (i < n) {
      val h = hs.getLong(i) % P
      var j = 0
      while (j < k) {
        val v = (h * as(j) + bs(j)) % P
        if (v < mins(j)) mins(j) = v
        j += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  /** Column-API entry point. */
  def minhashSlots(items: Column, k: Int): Column =
    bridge.column(MinhashSlots(bridge.expression(items), k))

  /** Column-API entry point over pre-computed portableHash64 values. */
  def minhashSlotsFromHashes(hs: Column, k: Int): Column =
    bridge.column(MinhashSlotsFromHashes(bridge.expression(hs), k))
}
