package graft.plans

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types._

/** Native codegen kernels for the two remaining interpreted HOF hot
  * spots in the LSH dedup pipeline (the signature pass already has
  * [[MinhashSlots]]):
  *
  *  - [[LshBandKeys]]: signature → per-band (band, band_hash) structs.
  *    Replaces `transform(sequence, b → struct(b, md5(concat_ws(slice
  *    …))))` — per-band slice/transform/concat allocations, all
  *    interpreted — with one digest pass per band over a reused
  *    builder.
  *  - [[HashedJaccard]]: exact Jaccard of two long-array item sets.
  *    Replaces `size(array_intersect)/size(array_union)` — which
  *    builds two intermediate ArrayData per pair — with two hash-set
  *    probes and no intermediate arrays.
  *
  * Both are BIT-IDENTICAL to their composed forms (specs assert it on
  * randomized inputs), so the DuckDB oracle needs no change.
  */
case class LshBandKeys(child: Expression, bands: Int, rowsPerBand: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"lsh_band_keys expects array<bigint>, got ${other.simpleString}")
    }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("band", IntegerType, nullable = false),
    StructField("band_hash", LongType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "lsh_band_keys"

  override def nullSafeEval(sig: Any): Any =
    LshKernels.bandKeys(sig.asInstanceOf[ArrayData], bands, rowsPerBand)

  override protected def doGenCode(cg: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(cg, ev, sig => {
      val cls = LshKernels.getClass.getName.stripSuffix("$")
      s"""
         |${ev.value} = $cls.bandKeys($sig, $bands, $rowsPerBand);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Exact set-Jaccard of two SORTED long arrays (duplicates allowed —
  * skipped during the merge): a linear two-pointer merge with zero
  * allocation. Replaces [[HashedJaccard]] in the dedup verify: the
  * HashSet form allocates two boxed sets per PAIR, and its per-pair
  * cost was measured degrading 10-20× in long-lived sessions (JIT
  * re-profiling of the allocation-heavy path); the merge is ~60
  * straight-line long comparisons per element, immune to both. */
case class SortedHashedJaccard(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"sorted_hashed_jaccard expects two array<bigint>, got ${l.simpleString}, ${r.simpleString}")
    }

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "sorted_hashed_jaccard"

  override def nullSafeEval(a: Any, b: Any): Any =
    LshKernels.jaccardSorted(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(cg: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(cg, ev, (a, b) => {
      val cls = LshKernels.getClass.getName.stripSuffix("$")
      s"${ev.value} = $cls.jaccardSorted($a, $b);"
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** All `tables` random-hyperplane LSH bucket keys of one vector in a
  * single codegen'd pass. Replaces the composed form — per plane an
  * interpreted `aggregate(zip_with(vec, planeLit, ...))` dot, i.e.
  * tables×planes lambda-dispatched loops with an intermediate array
  * each. The hyperplane components are the SAME deterministic
  * plan-time values (portableHash64Local("gp:i")/2^60 - 0.5), derived
  * once per (planes, tables, dim) and cached; accumulation is
  * left-to-right from 0.0, so bucket values are bit-identical to the
  * composed form (LshKernelsSpec) and the ss2 oracle needs no change.
  * A vector whose length ≠ dim yields bucket 0 in every table —
  * exactly the composed form's zip_with-null-pads → null dot →
  * `when` false behavior. */
case class LshPlaneBuckets(child: Expression, planes: Int, tables: Int, dim: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"lsh_plane_buckets expects array<float|double>, got ${other.simpleString}")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "lsh_plane_buckets"

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(vec: Any): Any =
    LshKernels.planeBuckets(vec.asInstanceOf[ArrayData], planes, tables, dim, isFloat)

  override protected def doGenCode(cg: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(cg, ev, v => {
      val cls = LshKernels.getClass.getName.stripSuffix("$")
      s"${ev.value} = $cls.planeBuckets($v, $planes, $tables, $dim, $isFloat);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class HashedJaccard(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"hashed_jaccard expects two array<bigint>, got ${l.simpleString}, ${r.simpleString}")
    }

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "hashed_jaccard"

  override def nullSafeEval(a: Any, b: Any): Any =
    LshKernels.jaccard(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(cg: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(cg, ev, (a, b) => {
      val cls = LshKernels.getClass.getName.stripSuffix("$")
      s"${ev.value} = $cls.jaccard($a, $b);"
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object LshKernels {

  private val digestTL = ThreadLocal.withInitial[MessageDigest](() =>
    MessageDigest.getInstance("MD5"))

  /** portableHash64 of a byte string: top 60 bits (15 hex chars) of
    * the md5 digest — identical to conv(substr(md5(s),1,15),16,10). */
  private def hash60(md: MessageDigest, bytes: Array[Byte]): Long = {
    md.reset()
    val d = md.digest(bytes)
    var h = 0L
    var i = 0
    while (i < 7) { h = (h << 8) | (d(i) & 0xffL); i += 1 }
    (h << 4) | ((d(7) & 0xf0L) >>> 4)
  }

  /** Static kernel: band b's key is portableHash64 of the band's
    * slots rendered as "s0,s1,…" (concat_ws(",") of the longs) —
    * byte-for-byte the composed form's input. */
  def bandKeys(sig: ArrayData, bands: Int, rowsPerBand: Int): ArrayData = {
    val md = digestTL.get()
    val out = new Array[Any](bands)
    val sb = new java.lang.StringBuilder(rowsPerBand * 20)
    var b = 0
    while (b < bands) {
      sb.setLength(0)
      var r = 0
      while (r < rowsPerBand) {
        val idx = b * rowsPerBand + r
        if (idx < sig.numElements()) {
          if (r > 0) sb.append(',')
          sb.append(sig.getLong(idx))
        }
        r += 1
      }
      val bytes = sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      out(b) = new GenericInternalRow(Array[Any](b, hash60(md, bytes)))
      b += 1
    }
    new GenericArrayData(out)
  }

  /** Exact set-Jaccard over long arrays; 0.0 when both sets are empty
    * (mirrors the composed form's `when(union = 0, 0.0)` guard). */
  def jaccard(a: ArrayData, b: ArrayData): Double = {
    val sa = new java.util.HashSet[java.lang.Long](
      Math.max(8, a.numElements() * 2))
    var i = 0
    while (i < a.numElements()) { sa.add(a.getLong(i)); i += 1 }
    val sb = new java.util.HashSet[java.lang.Long](
      Math.max(8, b.numElements() * 2))
    var inter = 0
    i = 0
    while (i < b.numElements()) {
      val v: java.lang.Long = b.getLong(i)
      if (sb.add(v) && sa.contains(v)) inter += 1
      i += 1
    }
    val union = sa.size() + sb.size() - inter
    if (union == 0) 0.0 else inter.toDouble / union.toDouble
  }

  /** [[SortedHashedJaccard]]'s kernel: two-pointer merge over sorted
    * arrays, duplicate runs skipped, distinct-set semantics —
    * value-identical to [[jaccard]] on any input whose sort order
    * matches. 0.0 when both sets are empty (same guard). */
  def jaccardSorted(a: ArrayData, b: ArrayData): Double = {
    val an = a.numElements()
    val bn = b.numElements()
    var i = 0
    var j = 0
    var inter = 0
    var union = 0
    while (i < an && j < bn) {
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x == y) {
        inter += 1; union += 1
        i += 1; while (i < an && a.getLong(i) == x) i += 1
        j += 1; while (j < bn && b.getLong(j) == y) j += 1
      } else if (x < y) {
        union += 1
        i += 1; while (i < an && a.getLong(i) == x) i += 1
      } else {
        union += 1
        j += 1; while (j < bn && b.getLong(j) == y) j += 1
      }
    }
    while (i < an) {
      val x = a.getLong(i)
      union += 1
      i += 1; while (i < an && a.getLong(i) == x) i += 1
    }
    while (j < bn) {
      val y = b.getLong(j)
      union += 1
      j += 1; while (j < bn && b.getLong(j) == y) j += 1
    }
    if (union == 0) 0.0 else inter.toDouble / union.toDouble
  }

  // hyperplane components per (planes, tables, dim): global plane gp's
  // component i = portableHash64("gp:i") / 2^60 - 0.5 — identical to
  // SimilaritySearch.planeLit's plan-time literals
  private val planeCache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int, Int), Array[Double]]()
  private def planeComps(planes: Int, tables: Int, dim: Int): Array[Double] =
    planeCache.computeIfAbsent((planes, tables, dim), { case (p, t, d) =>
      Array.tabulate(t * p * d) { idx =>
        val gp = idx / d
        val i = idx % d
        graft.functions.TextFunctions.portableHash64Local(s"$gp:$i").toDouble /
          1.152921504606847e18 - 0.5
      }
    })

  /** [[LshPlaneBuckets]]'s kernel: per table t, pack the sign bits of
    * planes t·planes..t·planes+planes-1 (dot > 0 ⇒ bit o set). A
    * length-mismatched vector OR one containing a null element yields
    * all-zero buckets — exactly the composed form, where zip_with's
    * null padding / null element nulls every plane's dot and the
    * `when(dot > 0)` test fails for every bit. */
  def planeBuckets(vec: ArrayData, planes: Int, tables: Int, dim: Int,
      isFloat: Boolean): ArrayData = {
    val out = new Array[Long](tables)
    if (vec.numElements() != dim) return new GenericArrayData(out)
    var n = 0
    while (n < dim) {
      if (vec.isNullAt(n)) return new GenericArrayData(out)
      n += 1
    }
    val comps = planeComps(planes, tables, dim)
    var t = 0
    while (t < tables) {
      var bucket = 0L
      var o = 0
      while (o < planes) {
        val base = ((t * planes) + o) * dim
        var acc = 0.0
        var i = 0
        while (i < dim) {
          val x = if (isFloat) vec.getFloat(i).toDouble else vec.getDouble(i)
          acc += x * comps(base + i)
          i += 1
        }
        if (acc > 0) bucket += (1L << o)
        o += 1
      }
      out(t) = bucket
      t += 1
    }
    new GenericArrayData(out)
  }

  /** Column-API entry points. */
  def lshBandKeys(sig: Column, bands: Int, rowsPerBand: Int): Column =
    bridge.column(LshBandKeys(bridge.expression(sig), bands, rowsPerBand))

  def lshPlaneBuckets(vec: Column, planes: Int, tables: Int, dim: Int): Column =
    bridge.column(LshPlaneBuckets(bridge.expression(vec), planes, tables, dim))

  def hashedJaccard(a: Column, b: Column): Column =
    bridge.column(HashedJaccard(bridge.expression(a), bridge.expression(b)))

  def sortedHashedJaccard(a: Column, b: Column): Column =
    bridge.column(SortedHashedJaccard(bridge.expression(a), bridge.expression(b)))
}
