package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._


/** Bloom-filter semi-join: the 100 TB scan-pruning technique. When
  * the probe side is huge and the build side's KEY SET is too large
  * to broadcast as an exact set (tens of millions of keys), a Bloom
  * filter of fixed size (numBits/8 bytes, regardless of key count)
  * broadcasts instead, the probe side drops non-members DURING THE
  * SCAN, and only the survivors — true matches plus the p_fp
  * false-positive tail — pay the exact semi-join shuffle. Spark's
  * own runtime bloom pruning does this opportunistically; this
  * operator is the explicit, deterministic form.
  *
  * Determinism: bit positions come from seeded xxhash64
  * (`xxhash64(key, i) pmod numBits` for i < numHashes) — fixed for a
  * given key across runs and partitionings, so the survivor set is
  * reproducible within the engine. Cross-engine portability is not
  * needed: the contract (and the oracle) is the RESULT, which the
  * exact semi-join makes independent of the filter internals.
  *
  * Correctness is UNCONDITIONAL on the bloom quality: no key in the
  * build side can hash to an unset bit (no false negatives by
  * construction), and the trailing exact semi-join removes every
  * false positive — the filter only affects how many rows reach the
  * shuffle. The gate therefore compares against a plain semi-join.
  *
  * Scale shape: the build side reduces to ≤ numBits distinct set-bit
  * positions at the map-side combiners; only those positions (ints,
  * bounded by numBits, NOT by key count) reach the driver — the
  * ParquetTableStore ≤numBuckets collect discipline. The probe-side
  * membership test is numHashes codegen'd xxhash64s per row, evaluated
  * in the scan stage before any exchange. */
object BloomJoin {

  /** Set-bit positions for one key (k hash functions). xxhash64 —
    * codegen'd, no md5 round-trip — because bit positions never need
    * CROSS-ENGINE portability: the oracle compares the final join
    * result, not the filter internals (md5-based portableHash64 here
    * measured 3× the probe-scan cost at sf0.1 for zero benefit). */
  private def bitPositions(key: Column, numBits: Int,
      numHashes: Int): Seq[Column] =
    (0 until numHashes).map { i =>
      pmod(xxhash64(key, lit(i)), lit(numBits.toLong)).cast("long")
    }

  /** Build the filter: Array[Long] words (length numBits/64), bits
    * set for every key in `keys`. Driver receives only the distinct
    * positions (≤ numBits ints). */
  def buildBloom(keys: DataFrame, keyCol: String, numBits: Int = 1 << 16,
      numHashes: Int = 3): Array[Long] = {
    require(numBits % 64 == 0 && numBits > 0, s"numBits $numBits % 64 != 0")
    val pos = keys.select(explode(array(
        bitPositions(col(keyCol), numBits, numHashes): _*)).as("p"))
      .distinct().collect().map(_.getLong(0))
    val words = new Array[Long](numBits / 64)
    pos.foreach(p => words((p / 64).toInt) |= (1L << (p % 64)))
    words
  }

  /** Bits for an expected build-side key count at `bitsPerKey` bits
    * each (~10 bits/key ≈ 1% fp with 3 hashes), rounded up to a
    * 64-bit word boundary: the sizing rule that keeps the filter
    * USEFUL at its advertised scale — the old fixed 2^16 default
    * saturates (all bits set, zero pruning) past ~20k keys. */
  def bitsFor(expectedKeys: Long, bitsPerKey: Int = 10): Int = {
    require(expectedKeys > 0 && bitsPerKey > 0)
    val raw = math.min(expectedKeys * bitsPerKey.toLong, 1L << 30)
    (((raw + 63) / 64) * 64).toInt
  }

  /** Membership test column against a built filter (all k bits set).
    * The words ship as ONE typed array literal (a single
    * ArrayType(LongType) Literal in the plan — numBits/8 bytes,
    * serialized once with the task binary), NOT as numBits/64
    * per-element literal expressions: at the 2^27-bit size tens of
    * millions of keys need, element-wise literals would be ~2M
    * Catalyst expressions and break codegen, while one typed literal
    * behaves like a broadcast scalar. */
  def mightContain(key: Column, words: Array[Long],
      numHashes: Int = 3): Column = {
    val numBits = words.length * 64
    val wordsLit = typedLit(words.toIndexedSeq)
    bitPositions(key, numBits, numHashes).map { p =>
      (element_at(wordsLit, (p / 64).cast("int") + 1)
        .bitwiseAND(call_function("shiftleft", lit(1L),
          (p % 64).cast("int")))) =!= 0L
    }.reduceLeft(_ && _)
  }

  /** big ⋉ small on bigKey = smallKey, bloom-pruned: scan-stage
    * membership filter, then the exact LEFT SEMI join over the
    * survivors only. Prefer [[bloomSemiJoinSized]] (the [[bitsFor]]
    * entry point) unless you have a reason to pin the bit budget —
    * the fixed default here saturates past ~20k build-side keys. */
  def bloomSemiJoin(big: DataFrame, bigKey: String,
      small: DataFrame, smallKey: String, numBits: Int = 1 << 16,
      numHashes: Int = 3): DataFrame = {
    val words = buildBloom(small.select(col(smallKey)), smallKey,
      numBits, numHashes)
    big.filter(mightContain(col(bigKey), words, numHashes))
      .join(small.select(col(smallKey).as(bigKey)), Seq(bigKey), "left_semi")
  }

  /** [[bloomSemiJoin]] with the filter sized from the caller's
    * expected build-side key count ([[bitsFor]], ~10 bits/key) —
    * the form a deployment should use, since a fixed bit budget
    * either wastes memory or saturates as the build side grows. */
  def bloomSemiJoinSized(big: DataFrame, bigKey: String,
      small: DataFrame, smallKey: String, expectedKeys: Long,
      numHashes: Int = 3): DataFrame =
    bloomSemiJoin(big, bigKey, small, smallKey,
      bitsFor(expectedKeys), numHashes)
}
