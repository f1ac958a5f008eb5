package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text/tokenization primitives for the training-data pipeline
  * operators (dedup, similarity, analysis). All pure Column
  * expressions — higher-order array functions, no UDFs, so the whole
  * pipeline stays in codegen and scales linearly per row.
  *
  * Hashing is the **portable 60-bit md5 prefix**
  * (`conv(substr(md5(s),1,15),16,10)`): deterministic, available in
  * any engine (the DuckDB oracle uses `('0x'||substr(md5(s),1,15))
  * ::BIGINT`), and ANSI-safe (< 2^60, no overflow). xxhash64 would be
  * ~3× faster but is Spark-private — the verify gate needs
  * cross-engine equality; swap `portableHash64` for `xxhash64` when
  * running without an oracle.
  */
object TextFunctions {

  /** Whitespace tokens; empty array for blank/null-ish input.
    * The isNull arm is load-bearing: without it the when-condition
    * evaluates NULL for null text and the otherwise branch returns
    * split(NULL) = NULL — violating this contract and leaking
    * NULL-binned rows into integer-only consumers (lengthHistogram's
    * bin column was the observed casualty). */
  def tokens(text: Column): Column =
    when(text.isNull || length(trim(text)) === 0,
      array().cast("array<string>"))
      .otherwise(split(trim(text), "\\s+"))

  /** Deterministic cross-engine 60-bit hash (see object doc). */
  def portableHash64(s: Column): Column =
    conv(substring(md5(s.cast("binary")), 1, 15), 16, 10).cast("long")

  /** JVM-side twin of [[portableHash64]] — same md5-prefix value,
    * computed at plan-build time. Lets operators bake deterministic
    * pseudo-random constants (LSH hyperplane components) into the
    * plan as literals instead of re-hashing a constant per row. */
  def portableHash64Local(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    java.lang.Long.parseLong(
      d.take(8).map(b => f"$b%02x").mkString.substring(0, 15), 16)
  }

  /** Word n-gram shingles, space-joined; empty when too few tokens. */
  def wordShingles(toks: Column, n: Int): Column =
    when(size(toks) < n, array().cast("array<string>"))
      .otherwise(transform(
        sequence(lit(1), size(toks) - (n - 1)),
        i => array_join(slice(toks, i, lit(n)), " ")))

  /** Distinct character n-grams; empty when the text is too short. */
  def charNgrams(text: Column, n: Int): Column =
    when(length(text) < n, array().cast("array<string>"))
      .otherwise(array_distinct(transform(
        sequence(lit(1), length(text) - (n - 1)),
        i => text.substr(i, lit(n)))))

  /** MinHash modulus and the k affine-derived hash constants
    * (universal hashing family h_i(x) = (a_i·x + b_i) mod p): ONE md5
    * per shingle, k cheap integer perturbations — 32× fewer digests
    * than hashing per-seed. Constants are fixed (seeded) so the
    * DuckDB oracle interpolates the same numbers. p = 1e9+7 keeps
    * a_i·x < 1e9·(1e9+7) < 2^63 (ANSI-safe). */
  val MinhashP: Long = 1000000007L
  def minhashCoeffs(k: Int): Seq[(Long, Long)] = {
    val rnd = new scala.util.Random(7)
    Seq.fill(k)((1L + rnd.nextInt(999999999).toLong,
      rnd.nextInt(1000000007).toLong))
  }

  /** Per-shingle base hashes (one md5 each). Project this into its
    * OWN column (ideally behind an exchange) before computing slots —
    * referencing it from the k slot expressions inline would
    * re-evaluate the md5 pass k times. */
  def minhashBase(shingles: Column): Column =
    transform(shingles, sh => portableHash64(sh) % MinhashP)

  /** The k affine MinHash slots over a pre-computed base-hash array. */
  def minhashSlotsFromBase(base: Column, k: Int): Column = {
    val slots = minhashCoeffs(k).map { case (a, b) =>
      array_min(transform(base, h => (h * a + b) % MinhashP))
    }
    when(size(base) === 0, lit(null).cast("array<bigint>"))
      .otherwise(array(slots: _*))
  }

  /** One-shot signature (inline base — fine for small k or one-off
    * use; the LSH pipeline uses the split form). */
  def minhashSignature(shingles: Column, k: Int): Column =
    minhashSlotsFromBase(minhashBase(shingles), k)

  /** LSH band keys from a signature: `bands` hashes, each over a
    * contiguous rows-per-band slice. Pairs agreeing on ANY band are
    * candidates — the standard s-curve selectivity knob. */
  def lshBandKeys(signature: Column, bands: Int, rowsPerBand: Int): Column =
    transform(sequence(lit(0), lit(bands - 1)),
      b => struct(b.as("band"),
        portableHash64(concat_ws(",",
          transform(slice(signature, b * rowsPerBand + 1, lit(rowsPerBand)),
            v => v.cast("string")))).as("band_hash")))

  /** 32-bit SimHash over a token array: per bit, sum +1/-1 weighted by
    * each token's hash bit; the sign vector packs into one long. Near-
    * identical texts land on near-identical (often equal) values.
    * The 32 bit positions are unrolled at plan-build time (shiftright
    * needs a literal count); token hashes are computed once and the 32
    * per-bit folds run over the cached hash array. */
  def simhash32(toks: Column): Column =
    simhash32FromHashes(transform(toks, t => portableHash64(t)))

  /** SimHash over pre-computed hashes — callers should project the
    * hash array into its own column first so the md5s evaluate once,
    * not once per bit fold. */
  def simhash32FromHashes(hs: Column): Column =
    simhashFromHashes(hs, 32)

  /** Width-parametric composed form (width ≤ 60: every bit position
    * must be live in the portable 60-bit hash). Kept as the
    * bit-parity reference for the native one-pass kernel
    * ([[graft.plans.SimhashKernel]]) — width interpreted folds, so
    * use the kernel in any hot path. */
  def simhashFromHashes(hs: Column, width: Int): Column =
    (0 until width).map { i =>
      val score = aggregate(hs, lit(0L), (acc, h) =>
        acc + when(shiftright(h, i) % 2 === 1, 1L).otherwise(-1L))
      when(score > 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** Jaccard similarity of two arrays treated as sets. Exact rational
    * arithmetic (int/int in double) — bit-identical across engines. */
  def jaccardSim(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast("double")
    val uni = size(array_union(a, b)).cast("double")
    when(uni === 0, 0.0).otherwise(inter / uni)
  }

  /** Double dot product with strict left-to-right accumulation
    * (aggregate is a sequential fold), matching the oracle's
    * list_reduce order. */
  def dotProduct(x: Column, y: Column): Column =
    aggregate(zip_with(x, y, (p, q) => p.cast("double") * q.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  /** Cosine similarity of two float vectors in double. NB the exact
    * expression shape (sqrt of the product) is part of the oracle
    * contract — sqrt(aa)*sqrt(bb) is a different double. */
  def cosineSim(a: Column, b: Column): Column =
    dotProduct(a, b) / sqrt(dotProduct(a, a) * dotProduct(b, b))

  /** Normalized-text fingerprint: lowercase, collapse whitespace,
    * trim, md5 — the exact-dedup key (rolling-hash variant:
    * [[rollingFingerprint]]). */
  def fingerprint(text: Column): Column =
    md5(regexp_replace(lower(trim(text)), "\\s+", " ").cast("binary"))

  /** Karp–Rabin-style rolling fingerprint over tokens: fold
    * acc = (acc * 31 + h(tok)) mod p with p = 1e9+7 (keeps every
    * intermediate < 2^63 under ANSI). Order-sensitive, unlike the
    * set-based shingle hashes. */
  def rollingFingerprint(toks: Column): Column =
    aggregate(toks, lit(0L), (acc, t) =>
      (acc * 31L + pmod(portableHash64(t), lit(1000000007L))) % 1000000007L)
}
