package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.plans.VectorKernels

/** Symmetric int8 quantization for embedding columns — the standard
  * 4× compression a 100 TB vector corpus applies before ANN indexing
  * (float32 → int8 + one double scale per vector).
  *
  * Arithmetic is pinned for cross-engine determinism: scale =
  * max(|v|)/127 (so the max-magnitude component maps to ±127 exactly
  * and no clamp is needed), q_i = round(v_i/scale) with half-away-
  * from-zero ties — the same fold DuckDB's round performs, which is
  * what lets the ss4 gate hash-compare the quantized bytes
  * themselves. A zero vector quantizes to zeros with scale 0.
  *
  * The per-element transforms here are HOF column expressions: a
  * quantization pass is one linear scan per corpus (write-once, read
  * from then on), not a per-pair hot path, so the interpreted-eval
  * cost model that forced the dedup kernels native (PLANS.md round-4
  * appendix) doesn't bite. Fidelity checks reuse the native fused
  * [[VectorKernels.cosineSim]] kernel.
  */
object VectorCompression {

  /** Per-vector quantization scale: max(|v_i|)/127, 0 for the zero
    * vector. Double precision regardless of input element type. */
  def int8Scale(vec: Column): Column =
    array_max(transform(vec, x => abs(x.cast("double")))) / lit(127.0)

  /** q_i = round(v_i/scale) as int (|q_i| ≤ 127 by the scale
    * construction); all-zero array when scale = 0. */
  def quantizeInt8(vec: Column, scale: Column): Column =
    when(scale === 0, transform(vec, _ => lit(0)))
      .otherwise(transform(vec, x => round(x.cast("double") / scale).cast("int")))

  /** Reconstruction: q_i·scale, double. */
  def dequantize(q: Column, scale: Column): Column =
    transform(q, x => x.cast("double") * scale)

  /** Reconstruction fidelity: fused-kernel cosine of original vs
    * dequantized, 0.0 for the zero vector (whose cosine is 0/0). */
  def fidelity(vec: Column, q: Column, scale: Column): Column =
    when(scale === 0, lit(0.0))
      .otherwise(VectorKernels.cosineSim(
        transform(vec, x => x.cast("double")), dequantize(q, scale)))

  /** BINARY (1-bit sign) quantization: component j contributes bit
    * (j mod 64) of word (j div 64) iff v_j > 0, packed into
    * ceil(dim/64) longs — 32× smaller than float32, the most
    * aggressive member of the compression family (int8 → PQ → sign
    * bits). Sign-bit Hamming distance is a monotone proxy for angular
    * distance (Charikar 2002, the same hyperplane-LSH fact the
    * SimHash family rides), which is what makes a Hamming SHORTLIST +
    * exact-cosine rerank the standard deployment
    * ([[SimilaritySearch.binaryRerankTopK]]).
    *
    * Determinism: the packing is pure integer arithmetic over the
    * sign predicate (ties: exactly-0 packs as 0), so quantized words
    * hash-compare across engines, and Hamming distances are exact
    * integers — ranking needs no float discipline at all until the
    * rerank. `dim` is declared by the caller (one scan does the
    * packing; a shorter vector treats missing components as 0). */
  def binarize(vec: Column, dim: Int): Column = {
    require(dim >= 1, s"dim must be positive, got $dim")
    val nWords = (dim + 63) / 64
    val pow2 = array((0 until 64).map(j => lit(1L << j)): _*)
    val words = (0 until nWords).map { w =>
      // the when-guard must bound by size(vec) as well as dim: under
      // ANSI mode (the 4.x default) element_at past the array end
      // throws INVALID_ARRAY_INDEX rather than returning null, so a
      // declared dim larger than an actual vector must short-circuit
      // to the documented missing-components-are-0 behavior instead
      // of erroring at runtime
      aggregate(sequence(lit(0), lit(63)), lit(0L), (acc, j) =>
        acc + when(lit(w * 64) + j < least(lit(dim), size(vec)) &&
            coalesce(element_at(vec, (lit(w * 64) + j + lit(1)).cast("int"))
              .cast("double"), lit(0.0)) > 0,
          element_at(pow2, (j + lit(1)).cast("int"))).otherwise(lit(0L)))
    }
    array(words: _*)
  }

  /** Hamming distance between two packed sign-bit arrays
    * ([[binarize]] outputs): Σ popcount(a_w XOR b_w) — one integer
    * fold per pair, the 8-bytes-per-64-dims scan that makes a binary
    * shortlist pass affordable over a corpus no float scan could
    * touch. */
  def hamming(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => bit_count(x.bitwiseXOR(y)).cast("long")),
      lit(0L), (acc, d) => acc + d)
}
