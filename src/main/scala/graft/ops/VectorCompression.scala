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
}
