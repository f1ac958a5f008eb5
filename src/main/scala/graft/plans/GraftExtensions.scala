package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.IntegerType

/** SparkSessionExtensions entry point — the deployment-grade way to
  * ship the engine's Catalyst additions into ANY session:
  *
  * {{{
  *   spark.sql.extensions=graft.plans.GraftExtensions
  * }}}
  *
  * Registers every native kernel as a SQL function, so `spark.sql`
  * users get the same codegen'd hot paths the Column API uses:
  * highlight_context, hashed_word_shingles, hashed_char_ngrams,
  * simhash, pack_int8, dequantize_q8, dot_product, cosine_sim,
  * repetition_stats, lsh_plane_buckets, pq_encode, pq_adc_table.
  * Planner strategies/rules would be injected here
  * too if an operator ever needs them (the reference's surface
  * doesn't — SURVEY §4.2).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  /** Width/size parameters must be plan-time constants (they bake
    * into generated code): accept any foldable integer expression. */
  private def intArg(e: Expression, fn: String, arg: String): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case e if e.foldable && e.dataType == IntegerType =>
      e.eval().asInstanceOf[Int]
    case other => throw new IllegalArgumentException(
      s"$fn: $arg must be an integer literal, got $other")
  }

  private def arity(fn: String, exprs: Seq[Expression], n: Int): Unit =
    require(exprs.length == n,
      s"$fn requires $n argument(s); got ${exprs.length}")

  override def apply(e: SparkSessionExtensions): Unit = {
    def inject(name: String, cls: Class[_],
        builder: Seq[Expression] => Expression): Unit =
      e.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo(cls.getName, name), builder))

    inject("highlight_context", classOf[HighlightContext],
      HighlightContext.fromExpressions)
    inject("hashed_word_shingles", classOf[HashedWordShingles], exprs => {
      arity("hashed_word_shingles", exprs, 2)
      HashedWordShingles(exprs(0),
        intArg(exprs(1), "hashed_word_shingles", "n"))
    })
    inject("hashed_char_ngrams", classOf[HashedCharNgrams], exprs => {
      arity("hashed_char_ngrams", exprs, 2)
      HashedCharNgrams(exprs(0), intArg(exprs(1), "hashed_char_ngrams", "n"))
    })
    inject("simhash", classOf[SimhashWide], exprs => {
      arity("simhash", exprs, 2)
      SimhashWide(exprs(0), intArg(exprs(1), "simhash", "width"))
    })
    inject("nfc_normalize", classOf[NfcNormalize], exprs => {
      arity("nfc_normalize", exprs, 1)
      NfcNormalize(exprs(0))
    })
    inject("minhash_slots", classOf[MinhashSlots], exprs => {
      arity("minhash_slots", exprs, 2)
      MinhashSlots(exprs(0), intArg(exprs(1), "minhash_slots", "numHashes"))
    })
    inject("minhash_slots_hashed", classOf[MinhashSlotsFromHashes], exprs => {
      arity("minhash_slots_hashed", exprs, 2)
      MinhashSlotsFromHashes(exprs(0),
        intArg(exprs(1), "minhash_slots_hashed", "numHashes"))
    })
    inject("lsh_band_keys", classOf[LshBandKeys], exprs => {
      arity("lsh_band_keys", exprs, 3)
      LshBandKeys(exprs(0), intArg(exprs(1), "lsh_band_keys", "bands"),
        intArg(exprs(2), "lsh_band_keys", "rowsPerBand"))
    })
    inject("hashed_jaccard", classOf[HashedJaccard], exprs => {
      arity("hashed_jaccard", exprs, 2)
      HashedJaccard(exprs(0), exprs(1))
    })
    inject("sorted_hashed_jaccard", classOf[SortedHashedJaccard], exprs => {
      arity("sorted_hashed_jaccard", exprs, 2)
      SortedHashedJaccard(exprs(0), exprs(1))
    })
    inject("ivf_top_cells", classOf[IvfTopCells], exprs => {
      arity("ivf_top_cells", exprs, 3)
      IvfTopCells(exprs(0), exprs(1), intArg(exprs(2), "ivf_top_cells", "probes"))
    })
    inject("pack_int8", classOf[PackInt8], exprs => {
      arity("pack_int8", exprs, 1)
      PackInt8(exprs(0))
    })
    inject("dequantize_q8", classOf[DequantizeQ8], exprs => {
      arity("dequantize_q8", exprs, 2)
      DequantizeQ8(exprs(0), exprs(1))
    })
    inject("dot_product", classOf[DotProductKernel], exprs => {
      arity("dot_product", exprs, 2)
      DotProductKernel(exprs(0), exprs(1))
    })
    inject("cosine_sim", classOf[CosineSimKernel], exprs => {
      arity("cosine_sim", exprs, 2)
      CosineSimKernel(exprs(0), exprs(1))
    })
    inject("repetition_stats", classOf[RepetitionStats], exprs => {
      arity("repetition_stats", exprs, 1)
      RepetitionStats(exprs(0))
    })
    inject("lsh_plane_buckets", classOf[LshPlaneBuckets], exprs => {
      arity("lsh_plane_buckets", exprs, 4)
      LshPlaneBuckets(exprs(0),
        intArg(exprs(1), "lsh_plane_buckets", "planes"),
        intArg(exprs(2), "lsh_plane_buckets", "tables"),
        intArg(exprs(3), "lsh_plane_buckets", "dim"))
    })
    // pq_encode(vec, codebook_array, m, ks) / pq_adc_table(...):
    // the codebook is a plan-time constant (array<double> literal,
    // length m·ks·subDim) — it bakes into the generated code as a
    // reference object, same as the Column API path
    def cbArg(e: Expression, fn: String): IndexedSeq[Double] = {
      require(e.foldable, s"$fn: codebook must be a constant array")
      e.eval() match {
        case a: org.apache.spark.sql.catalyst.util.ArrayData =>
          a.toDoubleArray().toIndexedSeq
        case other => throw new IllegalArgumentException(
          s"$fn: codebook must be array<double>, got $other")
      }
    }
    def pqDims(fn: String, cb: IndexedSeq[Double], m: Int, ks: Int): Int = {
      require(m > 0 && ks > 0 && cb.length % (m * ks) == 0,
        s"$fn: codebook length ${cb.length} must be m*ks*subDim")
      cb.length / (m * ks)
    }
    inject("pq_encode", classOf[PqKernels.PqEncode], exprs => {
      arity("pq_encode", exprs, 4)
      val cb = cbArg(exprs(1), "pq_encode")
      val (m, ks) = (intArg(exprs(2), "pq_encode", "m"),
        intArg(exprs(3), "pq_encode", "ks"))
      PqKernels.PqEncode(exprs(0), cb, m, ks, pqDims("pq_encode", cb, m, ks))
    })
    inject("pq_adc_table", classOf[PqKernels.PqAdcTable], exprs => {
      arity("pq_adc_table", exprs, 4)
      val cb = cbArg(exprs(1), "pq_adc_table")
      val (m, ks) = (intArg(exprs(2), "pq_adc_table", "m"),
        intArg(exprs(3), "pq_adc_table", "ks"))
      PqKernels.PqAdcTable(exprs(0), cb, m, ks,
        pqDims("pq_adc_table", cb, m, ks))
    })
  }
}
