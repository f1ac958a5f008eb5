package graft.plans

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class GraftExtensionsSpec extends AnyFunSuite {

  test("a session built with spark.sql.extensions resolves highlight_context") {
    // extensions only apply at session BUILD time — getOrCreate would
    // silently reuse a previous suite's session, so tear down first
    // (suites run sequentially: Test/parallelExecution := false)
    SparkSession.getActiveSession.foreach(_.stop())
    SparkSession.getDefaultSession.foreach(_.stop())
    val spark = SparkSession.builder()
      .master("local[2]")
      .appName("ext-spec")
      .config("spark.sql.extensions", classOf[GraftExtensions].getName)
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try {
      val got = spark.sql(
        "SELECT highlight_context('find the needle here', 'NEEDLE', 4) AS h")
        .head.getString(0)
      assert(got == "the **needle** her")
      // the whole kernel family resolves and computes through SQL
      val kernels = spark.sql(
        """SELECT
             simhash(hashed_word_shingles('alpha beta gamma', 1), 60) AS sh,
             dequantize_q8(pack_int8(array(1, -2, 127)), 0.5D) AS dq,
             round(cosine_sim(array(1.0D, 0.0D), array(1.0D, 0.0D)), 6) AS cs,
             dot_product(array(2.0D, 3.0D), array(4.0D, 5.0D)) AS dp,
             repetition_stats(array('a', 'b', 'a')).n_distinct AS nd""")
        .head
      assert(kernels.getLong(0) != 0L)
      assert(kernels.getSeq[Double](1) == Seq(0.5, -1.0, 63.5))
      assert(kernels.getDouble(2) == 1.0)
      assert(kernels.getDouble(3) == 23.0)
      assert(kernels.getInt(4) == 2)
      // width must be a literal — a column reference fails loudly
      val err = intercept[Exception] {
        spark.sql("SELECT simhash(hashed_word_shingles('x', 1), id + 1) " +
          "FROM range(1)").collect()
      }
      assert(err.getMessage != null)

      // PQ kernels through SQL: dim 4, m=2, ks=2, codebook =
      // [j0: c0=(0,0) c1=(1,1) | j1: c0=(0,0) c1=(2,2)] — the
      // PipelineSpec hand case; vec (0.9,0.9,0.1,0.1)
      // encodes [1, 0], and its ADC table has m*ks = 4 entries
      val pq = spark.sql(
        """SELECT
             pq_encode(array(0.9D, 0.9D, 0.1D, 0.1D),
               array(0D,0D, 1D,1D, 0D,0D, 2D,2D), 2, 2) AS codes,
             size(pq_adc_table(array(0.9D, 0.9D, 0.1D, 0.1D),
               array(0D,0D, 1D,1D, 0D,0D, 2D,2D), 2, 2)) AS tbl_n""")
        .head
      assert(pq.getSeq[Int](0) == Seq(1, 0), pq.getSeq[Int](0))
      assert(pq.getInt(1) == 4)
      // lsh_plane_buckets resolves with literal config
      val lsh = spark.sql(
        "SELECT lsh_plane_buckets(array(1.0D, -1.0D), 2, 2, 2) AS b")
        .head.getSeq[Long](0)
      assert(lsh.length == 2)
      // the text/LSH/IVF family registered round-9: nfc_normalize
      // composes a decomposed accent; minhash signatures band into
      // bands*1 keys; jaccard kernels agree on identical sets;
      // ivf_top_cells ranks the nearest anchor first
      val r9 = spark.sql(
        """SELECT
             nfc_normalize('Café') AS nfc,
             size(lsh_band_keys(minhash_slots_hashed(
               hashed_word_shingles('a b c d', 2), 8), 4, 2)) AS nbands,
             hashed_jaccard(hashed_word_shingles('a b c', 1),
               hashed_word_shingles('a b c', 1)) AS j,
             sorted_hashed_jaccard(
               array_sort(hashed_word_shingles('a b c', 1)),
               array_sort(hashed_word_shingles('a b c', 1))) AS sj,
             ivf_top_cells(array(1.0D, 0.0D),
               array(struct(7L AS cid, array(1.0D, 0.0D) AS cvec),
                     struct(9L AS cid, array(0.0D, 1.0D) AS cvec)),
               1)[0] AS top""")
        .head
      assert(r9.getString(0) == "Café")
      assert(r9.getInt(1) == 4)
      assert(r9.getDouble(2) == 1.0)
      assert(r9.getDouble(3) == 1.0)
      assert(r9.getLong(4) == 7L)
    } finally spark.stop()
  }
}
