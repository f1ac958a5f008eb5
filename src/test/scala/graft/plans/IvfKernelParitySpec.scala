package graft.plans

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The native IVF ranking kernel must order anchors exactly like the
  * composed slice(array_sort(transform(struct(-cos, cid)))) form it
  * replaced — including cid tie-breaks on duplicate anchors — or the
  * d5/ss3 DuckDB oracles stop being valid. */
class IvfKernelParitySpec extends SparkSpec {
  import spark.implicits._

  test("ivf_top_cells == composed array_sort ranking, ties on cid") {
    val rnd = new scala.util.Random(29)
    val dim = 8
    // anchors include an exact duplicate pair (cids 3 and 4) so the
    // cosine tie is real and the cid tie-break is exercised
    val dup = Array.fill(dim)(rnd.nextFloat())
    val anchorRows = (0L until 6L).map { cid =>
      (cid, if (cid == 3L || cid == 4L) dup.toSeq
            else Array.fill(dim)(rnd.nextFloat() * 2 - 1).toSeq)
    }
    val anchors = anchorRows.toDF("centroid_id", "vec")
      .agg(collect_list(struct(col("centroid_id"), col("vec"))).as("__anchors"))
    val vecs = (1 to 100).map(i =>
      (i.toLong, Array.fill(dim)(rnd.nextFloat() * 2 - 1))).toDF("id", "vec")

    for (probes <- Seq(1, 3, 6)) {
      val native = vecs.crossJoin(anchors)
        .select(col("id"),
          explode(VectorKernels.ivfTopCells(col("vec"), col("__anchors"), probes))
            .as("cid"))
      val composed = vecs.crossJoin(anchors)
        .select(col("id"),
          explode(slice(array_sort(transform(col("__anchors"), a =>
            struct((lit(0.0) - VectorKernels.cosineSim(col("vec"), a.getField("vec"))).as("neg"),
              a.getField("centroid_id").as("cid")))), 1, probes)).as("p"))
        .select(col("id"), col("p.cid").as("cid"))
      assert(native.exceptAll(composed).isEmpty &&
        composed.exceptAll(native).isEmpty, s"probes=$probes mismatch")
    }
  }

  test("probes beyond anchor count returns every anchor once") {
    val anchors = Seq((1L, Seq(1.0f, 0.0f)), (2L, Seq(0.0f, 1.0f)))
      .toDF("centroid_id", "vec")
      .agg(collect_list(struct(col("centroid_id"), col("vec"))).as("__anchors"))
    val got = Seq((9L, Seq(1.0f, 0.5f))).toDF("id", "vec")
      .crossJoin(anchors)
      .select(VectorKernels.ivfTopCells(col("vec"), col("__anchors"), 10).as("c"))
      .head().getSeq[Long](0)
    assert(got.size == 2 && got.toSet == Set(1L, 2L))
    assert(got.head == 1L, "nearest anchor must rank first")
  }
}
