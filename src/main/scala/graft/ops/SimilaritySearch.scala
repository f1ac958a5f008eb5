package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions._

/** Approximate-nearest-neighbor search over an embedding column.
  *
  *  - [[bruteForceTopK]]: exact cosine top-k — the baseline and the
  *    recall oracle. Cross-join shaped; correct answer, O(|Q|·|C|).
  *    Fine when |Q| is small (the common "query batch" case) because
  *    the candidate side streams through a broadcast of the queries;
  *    never materializes the full product (TakeOrdered per query via
  *    window over rank).
  *  - [[lshTopK]]: random-hyperplane LSH — sign-bit bucket join, then
  *    exact cosine only within matching buckets. The scale path: the
  *    shuffle is keyed by bucket, the pair count collapses from
  *    |Q|·|C| to the bucket collision mass. Hyperplanes are
  *    deterministic pseudo-random vectors derived from the portable
  *    hash so results are reproducible across engines and runs.
  *    (An IVF variant would swap the bucket key for a k-means coarse
  *    centroid id — same join shape.)
  */
object SimilaritySearch {

  /** Exact top-k neighbors per query by cosine (desc), deterministic
    * tie-break on neighbor id. */
  def bruteForceTopK(queries: DataFrame, candidates: DataFrame,
      idCol: String, vecCol: String, k: Int): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("q_vec"))
    val c = candidates.select(col(idCol).as("neighbor_id"), col(vecCol).as("c_vec"))
    val scored = q.crossJoin(c)
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", cosineSim(col("q_vec"), col("c_vec")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "cos")
  }

  /** Deterministic hyperplane component h[p][i] in [-0.5, 0.5):
    * portableHash64("p:i") / 2^60 - 0.5. */
  private def hyperplaneSignBits(vec: org.apache.spark.sql.Column, planes: Int) =
    transform(sequence(lit(0), lit(planes - 1)), p => {
      val dot = aggregate(
        zip_with(vec,
          sequence(lit(0), size(vec) - 1),
          (x, i) => x.cast("double") *
            (portableHash64(concat(p.cast("string"), lit(":"), i.cast("string")))
              .cast("double") / lit(1.152921504606847e18) - lit(0.5))),
        lit(0.0), (acc, v) => acc + v)
      when(dot > 0, lit(1)).otherwise(lit(0))
    })

  /** LSH ANN: bucket by `planes` sign bits (packed to a long), join
    * query buckets to candidate buckets, exact cosine within, top-k.
    * Smaller `planes` → bigger buckets → higher recall, more compute.
    */
  def lshTopK(queries: DataFrame, candidates: DataFrame,
      idCol: String, vecCol: String, k: Int, planes: Int = 8): DataFrame = {
    def packed(df: DataFrame, id: String, vec: String) =
      df.select(col(idCol).as(id), col(vecCol).as(vec),
        aggregate(
          zip_with(hyperplaneSignBits(col(vecCol), planes),
            // 2^i per plane as a literal array (shiftleft needs a
            // literal count; planes is a plan-time constant)
            array((0 until planes).map(i => lit(1L << i)): _*),
            (bit, p2) => bit.cast("long") * p2),
          lit(0L), (acc, v) => acc + v).as("bucket"))
    val q = packed(queries, "query_id", "q_vec")
    val c = packed(candidates, "neighbor_id", "c_vec")
    val scored = q.join(c, Seq("bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", cosineSim(col("q_vec"), col("c_vec")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "cos")
  }
}
