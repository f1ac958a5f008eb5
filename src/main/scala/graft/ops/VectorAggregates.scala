package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Vector AGGREGATES over an embedding column — the reductions under
  * cluster summaries, IVF codebook refinement (the k-means update
  * step), and class prototypes.
  *
  * Output is LONG format (group, pos, n, sum, centroid): one row per
  * (group, dimension). Long format keeps the result hash-comparable
  * by any engine (no array columns at the boundary) and is what the
  * next pipeline stage usually wants anyway (re-assembly to arrays is
  * one `collect_list` over pos when needed).
  *
  * Scale shape (production form): posexplode rides the scan, then ONE
  * (group, pos) exchange with map-side partial aggregation — hot
  * groups combine inside every map task, so group skew is absorbed
  * where it is born; cardinality after the exchange is
  * groups × dim, tiny at any corpus size.
  *
  * Determinism note — why `ordered` exists: cross-row floating-point
  * addition order is engine- and partitioning-dependent, so two
  * correct engines legitimately differ in the last ulp of an
  * unordered sum. `ordered = true` computes the SAME numbers as a
  * running fold in `idCol` order per (group, pos) — a fixed
  * left-to-right double summation any engine replicates bit-for-bit
  * (the cross-row analog of the per-row fold discipline the ss-family
  * oracles already use). The price is a per-(group, pos) sort window
  * instead of the partial agg; production callers keep the default.
  */
object VectorAggregates {

  def labelCentroids(df: DataFrame, groupCol: String, idCol: String,
      vecCol: String, ordered: Boolean = false): DataFrame = {
    val exploded = df.select(col(groupCol), col(idCol),
        posexplode(col(vecCol)).as(Seq("pos", "__v")))
      .withColumn("__v", col("__v").cast("double"))
    if (!ordered) {
      exploded.groupBy(col(groupCol), col("pos"))
        .agg(count(lit(1)).as("n"), sum(col("__v")).as("sum"))
        .withColumn("centroid", col("sum") / col("n"))
    } else {
      val w = Window.partitionBy(col(groupCol), col("pos"))
        .orderBy(col(idCol).asc)
      val acc = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      exploded
        .withColumn("n", count(lit(1)).over(acc))
        .withColumn("sum", sum(col("__v")).over(acc))
        .withColumn("__rn", row_number().over(
          Window.partitionBy(col(groupCol), col("pos"))
            .orderBy(col(idCol).desc)))
        .filter(col("__rn") === 1)
        .select(col(groupCol), col("pos"), col("n"), col("sum"),
          (col("sum") / col("n")).as("centroid"))
    }
  }
}
