package graft.ops

import java.io.ByteArrayInputStream

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.CountMinSketch

/** Frequency sketches for corpus-scale hot-item analysis.
  *
  * The library already carries two sketch disciplines — HLL
  * cardinality (a7b) and approximate quantiles (a8b); this adds the
  * third classic: count-min FREQUENCY estimation (Cormode &
  * Muthukrishnan 2005), the tool for hot-token / boilerplate-URL /
  * hot-key detection when an exact per-item count of the long tail
  * is not worth a corpus-sized exchange.
  *
  * Scale shape: the sketch is ONE combinable aggregation whose state
  * is a constant-size counter matrix (depth ≈ ln(1/(1−confidence))
  * rows × width ≈ 2/eps counters — ~800 KB at the defaults,
  * independent of corpus size); counter addition commutes, so
  * map-side partials merge exactly and the estimate is deterministic
  * for a fixed (data, seed) regardless of partitioning. The only
  * driver materialization is the sketch itself plus the k probe
  * rows — both bounded by construction, never corpus-sized.
  */
object Sketches {

  /** HEAVY HITTERS with a count-min error-band canary: the exact
    * top-`k` items of `df(colName)` (ties broken by item — total,
    * engine-portable order), each probed against a count-min sketch
    * built over the SAME column in one constant-state pass, with a
    * boolean asserting the estimate landed inside the sketch's
    * published guarantee band: exact ≤ est ≤ exact + eps·N (N = total
    * item count; a count-min estimate never undershoots, and
    * overshoots by more than eps·N only with probability 1−confidence
    * — deterministic for a fixed input and seed).
    *
    * This is the a7b/a8b/ss8 canary discipline applied to frequency
    * sketching: the exact side IS the oracle-checkable truth, the
    * band pins the sketch against it, and a sketch regression (seed
    * drift, merge bug, width mis-sizing) turns the gate red instead
    * of hiding inside an approximate answer. In production the exact
    * side is replaced by any cheap candidate source (a sample, the
    * previous round's hitters) and the sketch alone answers at
    * scan rate.
    *
    * Returns (item, exact_n, within_band) for the top-k, ordered by
    * (exact_n desc, item). */
  def cmsHeavyHitters(df: DataFrame, colName: String, k: Int,
      eps: Double = 1e-4, confidence: Double = 0.99,
      seed: Int = 42): DataFrame = {
    val spark = df.sparkSession
    val items = df.select(col(colName).cast("string").as("item"))
      .where(col("item").isNotNull)
    // ONE pass, constant-size state. The collect is the sketch
    // itself: width×depth counters, sized by (eps, confidence) only.
    val skBytes = items
      .agg(count_min_sketch(col("item"), lit(eps), lit(confidence),
        lit(seed)).as("sk"))
      .head.getAs[Array[Byte]]("sk")
    val sketch = CountMinSketch.readFrom(new ByteArrayInputStream(skBytes))
    val slack = math.ceil(eps * sketch.totalCount()).toLong
    // exact top-k candidates: combinable count + TakeOrdered top-k,
    // then a k-row collect (bounded by construction)
    val exact = items.groupBy("item").agg(count(lit(1)).as("exact_n"))
      .orderBy(col("exact_n").desc, col("item"))
      .limit(k)
      .collect()
    val rows = exact.toSeq.map { r =>
      val item = r.getString(0)
      val n = r.getLong(1)
      val est = sketch.estimateCount(item)
      (item, n, est >= n && est <= n + slack)
    }
    import spark.implicits._
    rows.toDF("item", "exact_n", "within_band")
      .orderBy(col("exact_n").desc, col("item"))
  }

  /** The raw serialized count-min sketch of `df(colName)` — for
    * callers that build once and probe many times (the d10/ss9
    * stored-artifact discipline: persist the bytes, probe any later
    * candidate set without another corpus pass). */
  def cmsBuild(df: DataFrame, colName: String, eps: Double = 1e-4,
      confidence: Double = 0.99, seed: Int = 42): CountMinSketch = {
    val bytes = df.select(col(colName).cast("string").as("item"))
      .where(col("item").isNotNull)
      .agg(count_min_sketch(col("item"), lit(eps), lit(confidence),
        lit(seed)).as("sk"))
      .head.getAs[Array[Byte]]("sk")
    CountMinSketch.readFrom(new ByteArrayInputStream(bytes))
  }
}
