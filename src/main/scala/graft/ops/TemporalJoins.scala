package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal join operators.
  *
  * Scale design: an as-of join is deliberately NOT planned as a range
  * theta-join — `key = key AND r.ts <= l.ts` explodes quadratically
  * per key before its window/limit can prune. The union+window form
  * used here is linear at any scale: tag both sides, ONE shuffle on
  * the key, one sort by (ts, side, tie), and a running
  * `last(payload, ignoreNulls)` carries the latest right payload
  * forward to each left row. Skewed keys behave like any window —
  * one partition per key at worst; salt upstream if a single key
  * outgrows an executor (see [[Skew]]).
  */
object TemporalJoins {

  /** For each left row, attach the single most recent right row with
    * `right(rightTsCol) <= left(leftTsCol)` on the same `keys` — the
    * point-in-time ("as-of") join of time-series feature stores.
    *
    * `payload` columns from the matching right row are appended to the
    * unchanged left columns; they are null when no right row precedes
    * the left row, or when `toleranceUs` is set and the match is more
    * than that many microseconds older (the most recent match is also
    * the closest, so filtering it is equivalent to bounding the join).
    *
    * Semantics pinned down for the oracle:
    *  - ties on right ts resolve to the LARGEST `tieBreak` value
    *    (callers pass a unique right-row id for determinism);
    *  - right rows with null ts never match (SQL comparison
    *    semantics); left rows with null ts get null payload but are
    *    kept (left-join semantics);
    *  - null keys match null keys (window partitioning, i.e. GROUP BY
    *    semantics — unlike a SQL equi-join; filter them upstream if
    *    join semantics are needed);
    *  - `payload` names must not collide with left column names.
    */
  def asOfJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTsCol: String, rightTsCol: String,
      payload: Seq[String], tieBreak: String,
      toleranceUs: Option[Long] = None): DataFrame = {
    require(keys.nonEmpty, "asOfJoin needs at least one equality key")
    val leftCols = left.columns.toSeq
    require(payload.forall(!leftCols.contains(_)),
      "payload columns must not collide with left columns")

    // Fixed union schema: keys..., __ts, __side, __tie, __r, __l.
    // Right rows carry their payload in one struct (so a single
    // last(ignoreNulls) suffices); left rows carry theirs likewise.
    val rSide = right.filter(col(rightTsCol).isNotNull)
      .select(keys.map(col) ++ Seq(
        col(rightTsCol).as("__ts"), lit(0).as("__side"),
        col(tieBreak).as("__tie"),
        struct(col(rightTsCol).as("__rts") +: payload.map(col): _*).as("__r"),
        lit(null).cast(org.apache.spark.sql.types.StructType(
          left.schema.fields)).as("__l")): _*)
    val lSide = left
      .select(keys.map(col) ++ Seq(
        col(leftTsCol).as("__ts"), lit(1).as("__side"),
        lit(null).cast(right.schema(tieBreak).dataType).as("__tie"),
        lit(null).cast(rSide.schema("__r").dataType).as("__r"),
        struct(leftCols.map(col): _*).as("__l")): _*)

    // asc_nulls_first on __ts puts null-ts LEFT rows before every
    // right row — they see no match, matching SQL null comparison.
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ts").asc_nulls_first, col("__side").asc,
        col("__tie").asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = rSide.unionByName(lSide)
      .withColumn("__m", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)

    val inRange = toleranceUs match {
      case Some(tol) => col("__m").isNotNull &&
        unix_micros(col("__ts")) - unix_micros(col("__m.__rts")) <= tol
      case None => col("__m").isNotNull
    }
    matched.select(leftCols.map(c => col(s"__l.$c").as(c)) ++
      payload.map(p => when(inRange, col(s"__m.$p")).as(p)): _*)
  }

  /** INTERVAL (range) join: every left row whose `leftTs` falls in a
    * right row's [lo, hi] (both ends inclusive), planned as a
    * BUCKETED EQUI-JOIN — never the theta-join Spark would plan from
    * a bare `ts BETWEEN lo AND hi` condition (a
    * BroadcastNestedLoopJoin, O(n·m) at scale).
    *
    * Both sides key on fixed-width time buckets: an interval explodes
    * into every bucket it overlaps, a point lands in exactly one, the
    * bucket key carries the join to an ordinary hash shuffle, and the
    * exact containment predicate filters inside buckets. Each
    * qualifying (point, interval) pair meets in exactly one bucket —
    * the point's — so no dedup pass is needed. Size `bucketSeconds`
    * near the typical interval length: replication factor is
    * len/bucket + 1 per interval; too small replicates intervals,
    * too large fills buckets with non-matches. Second precision. */
  def rangeJoin(left: DataFrame, leftTs: String, right: DataFrame,
      loCol: String, hiCol: String, bucketSeconds: Long): DataFrame = {
    require(bucketSeconds >= 1, "bucketSeconds must be positive")
    val lb = left.withColumn("__b",
      floor(unix_timestamp(col(leftTs)) / bucketSeconds).cast("long"))
    val rb = right.withColumn("__b", explode(sequence(
      floor(unix_timestamp(col(loCol)) / bucketSeconds).cast("long"),
      floor(unix_timestamp(col(hiCol)) / bucketSeconds).cast("long"))))
    lb.join(rb, Seq("__b"))
      .filter(col(leftTs) >= col(loCol) && col(leftTs) <= col(hiCol))
      .drop("__b")
  }
}
