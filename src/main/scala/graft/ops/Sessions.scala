package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch sessionization: the classic gap-based session assignment
  * (a new session starts when the gap to the previous event of the
  * same key exceeds `gapSeconds`), as two stacked window passes over
  * ONE (key, ts) exchange.
  *
  * Scale shape: both windows partition by the key column, so Catalyst
  * plans a single hashpartitioning(key) exchange feeding one sort —
  * the lag pass and the running-sum pass run back-to-back in the same
  * stage with no second shuffle. Per-key state is a sort over that
  * key's events only; skewed keys are bounded by the events-per-key
  * distribution, not the corpus. This is the batch twin of the
  * Structured Streaming sessionizer (graft.streaming.Streams
  * .sessionize) — same gap semantics, verifiable against a SQL
  * oracle, where the streaming one is spec-verified.
  *
  * `tieBreak` makes the within-key order total when timestamps can
  * collide (same-ts events would otherwise make lag() — and therefore
  * session boundaries — nondeterministic).
  */
object Sessions {

  /** Event rows + (session_no, is_session_start): session_no numbers
    * each key's sessions 1..n in time order. */
  def assignSessions(df: DataFrame, keyCol: String, tsCol: String,
      gapSeconds: Long, tieBreak: String): DataFrame = {
    require(gapSeconds > 0, "gapSeconds must be positive")
    val order = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol).asc, col(tieBreak).asc)
    val newSession = when(
      col("__prev_ts").isNull ||
        unix_millis(col(tsCol)) - unix_millis(col("__prev_ts")) >
          gapSeconds * 1000L, 1L).otherwise(0L)
    df.withColumn("__prev_ts", lag(col(tsCol), 1).over(order))
      .withColumn("is_session_start", newSession === 1L)
      .withColumn("session_no",
        sum(newSession).over(
          order.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .drop("__prev_ts")
  }

  /** One row per (key, session): event count, start/end ts, span in
    * milliseconds. The aggregation keys on (key, session_no), which
    * is a refinement of the window partitioning — AQE reuses the
    * existing distribution where possible; at worst this is the one
    * extra narrow shuffle any per-session rollup needs. */
  def sessionSummary(df: DataFrame, keyCol: String, tsCol: String,
      gapSeconds: Long, tieBreak: String): DataFrame =
    assignSessions(df, keyCol, tsCol, gapSeconds, tieBreak)
      .groupBy(col(keyCol), col("session_no"))
      .agg(
        count(lit(1)).as("n_events"),
        min(col(tsCol)).as("session_start"),
        max(col(tsCol)).as("session_end"))
      .withColumn("span_ms",
        unix_millis(col("session_end")) - unix_millis(col("session_start")))
}
