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

  /** FUNNEL progression: per key, the furthest `steps` stage reached
    * by time order — an event advances the stage only when its type
    * is the NEXT step (a purchase before any view advances nothing:
    * the classic ordered-funnel semantics). Returns
    * (stage, n_users): stage 0 = keys in the universe (`universe`
    * frame if given, else `df`) that never reached step 1 — pass a
    * universe when `df` is a qualifying-events slice of a larger
    * population.
    *
    * The per-key computation is the position-ordered integer fold
    * (the ss6/ts12 discipline — step codes sort by (ts, tie) and
    * fold left; the oracle replicates the same `list_reduce`), so it
    * costs ONE key exchange; non-step events drop before the
    * aggregation so the collected lists hold only funnel-relevant
    * rows; the stage-0 reconciliation joins the distinct-key frame
    * on the same key (reused partitioning). */
  def funnelStages(df: DataFrame, keyCol: String, tsCol: String,
      typeCol: String, tieCol: String, steps: Seq[String],
      universe: Option[DataFrame] = None): DataFrame = {
    require(steps.nonEmpty && steps.distinct == steps,
      s"steps must be non-empty and distinct, got $steps")
    val stepCode = steps.zipWithIndex.foldLeft(lit(0)) {
      case (acc, (s, i)) => when(col(typeCol) === s, lit(i + 1)).otherwise(acc)
    }
    val perKey = df
      .select(col(keyCol).as("user_id"), col(tsCol).as("__ts"),
        col(tieCol).as("__tie"), stepCode.as("__sc"))
      .filter(col("__sc") > 0)
      .groupBy("user_id")
      .agg(sort_array(collect_list(
        struct(col("__ts"), col("__tie"), col("__sc")))).as("__evs"))
      .select(col("user_id"),
        expr("aggregate(__evs, 0, (acc, e) ->" +
          " IF(e.__sc = acc + 1, acc + 1, acc))").as("stage"))
    universe.getOrElse(df).select(col(keyCol).as("user_id")).distinct()
      .join(perKey, Seq("user_id"), "left")
      .select(coalesce(col("stage"), lit(0)).as("stage"))
      .groupBy("stage").agg(count(lit(1)).as("n_users"))
  }

  /** SCD2 state intervals: collapse a per-key state-change log into
    * validity intervals — one row per consecutive run of the same
    * state, [valid_from, valid_to), valid_to null on the current
    * (open) interval. The type-2 slowly-changing-dimension history
    * every warehouse maintains, derived from the raw log in one
    * pass.
    *
    * Scale shape: the run detection (lag), run numbering (running
    * sum), and the post-rollup valid_to (lead over run starts) all
    * partition by the key, so everything rides ONE
    * hashpartitioning(key) exchange — the run rollup keys on
    * (key, run_no), a refinement of that partitioning, and the lead
    * pass over the (already tiny) one-row-per-run frame re-uses it.
    * Same discipline as [[assignSessions]]; `tieCol` totalizes
    * within-key order so run boundaries are deterministic. */
  def stateIntervals(df: DataFrame, keyCol: String, tsCol: String,
      stateCol: String, tieCol: String): DataFrame = {
    val order = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol).asc, col(tieCol).asc)
    val newRun = when(col("__prev").isNull ||
      col("__prev") =!= col(stateCol), 1L).otherwise(0L)
    val runs = df
      .withColumn("__prev", lag(col(stateCol), 1).over(order))
      .withColumn("__run",
        sum(newRun).over(
          order.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col(keyCol), col("__run"))
      .agg(first(col(stateCol)).as("state"),
        min(col(tsCol)).as("valid_from"),
        count(lit(1)).as("n_events"))
    val byRun = Window.partitionBy(col(keyCol)).orderBy(col("__run").asc)
    runs
      .withColumn("valid_to", lead(col("valid_from"), 1).over(byRun))
      .select(col(keyCol), col("__run").as("run_no"), col("state"),
        col("valid_from"), col("valid_to"), col("n_events"))
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
