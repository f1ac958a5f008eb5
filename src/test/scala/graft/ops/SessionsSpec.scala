package graft.ops

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SessionsSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  private def fixture = {
    import spark.implicits._
    Seq(
      // user 1: two sessions split by a 31-minute gap
      (1L, 1L, ts("2024-01-01 10:00:00")),
      (1L, 2L, ts("2024-01-01 10:10:00")),
      (1L, 3L, ts("2024-01-01 10:41:00")),
      // user 2: one event at exactly the 30-minute gap (inclusive —
      // NOT a new session; the boundary is strict >)
      (2L, 4L, ts("2024-01-01 09:00:00")),
      (2L, 5L, ts("2024-01-01 09:30:00")),
      // user 2: same-ts tie, ordered by event_id
      (2L, 6L, ts("2024-01-01 09:30:00"))
    ).toDF("user_id", "event_id", "ts")
  }

  test("gap strictly greater than the threshold starts a new session") {
    val got = Sessions.assignSessions(fixture, "user_id", "ts",
        gapSeconds = 1800, tieBreak = "event_id")
      .select("event_id", "session_no")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got(1L) == 1 && got(2L) == 1)
    assert(got(3L) == 2) // 31 min > 30 min
    assert(got(4L) == 1 && got(5L) == 1 && got(6L) == 1) // 30 min exactly
  }

  test("summary rolls up counts and spans per session") {
    val got = Sessions.sessionSummary(fixture, "user_id", "ts",
        gapSeconds = 1800, tieBreak = "event_id")
      .orderBy("user_id", "session_no")
      .collect()
    assert(got.length == 3)
    val u1s1 = got(0)
    assert(u1s1.getAs[Long]("n_events") == 2)
    assert(u1s1.getAs[Long]("span_ms") == 10 * 60 * 1000L)
    val u1s2 = got(1)
    assert(u1s2.getAs[Long]("n_events") == 1)
    assert(u1s2.getAs[Long]("span_ms") == 0L)
    val u2s1 = got(2)
    assert(u2s1.getAs[Long]("n_events") == 3)
    assert(u2s1.getAs[Long]("span_ms") == 30 * 60 * 1000L)
  }

  test("funnelStages: order matters, non-step noise ignored, universe fills stage 0") {
    import spark.implicits._
    import java.sql.Timestamp
    def t(m: Int) = Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")
    val ev = Seq(
      // user 1: A then B then C in order -> stage 3
      (1L, t(1), "A", 1L), (1L, t(2), "B", 2L), (1L, t(3), "C", 3L),
      // user 2: B before A -> only the later A counts -> stage 1
      (2L, t(1), "B", 4L), (2L, t(2), "A", 5L),
      // user 3: A then C (skips B) -> stage 1, noise ignored
      (3L, t(1), "A", 6L), (3L, t(2), "noise", 7L), (3L, t(3), "C", 8L),
      // user 4: same-ts tie broken by event id: A(id 9) before B(id 10)
      (4L, t(1), "A", 9L), (4L, t(1), "B", 10L)
    ).toDF("user_id", "ts", "event_type", "event_id")
    val uni = (1L to 6L).toDF("user_id") // 5,6 never act -> stage 0
    val got = Sessions.funnelStages(ev, "user_id", "ts", "event_type",
        "event_id", Seq("A", "B", "C"), universe = Some(uni))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(got == Map(0 -> 2L, 1 -> 2L, 2 -> 1L, 3 -> 1L), got)
  }

  test("stateIntervals: runs collapse, open interval has null valid_to") {
    val df = {
      import spark.implicits._
      Seq(
        (1L, 1L, ts("2024-01-01 10:00:00"), "trial"),
        (1L, 2L, ts("2024-01-02 10:00:00"), "trial"),   // same run
        (1L, 3L, ts("2024-01-05 10:00:00"), "paid"),    // run 2
        (1L, 4L, ts("2024-01-09 10:00:00"), "trial"),   // back → run 3
        (2L, 5L, ts("2024-02-01 09:00:00"), "paid")
      ).toDF("user_id", "event_id", "ts", "state")
    }
    val got = Sessions.stateIntervals(df, "user_id", "ts", "state",
        "event_id")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getTimestamp(3).toString, Option(r.getTimestamp(4)).map(_.toString),
        r.getLong(5)))
      .toSet
    val want = Set(
      (1L, 1L, "trial", "2024-01-01 10:00:00.0",
        Some("2024-01-05 10:00:00.0"), 2L),
      (1L, 2L, "paid", "2024-01-05 10:00:00.0",
        Some("2024-01-09 10:00:00.0"), 1L),
      (1L, 3L, "trial", "2024-01-09 10:00:00.0", None, 1L),
      (2L, 1L, "paid", "2024-02-01 09:00:00.0", None, 1L))
    assert(got == want, got)
  }

  test("stateIntervals plan: run detect, rollup, and valid_to share one key exchange") {
    import spark.implicits._
    val df = Seq((1L, 1L, ts("2024-01-01 10:00:00"), "a"))
      .toDF("user_id", "event_id", "ts", "state")
    val plan = Sessions.stateIntervals(df, "user_id", "ts", "state",
        "event_id")
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r
      .findAllMatchIn(plan).length
    assert(exchanges == 1, s"expected one exchange, plan:\n$plan")
  }

  test("one exchange feeds both window passes (no extra shuffle)") {
    val plan = Sessions.assignSessions(fixture, "user_id", "ts",
        gapSeconds = 1800, tieBreak = "event_id")
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r
      .findAllMatchIn(plan).length
    assert(exchanges == 1, s"expected one exchange, plan:\n$plan")
  }
}
