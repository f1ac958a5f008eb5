package graft.ops

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** As-of join semantics: latest-prior match, tie-breaks, tolerance,
  * null-ts rows, and the no-range-join plan shape. */
class TemporalJoinsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private val left = Seq(
    (1L, "u1", ts("2024-01-01 10:00:00")),
    (2L, "u1", ts("2024-01-01 12:00:00")),
    (3L, "u2", ts("2024-01-01 09:00:00")), // before any right row
    (4L, "u3", ts("2024-01-01 10:00:00")), // key with no right rows
    (5L, "u1", null.asInstanceOf[Timestamp]) // null ts → kept, no match
  ).toDF("id", "user", "t")

  private val right = Seq(
    (10L, "u1", ts("2024-01-01 09:30:00"), 1.0),
    (11L, "u1", ts("2024-01-01 10:00:00"), 2.0), // ties left id=1 exactly
    (12L, "u1", ts("2024-01-01 10:00:00"), 3.0), // same ts: larger rid wins
    (13L, "u2", ts("2024-01-01 11:00:00"), 4.0), // after left id=3
    (14L, "u1", null.asInstanceOf[Timestamp], 5.0) // null ts: never matches
  ).toDF("rid", "user", "t", "v")

  private def run(tolUs: Option[Long] = None) =
    TemporalJoins.asOfJoin(left, right, Seq("user"), "t", "t",
        payload = Seq("rid", "v"), tieBreak = "rid", toleranceUs = tolUs)
      .orderBy("id")
      .collect()
      .map(r => (r.getLong(0), Option(r.get(3)).map(_.asInstanceOf[Long])))

  test("latest prior row wins; equal ts matches; ties break to largest id") {
    val got = run()
    // id=1 at 10:00 sees rids 10,11,12 (<=); equal-ts tie → rid 12
    // id=2 at 12:00 sees all three → still rid 12 (latest ts 10:00)
    assert(got.toSeq == Seq(1L -> Some(12L), 2L -> Some(12L),
      3L -> None, 4L -> None, 5L -> None))
  }

  test("tolerance nulls out matches older than the bound") {
    // 30 min tolerance: id=2 (12:00) is 2h after rid 12 (10:00) → null
    val got = run(tolUs = Some(30L * 60 * 1000000))
    assert(got.toSeq == Seq(1L -> Some(12L), 2L -> None,
      3L -> None, 4L -> None, 5L -> None))
  }

  test("left columns pass through unchanged; payload names are checked") {
    val out = TemporalJoins.asOfJoin(left, right, Seq("user"), "t", "t",
      Seq("rid", "v"), "rid")
    assert(out.columns.toSeq == Seq("id", "user", "t", "rid", "v"))
    intercept[IllegalArgumentException] {
      TemporalJoins.asOfJoin(left, right, Seq("user"), "t", "t",
        Seq("user"), "rid") // collides with a left column
    }
  }

  test("plan is window-over-union — no join node, one key exchange") {
    val out = TemporalJoins.asOfJoin(left, right, Seq("user"), "t", "t",
      Seq("rid", "v"), "rid")
    val plan = out.queryExecution.optimizedPlan.toString
    assert(!plan.toLowerCase.contains("join"),
      s"as-of join must not plan a range join:\n$plan")
    assert(plan.contains("Window"), s"expected a window plan:\n$plan")
  }
}
