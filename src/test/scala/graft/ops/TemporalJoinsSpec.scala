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

  private def points = {
    import spark.implicits._
    Seq((1L, ts("2024-01-01 05:59:59")), (2L, ts("2024-01-01 06:00:00")),
      (3L, ts("2024-01-01 11:30:00")), (4L, ts("2024-01-01 18:00:00")),
      (5L, ts("2024-01-01 18:00:01")), (6L, ts("2024-01-03 12:00:00")))
      .toDF("pid", "pt")
  }

  private def intervals = {
    import spark.implicits._
    Seq((10L, ts("2024-01-01 06:00:00"), ts("2024-01-01 18:00:00")),
      // a long interval spanning many buckets — must still match
      // each contained point exactly once
      (20L, ts("2024-01-01 00:00:00"), ts("2024-01-02 23:59:59")))
      .toDF("wid", "lo", "hi")
  }

  test("rangeJoin: containment with inclusive ends, exactly-once matches") {
    val got = TemporalJoins.rangeJoin(points, "pt", intervals,
      "lo", "hi", bucketSeconds = 3600)
      .select("pid", "wid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // window 10: inclusive [06:00, 18:00] — 2, 3, 4 in; 1, 5 out
    // window 20: everything on Jan 1 (1-5); 6 is Jan 3, matches none
    assert(got == Set((2L, 10L), (3L, 10L), (4L, 10L),
      (1L, 20L), (2L, 20L), (3L, 20L), (4L, 20L), (5L, 20L)))
  }

  test("rangeJoin equals the naive theta join for any bucket width") {
    val naive = points.crossJoin(intervals)
      .filter(col("pt") >= col("lo") && col("pt") <= col("hi"))
      .select("pid", "wid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    for (w <- Seq(1L, 60L, 3600L, 86400L, 7L * 86400L)) {
      val got = TemporalJoins.rangeJoin(points, "pt", intervals,
        "lo", "hi", bucketSeconds = w)
        .select("pid", "wid").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == naive, s"bucketSeconds=$w")
    }
  }

  test("rangeJoin plans an equi-join on the bucket — never a nested loop") {
    val plan = TemporalJoins.rangeJoin(points, "pt", intervals,
      "lo", "hi", bucketSeconds = 3600)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop") && !plan.contains("Cartesian"),
      s"range join degenerated to a theta join:\n$plan")
  }
}
