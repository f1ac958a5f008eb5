package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.queries.Catalog

/** a9_rollup_totals + w6_running_metrics: semantics on hand cases and
  * the plan properties the gates' Scaladoc promises (one Expand + one
  * aggregate exchange for ROLLUP; one exchange + ONE Window operator
  * for the two stacked frames). */
class RollupWindowSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("rollup emits leaf rows, per-status subtotals, and grand total") {
    import spark.implicits._
    val df = Seq(("O", 2024L, 10.0), ("O", 2024L, 5.0), ("O", 2025L, 1.0),
      ("F", 2024L, 2.0)).toDF("st", "yr", "v")
    val got = df.rollup($"st", $"yr")
      .agg(sum($"v").as("s"))
      .collect()
      .map(r => (Option(r.get(0)), Option(r.get(1)), r.getDouble(2)))
      .toSet
    val want = Set(
      (Some("O"), Some(2024L), 15.0), (Some("O"), Some(2025L), 1.0),
      (Some("F"), Some(2024L), 2.0),
      (Some("O"), None, 16.0), (Some("F"), None, 2.0),
      (None, None, 18.0))
    assert(got == want, got)
  }

  test("a9 plan: one Expand, one aggregate exchange, scan read once") {
    val plan = Catalog.queries("a9_rollup_totals")(spark, sf)
      .queryExecution.executedPlan.toString
    assert("(?i)expand".r.findAllMatchIn(plan).length == 1, plan)
    assert("Exchange hashpartitioning".r.findAllMatchIn(plan).length == 1,
      plan)
    assert("Scan parquet".r.findAllMatchIn(plan).length == 1, plan)
  }

  test("running sum and 3-row moving average on a hand case") {
    import spark.implicits._
    val df = Seq((1L, 1L, 1.0), (1L, 2L, 2.0), (1L, 3L, 4.0),
      (1L, 4L, 8.0)).toDF("u", "i", "v")
    val w = Window.partitionBy($"u").orderBy($"i")
    val cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val mov = w.rowsBetween(-2, Window.currentRow)
    val got = df.select($"i", sum($"v").over(cum).as("c"),
        avg($"v").over(mov).as("m"))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
      .sortBy(_._1)
    val want = Seq(
      (1L, 1.0, 1.0), (2L, 3.0, 1.5),
      (3L, 7.0, 7.0 / 3.0), (4L, 15.0, 14.0 / 3.0))
    assert(got.length == want.length, got.toSeq)
    got.zip(want).foreach { case ((i, c, m), (wi, wc, wm)) =>
      assert(i == wi && math.abs(c - wc) < 1e-12 && math.abs(m - wm) < 1e-12,
        s"row $i: got ($c, $m) want ($wc, $wm)")
    }
  }

  test("w6 plan: both frames ride one exchange and ONE Window operator") {
    val plan = Catalog.queries("w6_running_metrics")(spark, sf)
      .queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning".r.findAllMatchIn(plan).length == 1,
      plan)
    // one Window node evaluates both frames; the trailing global sort
    // is the gate's output ordering, not a second window pass
    assert("(?m)^\\s*[+:*]?-? ?Window ".r.findAllMatchIn(plan).length <= 1 &&
      "Window".r.findAllMatchIn(plan).nonEmpty, plan)
  }
}
