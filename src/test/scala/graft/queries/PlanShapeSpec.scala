package graft.queries

import scala.collection.mutable

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.{ExplainMode, SparkPlan}
import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}

import graft.SparkSpec

/** PLAN-SHAPE REGRESSION PINS for the battery's most expensive gates
  * (round-13 verdict item 4): a lost broadcast, an un-pushed filter,
  * or a join degrading to a nested loop would surface only as
  * wall-time noise in the bench JSON — these specs make the shape a
  * hard failure instead. Each target's RETURNED frame (the final
  * composition the gate hashes) is planned at sf0.001 and asserted on:
  *
  *  - no CartesianProduct / BroadcastNestedLoopJoin anywhere EXCEPT
  *    against a provably-1-row side (a global aggregate: the
  *    broadcast stats/anchors frames the round-13 audit contracted —
  *    |rows|×1 is a map, not a loop join). The brute-force oracles
  *    (ss8/ss22's exact side) are deliberately NOT in this list;
  *  - ss21's stored-pair probe keeps its pinned joins: the m-byte
  *    code re-attach stays a ShuffledHashJoin (never a corpus
  *    broadcast, never a sort-merge over floats) and the |Q|-row ADC
  *    table stays broadcast;
  *  - u12's zone-pruned read keeps its residual predicate PUSHED to
  *    the parquet scan (row-group pruning inside kept files).
  *
  * Red-on-mutation proven by hand (PLANS.md round 14): removing the
  * shuffle_hash hint in ivfPqTopKStored flips ss21's assertion. */
class PlanShapeSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  private val frames = mutable.Map.empty[String, DataFrame]
  private def frameOf(name: String): DataFrame = {
    require(Catalog.queries.contains(name),
      s"PlanShapeSpec target $name is not in the catalog — re-point the pin")
    frames.getOrElseUpdate(name, Catalog.queries(name)(spark, dir))
  }

  /** True when the subtree is a CONTRACTED loop-join side: it
    * provably yields ONE row (a global aggregate — the broadcast
    * stats frames) or reads NO stored data at all (every leaf a
    * local relation/range — the constant reference models, e.g.
    * langId's stopword tables). A side that scans a table fails
    * both tests, so corpus×corpus loops still go red.
    * ReusedExchangeExec is a LEAF whose original subtree lives
    * elsewhere; chase its child explicitly. */
  private def contractedSide(p: SparkPlan): Boolean = {
    def nodes(q: SparkPlan): Seq[SparkPlan] = q +: (q.children ++ (q match {
      case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec =>
        Seq(r.child)
      case _ => Nil
    })).flatMap(nodes)
    val ns = nodes(p)
    val oneRowAgg = ns.exists {
      case a: BaseAggregateExec => a.groupingExpressions.isEmpty
      case _ => false
    }
    val leaves = ns.filter(_.children.isEmpty).filterNot(
      _.isInstanceOf[org.apache.spark.sql.execution.exchange.ReusedExchangeExec])
    val allLocal = leaves.nonEmpty && leaves.forall {
      case _: org.apache.spark.sql.execution.LocalTableScanExec => true
      case _: org.apache.spark.sql.execution.RangeExec => true
      case _ => false
    }
    oneRowAgg || allLocal
  }

  private val noLoopTargets = Seq(
    "g3_incremental_triangles", "st2_stream_cluster_parity",
    "st11_stream_graph_maintenance", "d12_incremental_clusters",
    "ss21_ivfpq_stored_probe", "tp11_multilingual_curation",
    "tp12_dsir_selection", "ts27_dsir_weights",
    "ts28_bm25_reindex_probe", "ts29_dsir_char_weights",
    "u12_zonemap_pruned_read", "u14_manifest_pruned_read")

  test("top-cost gates: no loop join except against a 1-row stats frame") {
    noLoopTargets.foreach { n =>
      val plan = frameOf(n).queryExecution.sparkPlan
      val bad = plan.collect {
        case j: BroadcastNestedLoopJoinExec
            if !contractedSide(j.left) && !contractedSide(j.right) =>
          j.nodeName
        case c: CartesianProductExec
            if !contractedSide(c.left) && !contractedSide(c.right) =>
          c.nodeName
      }
      assert(bad.isEmpty,
        s"$n plans ${bad.mkString(",")} with no contracted side:\n" +
          plan.toString.take(4000))
    }
  }

  test("ss21 stored-pair probe: code re-attach is SHUFFLE_HASH, ADC table is broadcast") {
    val p = frameOf("ss21_ivfpq_stored_probe").queryExecution
      .explainString(ExplainMode.fromString("formatted"))
    assert(p.contains("ShuffledHashJoin"),
      s"the m-byte code re-attach lost its shuffle-hash pin:\n${p.take(4000)}")
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastExchange"),
      s"the |Q|-row ADC table is no longer broadcast:\n${p.take(4000)}")
  }

  test("u12 zone-pruned read: the residual range predicate reaches the parquet scan") {
    val p = frameOf("u12_zonemap_pruned_read").queryExecution
      .explainString(ExplainMode.fromString("formatted"))
    val pushed = "PushedFilters: \\[[^\\]]".r
    assert(pushed.findFirstIn(p).isDefined,
      s"no non-empty PushedFilters on the pruned scan:\n${p.take(4000)}")
  }
}
