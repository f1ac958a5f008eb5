package graft

/** tp6's production-shape contract: the consuming pipeline reads the
  * COMMITTED pair/cluster artifacts — the LSH mine machinery must not
  * appear anywhere in its plan (the self-contained twin tp4 is the
  * positive control carrying it). */
class StoredArtifactSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  test("tp6 consumes stored artifacts: zero mine subtrees in the final plan") {
    // building tp6 runs the mine + CC eagerly and commits both
    // artifacts through the versioned store; the RETURNED frame is
    // the consuming pipeline only
    val tp6 = queries.Catalog.queries("tp6_curation_v3")(spark, sf)
    val plan6 = tp6.queryExecution.optimizedPlan.toString
    // positive control for the marker: a pure mine plan (d2) carries
    // the band machinery in its lazy plan. (tp4 is NOT a valid
    // control — its duplicateClusters stage is eager, so its final
    // frame also reads staged labels; what tp4 re-pays per run and
    // tp6 does not is the mine+fixpoint at frame CONSTRUCTION.)
    val d2 = queries.Catalog.queries("d2_minhash_lsh_pairs")(spark, sf)
    assert(d2.queryExecution.optimizedPlan.toString.contains("band_hash"),
      "control failed: d2's plan should carry the LSH banding")
    assert(!plan6.contains("band_hash"),
      "tp6's consuming plan must not re-mine\n" + plan6.take(1500))
    // and the labels really come from the committed store files (two
    // consumers — keep-best and the leakage split — share them)
    val files = tp6.queryExecution.analyzed.collect {
      case lr: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        lr.relation match {
          case h: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
            h.location.rootPaths.map(_.toString).mkString(",")
          case _ => ""
        }
    }.mkString("\n")
    assert(files.contains("dup_clusters"), files)
  }
}
