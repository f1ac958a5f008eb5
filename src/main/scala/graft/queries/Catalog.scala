package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verifiable query: the Spark plan plus (when SQL-expressible) the
  * ANSI-SQL oracle the driver runs in DuckDB over the same parquet dir.
  *
  * Every query must be fully deterministic: totally-ordered output
  * (unique trailing sort key) and exact-typed aggregates (decimal sums,
  * bigint counts) so a hash compare never trips on float-summation order
  * — Spark's partial aggregation order is nondeterministic across runs,
  * so raw double sums are not reproducible even Spark-vs-Spark.
  */
final case class QueryDef(
    name: String,
    doc: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object Catalog {

  /** All registered query groups, in SURVEY §2 order. */
  def defs: Seq[QueryDef] =
    RelationalQueries.defs ++ OpsQueries.defs ++ FunctionQueries.defs ++
      SourceQueries.defs ++ PipelineQueries.defs

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    defs.map(d => d.name -> d.fn).toMap

  def oracleSql: Map[String, String] =
    defs.flatMap(d => d.oracle.map(d.name -> _)).toMap
}
