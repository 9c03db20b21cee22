package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Queries live in graft.queries.* (one object per domain), each as a
  * QueryDef pairing the Spark implementation with its DuckDB oracle SQL.
  */
object SparkEntry {

  /** Every declared query, keyed by name. */
  def allDefs: Seq[QueryDef] = {
    val defs =
      RelationalQueries.defs ++ ScalarQueries.defs ++ ExtendedQueries.defs ++
        TextQueries.defs ++ VectorQueries.defs ++ EventQueries.defs ++
        PipelineQueries.defs ++ ExportQueries.defs
    // a repeated name would silently shadow one (query, oracle) pair in
    // the maps below — fail loudly instead
    val dups = defs.groupBy(_.name).filter(_._2.size > 1).keys
    require(dups.isEmpty, s"duplicate query names: ${dups.mkString(", ")}")
    defs
  }

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q_a1_top_parts")(spark, "/root/testdata/sf0.001")

  /** One per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allDefs.map(d => d.name -> d.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    allDefs.flatMap(d => d.oracle.map(d.name -> _)).toMap
}
