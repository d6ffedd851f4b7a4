package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each entry in [[queries]] demonstrates one operator family from
  * SURVEY.md §2 over the driver's synthetic tables; [[oracleSql]] holds
  * the DuckDB-equivalent SQL for the hash-compare correctness gate.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q03_revenue_by_nation")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.RelationalQueries.queries ++
      graft.queries.GeoQueries.queries ++
      graft.queries.TextQueries.queries ++
      graft.queries.VectorQueries.queries ++
      graft.queries.CoverageQueries.queries ++
      graft.queries.MultimodalQueries.queries ++
      graft.queries.StreamingQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    graft.queries.RelationalQueries.oracleSql ++
      graft.queries.GeoQueries.oracleSql ++
      graft.queries.TextQueries.oracleSql ++
      graft.queries.VectorQueries.oracleSql ++
      graft.queries.CoverageQueries.oracleSql ++
      graft.queries.MultimodalQueries.oracleSql ++
      graft.queries.StreamingQueries.oracleSql
}
