package graft.catalog

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.PluginResult
import graft.sources.CowTable

/** The per-sensor plugin-result table (composite key Scene_PID ×
  * PlugInName; eodatadownlandsatgoogsensor.py:109-119) and its query
  * family (run_usr_analysis bookkeeping, :1679-1814; summary counters
  * :3053-3105).
  */
class PluginCatalog(table: graft.sources.VersionedTable, spark: SparkSession) {

  def results: DataFrame = table.read()

  def typedResults: Dataset[PluginResult] = {
    import spark.implicits._
    table.read().as[PluginResult]
  }

  /** get_scnlist_usr_analysis (.py:1679-1727): scenes ready for a
    * plugin = eligible scenes with no COMPLETED result row for that
    * plugin (anti-join on the composite key).
    */
  def scenesNeedingPlugin(eligibleScenes: DataFrame, plugin: String): DataFrame = {
    val done = completedFor(plugin).select(col("Scene_PID").as("PID"))
    eligibleScenes.join(done, Seq("PID"), "left_anti")
      .orderBy("Date_Acquired", "PID").select("PID")
  }

  private def completedFor(plugin: String): DataFrame =
    if (!table.exists) spark.emptyDataFrame
      .withColumn("Scene_PID", lit(null).cast("long"))
    else results.filter(col("PlugInName") === plugin && col("Completed"))

  /** Upsert one batch of plugin outcomes (composite-key J7). */
  def upsert(batch: DataFrame): Unit =
    table.upsert(batch, Seq("Scene_PID", "PlugInName"))

  /** J5: all plugin rows for a scene, keyed map shape
    * (.py:1732-1740 — dict keyed by PlugInName).
    */
  def resultsForScene(pid: Long): DataFrame =
    results.filter(col("Scene_PID") === pid).orderBy("PlugInName")

  /** reset_usr_analysis (.py:1816-1867): delete result rows so the
    * plugin re-runs.
    */
  def reset(plugin: String, pids: Option[Seq[Long]] = None): Unit =
    table.deleteWhere(col("PlugInName") === plugin &&
      pids.map(p => col("Scene_PID").isin(p.map(Long.box): _*))
        .getOrElse(lit(true)))

  /** Per-plugin summary counters (.py:3053-3105) in one pass. */
  def summary(): DataFrame =
    results.groupBy("PlugInName").agg(
      count(lit(1)).as("n_results"),
      sum(when(col("Completed"), 1L).otherwise(0L)).as("n_completed"),
      sum(when(col("Success"), 1L).otherwise(0L)).as("n_success"),
      sum(when(col("Error_Occurred"), 1L).otherwise(0L)).as("n_error"),
      round(avg(unix_timestamp(col("End_Date")) -
        unix_timestamp(col("Start_Date"))), 2).as("avg_duration_s"))

  def mkResult(pid: Long, plugin: String, success: Boolean,
               start: Timestamp, end: Timestamp,
               info: Option[String] = None): PluginResult =
    PluginResult(pid, plugin, Completed = true, Success = success,
      Outputs = info.isDefined, Error_Occurred = !success,
      Start_Date = Some(start), End_Date = Some(end), ExtendedInfo = info)
}

object PluginCatalog {
  def apply(root: String)(implicit spark: SparkSession): PluginCatalog =
    new PluginCatalog(new CowTable(root, spark), spark)
}
