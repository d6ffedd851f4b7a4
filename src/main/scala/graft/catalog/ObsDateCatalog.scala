package graft.catalog

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.CowTable

/** The obs-date rollup tables `EDDObsDates` / `EDDObsDatesScns`
  * (eodatadownsensor.py:53-68, built by create_obs_date_records
  * :560-603) as two derived CowTables:
  *
  * - obsDates:    (SensorID, PlatformID, ObsDate, OverviewCreated,
  *                 NeedUpdate, Invalid)
  * - obsDateScns: (SensorID, PlatformID, ObsDate, Scene_PID)
  *
  * The reference builds these with per-(platform,date) queries in a
  * loop; here one grouped pass over the scene table derives both, and
  * refresh() upserts incrementally (new dates appear, existing rows'
  * scene fan-out is replaced, processed flags are preserved).
  */
class ObsDateCatalog(val sensorId: String,
                     datesTable: CowTable, scnsTable: CowTable,
                     spark: SparkSession) {

  def obsDates: DataFrame = datesTable.read()
  def obsDateScns: DataFrame = scnsTable.read()

  /** Derive/refresh both tables from the scene table. */
  def refresh(scenes: DataFrame): Unit = {
    val fanout = scenes.filter(!col("Invalid"))
      .select(lit(sensorId).as("SensorID"),
        col("Spacecraft_ID").as("PlatformID"),
        col("Date_Acquired").as("ObsDate"),
        col("PID").as("Scene_PID"))
    if (!scnsTable.exists) scnsTable.overwrite(fanout)
    else {
      // replace the fan-out of every (platform, date) present in the
      // new derivation; dates that disappeared keep their old rows
      scnsTable.overwrite(
        scnsTable.read()
          .join(fanout.select("SensorID", "PlatformID", "ObsDate").distinct(),
            Seq("SensorID", "PlatformID", "ObsDate"), "left_anti")
          .unionByName(fanout))
    }
    val dates = fanout
      .select("SensorID", "PlatformID", "ObsDate").distinct()
      .withColumn("OverviewCreated", lit(false))
      .withColumn("NeedUpdate", lit(true))
      .withColumn("Invalid", lit(false))
    if (!datesTable.exists) datesTable.overwrite(dates)
    else
      // keep existing rows (their processed flags survive), add new dates
      datesTable.append(
        dates.join(datesTable.read(),
          Seq("SensorID", "PlatformID", "ObsDate"), "left_anti"))
  }

  /** get_lst_obsdates_need_processing (eodatadownsensor.py:620-640). */
  def needProcessing(): DataFrame =
    obsDates.filter(!col("OverviewCreated") && !col("Invalid"))
      .orderBy("PlatformID", "ObsDate")

  /** get_obs_scns (eodatadownsensor.py:660-669): the J4 equi-join. */
  def scenesFor(platform: String, date: String): DataFrame =
    obsDateScns.filter(col("PlatformID") === platform &&
      col("ObsDate") === lit(date)).orderBy("Scene_PID")

  /** Strict obs-date range (F3 — open bounds, eodatadownsensor.py:720-792). */
  def datesInRangeStrict(startExcl: String, endExcl: String): DataFrame =
    obsDates.filter(col("ObsDate") > lit(startExcl) &&
      col("ObsDate") < lit(endExcl)).orderBy("PlatformID", "ObsDate")

  /** Mark a date processed (overview built; .py:676-694 write-back). */
  def markProcessed(platform: String, date: String): Unit =
    datesTable.updateWhere(
      col("PlatformID") === platform && col("ObsDate") === lit(date),
      Map("OverviewCreated" -> lit(true), "NeedUpdate" -> lit(false)))
}

object ObsDateCatalog {
  def apply(sensorId: String, root: String)(implicit spark: SparkSession): ObsDateCatalog =
    new ObsDateCatalog(sensorId, new CowTable(s"$root/obs_dates", spark),
      new CowTable(s"$root/obs_date_scns", spark), spark)
}
