package graft.catalog

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.model.{SensorSchema, SensorSchemas}
import graft.sources.{CowTable, ExportImport, VersionedTable}

/** The obs-date rollup tables `EDDObsDates` / `EDDObsDatesScns`
  * (eodatadownsensor.py:53-68, built by create_obs_date_records
  * :560-603) as two derived CowTables:
  *
  * - obsDates:    (SensorID, PlatformID, ObsDate, OverviewCreated,
  *                 NeedUpdate, Invalid)
  * - obsDateScns: (SensorID, PlatformID, ObsDate, Scene_PID)
  *
  * The reference builds these with per-(platform,date) queries in a
  * loop, generic over any sensor via per-sensor hooks
  * (`find_unique_platforms` / `get_scn_pids_for_date`,
  * eodatadownsensor.py:560-603); here the [[SensorSchema]] descriptor
  * carries the same information (platform column, obs-date
  * expression), and one grouped pass over the scene table derives
  * both tables. refresh() upserts incrementally (new dates appear,
  * existing rows' scene fan-out is replaced, processed flags are
  * preserved).
  */
class ObsDateCatalog(val sensor: SensorSchema,
                     datesTable: VersionedTable, scnsTable: VersionedTable,
                     spark: SparkSession) {

  val sensorId: String = sensor.sensor

  def obsDates: DataFrame = datesTable.read()
  def obsDateScns: DataFrame = scnsTable.read()

  /** Derive/refresh both tables from the scene table, optionally
    * restricted to an inclusive obs-date window (the reference's
    * start/end args). Sensors without a platform column raise, exactly
    * like the reference's unimplemented `find_unique_platforms`
    * (eodatadownGEDIsensor.py:1020-1021).
    */
  def refresh(scenes: DataFrame, startIncl: Option[String] = None,
              endIncl: Option[String] = None): Unit = {
    val platformCol = sensor.platform.getOrElse(throw
      new UnsupportedOperationException(
        s"sensor ${sensor.sensor} has no platform column — obs-date " +
          "rollups are not supported (reference raises the same)"))
    val inWindow = Seq(
      startIncl.map(s => sensor.obsDate >= lit(s)),
      endIncl.map(e => sensor.obsDate <= lit(e))
    ).flatten.foldLeft(!col("Invalid"))(_ && _)
    val fanout = scenes.filter(inWindow)
      .select(lit(sensorId).as("SensorID"),
        col(platformCol).as("PlatformID"),
        sensor.obsDate.as("ObsDate"),
        col("PID").as("Scene_PID"))
    // group-keyed upsert: replaces the fan-out of every (platform,
    // date) present in the new derivation, keeps rows of dates that
    // disappeared — and on a date-partitioned PartitionedCowTable only
    // the touched date partitions are rewritten (untouched dirs are
    // carried by reference), instead of the full-table overwrite this
    // used to do
    scnsTable.upsert(fanout, Seq("SensorID", "PlatformID", "ObsDate"))
    val dates = fanout
      .select("SensorID", "PlatformID", "ObsDate").distinct()
      .withColumn("OverviewCreated", lit(false))
      .withColumn("NeedUpdate", lit(true))
      .withColumn("Invalid", lit(false))
      .withColumn("Overviews", lit(null).cast("string"))
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

  /** Mark a date processed (overview built; .py:676-694 write-back
    * sets OverviewCreated AND stores the overview-image paths into the
    * Overviews JSONB).
    */
  def markProcessed(platform: String, date: String,
                    overviewsJson: Option[String] = None): Unit =
    datesTable.updateWhere(
      col("PlatformID") === platform && col("ObsDate") === lit(date),
      Map("OverviewCreated" -> lit(true), "NeedUpdate" -> lit(false)) ++
        overviewsJson.map(j => "Overviews" -> lit(j)))

  /** update_overview_file_paths (eodatadownsensor.py:838-877): rewrite
    * path prefixes inside the Overviews JSON (archive moves, imports).
    */
  def updateOverviewPathPrefix(from: String, to: String): Unit =
    datesTable.updateWhere(col("Overviews").isNotNull,
      Map("Overviews" -> regexp_replace(col("Overviews"),
        java.util.regex.Pattern.quote(from),
        java.util.regex.Matcher.quoteReplacement(to))))

  /** export_obsdate_db_to_json (eodatadownsensor.py:794-836). */
  def exportJson(datesPath: String, scnsPath: String): Unit = {
    ExportImport.exportJson(obsDates, datesPath)
    ExportImport.exportJson(obsDateScns, scnsPath)
  }

  /** import_obsdates_db (eodatadownsensor.py:838-900): JSON → tables,
    * rewriting path prefixes inside the Overviews JSON (the reference
    * runs update_overview_file_paths on every imported row).
    */
  def importJson(datesPath: String, scnsPath: String,
                 pathRewrites: Map[String, String] = Map.empty): Unit = {
    val dates = ExportImport.importJson(spark, datesPath, ObsDateCatalog.datesSchema)
    val rewritten = pathRewrites.foldLeft(dates) { case (d, (from, to)) =>
      d.withColumn("Overviews", regexp_replace(col("Overviews"),
        java.util.regex.Pattern.quote(from),
        java.util.regex.Matcher.quoteReplacement(to)))
    }
    datesTable.overwrite(rewritten)
    scnsTable.overwrite(
      ExportImport.importJson(spark, scnsPath, ObsDateCatalog.scnsSchema))
  }
}

object ObsDateCatalog {
  def apply(sensor: SensorSchema, root: String)(implicit spark: SparkSession): ObsDateCatalog =
    new ObsDateCatalog(sensor, new CowTable(s"$root/obs_dates", spark),
      new CowTable(s"$root/obs_date_scns", spark), spark)

  /** Landsat-named convenience kept for callers addressing sensors by
    * id string (resolved against [[SensorSchemas.all]]).
    */
  def apply(sensorId: String, root: String)(implicit spark: SparkSession): ObsDateCatalog =
    apply(SensorSchemas.all.find(_.sensor == sensorId).getOrElse(
      throw new IllegalArgumentException(
        s"unknown sensor '$sensorId' (known: " +
          s"${SensorSchemas.all.map(_.sensor).mkString(", ")})")), root)

  /** EDDObsDates schema (eodatadownsensor.py:53-61). */
  val datesSchema: StructType = StructType(Seq(
    StructField("SensorID", StringType), StructField("PlatformID", StringType),
    StructField("ObsDate", DateType), StructField("OverviewCreated", BooleanType),
    StructField("NeedUpdate", BooleanType), StructField("Invalid", BooleanType),
    StructField("Overviews", StringType)))

  /** EDDObsDatesScns schema (eodatadownsensor.py:63-68). */
  val scnsSchema: StructType = StructType(Seq(
    StructField("SensorID", StringType), StructField("PlatformID", StringType),
    StructField("ObsDate", DateType), StructField("Scene_PID", LongType)))
}
