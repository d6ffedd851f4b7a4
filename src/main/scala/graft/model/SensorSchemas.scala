package graft.model

import java.sql.{Date, Timestamp}

import org.apache.spark.sql.{Column, Encoders}
import org.apache.spark.sql.functions.{col, to_date}
import org.apache.spark.sql.types.StructType

/** Per-sensor catalogue rows — the five distinct tables the reference
  * declares (one SQLAlchemy model per sensor module, ~90% shared
  * columns, each with its own identity/metadata block). The reference
  * repeats the shared block five times; here the STATE MACHINE columns
  * (Downloaded/ARD/DCLoaded flags + timestamps, Archived, Invalid,
  * ExtendedInfo, bbox, Remote_URL, Total_Size, Query_Date) are
  * identical by construction, and each sensor contributes its typed
  * identity/metadata columns — as REAL columns, not JSON, so parquet
  * pushdown and pruning work on exactly the fields users filter
  * (orbit, incidence angle, MGRS tile, product/version).
  *
  * [[Scene]] remains the Landsat-canonical row (reference
  * eodatadownlandsatgoogsensor.py:69-106); the variants below mirror:
  *  - Sentinel-1 ASF:  eodatadownsentinel1asf.py:67-116
  *  - Sentinel-2 GOOG: eodatadownsentinel2googsensor.py:66-98
  *  - GEDI:            eodatadownGEDIsensor.py:61-96
  *  - ICESAT2:         eodatadownICESAT2sensor.py:61-105
  */
final case class Sentinel1Scene(
    PID: Long,
    Scene_ID: String,
    Product_Name: String,
    Product_File_ID: String,
    ABS_Orbit: Option[Int],
    Rel_Orbit: Option[Int],
    Flight_Direction: Option[String],
    Incidence_Angle: Option[Double],
    Look_Direction: Option[String],
    Platform: Option[String],
    Polarization: Option[String],
    Acquisition_Date: Timestamp,
    BeginPosition: Option[Timestamp],
    EndPosition: Option[Timestamp],
    North_Lat: Double,
    South_Lat: Double,
    East_Lon: Double,
    West_Lon: Double,
    Remote_URL: Option[String],
    Remote_FileName: Option[String],
    Remote_URL_MD5: Option[String],
    Total_Size: Option[Long],
    Query_Date: Timestamp,
    Download_Start_Date: Option[Timestamp],
    Download_End_Date: Option[Timestamp],
    Downloaded: Boolean,
    ARDProduct_Start_Date: Option[Timestamp],
    ARDProduct_End_Date: Option[Timestamp],
    ARDProduct: Boolean,
    DCLoaded: Boolean,
    Invalid: Boolean,
    Archived: Boolean,
    ExtendedInfo: Option[String])

final case class Sentinel2Scene(
    PID: Long,
    Granule_ID: String,
    Product_ID: String,
    Platform_ID: String,
    Datatake_Identifier: Option[String],
    Mgrs_Tile: Option[String],
    Sensing_Time: Timestamp,
    Geometric_Quality_Flag: Option[String],
    Generation_Time: Timestamp,
    Cloud_Cover: Double,
    North_Lat: Double,
    South_Lat: Double,
    East_Lon: Double,
    West_Lon: Double,
    Total_Size: Option[Long],
    Remote_URL: String,
    Query_Date: Timestamp,
    Download_Start_Date: Option[Timestamp],
    Download_End_Date: Option[Timestamp],
    Downloaded: Boolean,
    ARDProduct_Start_Date: Option[Timestamp],
    ARDProduct_End_Date: Option[Timestamp],
    ARDProduct: Boolean,
    DCLoaded: Boolean,
    Invalid: Boolean,
    Archived: Boolean,
    ExtendedInfo: Option[String])

final case class GediScene(
    PID: Long,
    Product_ID: String,
    FileName: String,
    Date_Acquired: Date,
    Time_Acquired: Option[Timestamp],
    Product: String,
    Version: String,
    North_Lat: Option[Double],
    South_Lat: Option[Double],
    East_Lon: Option[Double],
    West_Lon: Option[Double],
    Total_Size: Option[Long],
    File_MD5: Option[String],
    Remote_URL: String,
    Query_Date: Timestamp,
    Download_Start_Date: Option[Timestamp],
    Download_End_Date: Option[Timestamp],
    Downloaded: Boolean,
    ARDProduct_Start_Date: Option[Timestamp],
    ARDProduct_End_Date: Option[Timestamp],
    ARDProduct: Boolean,
    DCLoaded: Boolean,
    Invalid: Boolean,
    Archived: Boolean,
    ExtendedInfo: Option[String])

final case class Icesat2Scene(
    PID: Long,
    Producer_ID: String,
    Granule_ID: String,
    Title: String,
    Start_Time: Timestamp,
    End_Time: Timestamp,
    Updated_Time: Timestamp,
    Product: String,
    Version: String,
    Online: Boolean,
    Orb_Ascending_Crossing: Option[Double],
    Orb_Start_Direct: Option[String],
    Orb_Start_Lat: Option[Double],
    Orb_End_Direct: Option[String],
    Orb_End_Lat: Option[Double],
    Eq_Cross_Time: Option[Timestamp],
    Eq_Cross_Lon: Option[Double],
    Orbit_Number: Option[Int],
    North_Lat: Option[Double],
    South_Lat: Option[Double],
    East_Lon: Option[Double],
    West_Lon: Option[Double],
    Total_Size: Option[Double],
    File_MD5: Option[String],
    Remote_URL: String,
    Query_Date: Timestamp,
    Download_Start_Date: Option[Timestamp],
    Download_End_Date: Option[Timestamp],
    Downloaded: Boolean,
    ARDProduct_Start_Date: Option[Timestamp],
    ARDProduct_End_Date: Option[Timestamp],
    ARDProduct: Boolean,
    DCLoaded: Boolean,
    Invalid: Boolean,
    Archived: Boolean,
    ExtendedInfo: Option[String])

/** The shared-column contract a sensor table exposes to the generic
  * catalogue layer: where its identity, observation date, platform and
  * cloud columns live. State-machine/bbox/ExtendedInfo columns are
  * name-identical across all sensors and need no mapping.
  *
  * @param obsDateCol underlying column (also the partition column for
  *                   a date-partitioned backend)
  * @param obsDate    canonical DATE expression over it
  * @param dupKey     J6 duplicate-group key
  * @param dupOrder   J6 newest-first ordering column
  */
final case class SensorSchema(
    sensor: String,
    schema: StructType,
    dupKey: String,
    dupOrder: String,
    platform: Option[String],
    obsDateCol: String,
    cloud: Option[String]) {
  def obsDate: Column = schema(obsDateCol).dataType match {
    case org.apache.spark.sql.types.DateType => col(obsDateCol)
    case _ => to_date(col(obsDateCol))
  }
}

object SensorSchemas {
  val landsat: SensorSchema = SensorSchema("LandsatGOOG",
    Encoders.product[Scene].schema,
    dupKey = "Scene_ID", dupOrder = "Product_ID",
    platform = Some("Spacecraft_ID"),
    obsDateCol = "Date_Acquired", cloud = Some("Cloud_Cover"))

  val sentinel1: SensorSchema = SensorSchema("Sentinel1ASF",
    Encoders.product[Sentinel1Scene].schema,
    dupKey = "Scene_ID", dupOrder = "Product_Name",
    platform = Some("Platform"),
    obsDateCol = "Acquisition_Date", cloud = None)

  val sentinel2: SensorSchema = SensorSchema("Sentinel2GOOG",
    Encoders.product[Sentinel2Scene].schema,
    dupKey = "Granule_ID", dupOrder = "Product_ID",
    platform = Some("Platform_ID"),
    obsDateCol = "Sensing_Time", cloud = Some("Cloud_Cover"))

  val gedi: SensorSchema = SensorSchema("GEDI",
    Encoders.product[GediScene].schema,
    dupKey = "FileName", dupOrder = "Version",
    platform = None,
    obsDateCol = "Date_Acquired", cloud = None)

  val icesat2: SensorSchema = SensorSchema("ICESAT2",
    Encoders.product[Icesat2Scene].schema,
    dupKey = "Granule_ID", dupOrder = "Version",
    platform = None,
    obsDateCol = "Start_Time", cloud = None)

  val all: Seq[SensorSchema] =
    Seq(landsat, sentinel1, sentinel2, gedi, icesat2)
}
