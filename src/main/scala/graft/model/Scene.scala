package graft.model

import java.sql.{Date, Timestamp}

/** The per-scene catalogue row — the union of the state machine and
  * metadata the reference keeps per sensor (SURVEY.md §1.1–§1.2;
  * canonical columns from eodatadownlandsatgoogsensor.py:69-106, with
  * the S1/S2/GEDI/IS2 variants expressible as extra nullable fields or
  * a sensor-specific `ExtendedInfo` JSON).
  *
  * `Dataset[Scene]` gives the typed API; the generic query layer works
  * on the equivalent DataFrame. Tables are stored Parquet,
  * date-partitioned by `Date_Acquired` month at scale.
  */
case class Scene(
    PID: Long,
    Scene_ID: String,
    Product_ID: String,
    Spacecraft_ID: String,
    Sensing_Time: Timestamp,
    Date_Acquired: Date,
    Cloud_Cover: Double,
    North_Lat: Double,
    South_Lat: Double,
    East_Lon: Double,
    West_Lon: Double,
    Total_Size: Long,
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

/** Plugin-result row (eodatadownlandsatgoogsensor.py:109-119):
  * composite key (Scene_PID, PlugInName).
  */
case class PluginResult(
    Scene_PID: Long,
    PlugInName: String,
    Completed: Boolean,
    Success: Boolean,
    Outputs: Boolean,
    Error_Occurred: Boolean,
    Start_Date: Option[Timestamp],
    End_Date: Option[Timestamp],
    ExtendedInfo: Option[String])

/** Usage/audit log row (eodatadownusagedb.py:46-60). */
case class UsageLog(
    Absolute_Path: String,
    Update_Time: Timestamp,
    Scene_PID: Option[Long],
    Description: String)

/** Date-report registry row (EDDDateReports,
  * eodatadowndatereports.py:60-71): metadata about a produced
  * date-report artifact. The PDF render itself is app-layer; this row
  * is the engine-side record of it. `Start_Date` is the MOST RECENT
  * date of the reported range and `End_Date` the earliest, matching
  * the reference's argument convention; the JSONB columns ride as JSON
  * strings like ExtendedInfo does on scenes.
  */
case class DateReport(
    PID: Long,
    File_Path: String,
    Start_Date: Date,
    End_Date: Date,
    Production_Date: Timestamp,
    Sensor: String,
    Platform: String,
    Scn_Images: Option[String],
    ExtendedInfo: Option[String])
