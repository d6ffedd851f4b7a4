package graft.catalog

import java.sql.{Date, Timestamp}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.DateReport
import graft.sources.{CowTable, VersionedTable}

/** The date-report registry (EDDDateReports,
  * eodatadowndatereports.py:60-71 + the record_db branch at :261-275):
  * a small metadata table recording every produced date report — file
  * path, covered date range, sensor/platform, production timestamp,
  * and the per-scene image map as JSON. The PDF/quicklook rendering is
  * app-layer per SURVEY (S11); this is the engine-side state next to
  * UsageLog that makes reports discoverable and re-runnable.
  *
  * Metadata-table scale by definition (one row per produced report),
  * so the whole-table [[CowTable]] rewrite is the right backend; the
  * report DataFrames that FEED a report (q10/q12/q19 shapes) stay on
  * the distributed path.
  */
class ReportRegistry(val table: VersionedTable, spark: SparkSession) {
  import spark.implicits._

  /** All recorded reports (empty, typed frame before the first
    * record — callers can list a fresh registry without bootstrapping).
    */
  def reports: DataFrame =
    if (table.exists) table.read()
    else spark.emptyDataset[DateReport].toDF()

  /** Record one produced report; allocates the next PID (max+1 over a
    * metadata-sized table — the reference's autoincrement PK).
    * `startDate` is the most recent date of the range, `endDate` the
    * earliest (reference convention); inverted ranges are a caller bug.
    */
  def record(filePath: String, startDate: Date, endDate: Date,
             sensor: String, platform: String,
             scnImagesJson: Option[String] = None,
             extendedInfo: Option[String] = None): Long = {
    require(!endDate.after(startDate),
      s"endDate $endDate is after startDate $startDate (Start_Date is " +
        "the MOST RECENT date of the range, per the reference convention)")
    val nextPid =
      if (!table.exists) 1L
      else table.read().agg(coalesce(max(col("PID")), lit(0L)))
        .as[Long].head() + 1L
    table.append(Seq(DateReport(nextPid, filePath, startDate, endDate,
      new Timestamp(System.currentTimeMillis()), sensor, platform,
      scnImagesJson, extendedInfo)).toDF())
    nextPid
  }

  /** Reports newest-production-first, optionally filtered by sensor
    * and/or platform (the reference queries per sensor).
    */
  def list(sensor: Option[String] = None,
           platform: Option[String] = None): DataFrame = {
    val p = Seq(
      sensor.map(col("Sensor") === _),
      platform.map(col("Platform") === _)
    ).flatten.reduceOption(_ && _).getOrElse(lit(true))
    reports.filter(p).orderBy(col("Production_Date").desc, col("PID").desc)
  }

  /** Reports whose covered range contains `date` (closed bounds;
    * remember Start_Date >= End_Date).
    */
  def reportsForDate(date: Date): DataFrame =
    reports.filter(col("End_Date") <= lit(date) &&
      col("Start_Date") >= lit(date))
      .orderBy(col("Production_Date").desc, col("PID").desc)

  def reportByPid(pid: Long): DataFrame =
    reports.filter(col("PID") === pid)

  /** Drop one report record (the artifact file is the caller's to
    * delete — the registry never touches report files).
    */
  def remove(pid: Long): Unit =
    if (table.exists) table.deleteWhere(col("PID") === pid)
}

object ReportRegistry {
  def apply(root: String)(implicit spark: SparkSession): ReportRegistry =
    new ReportRegistry(new CowTable(root, spark), spark)
}
