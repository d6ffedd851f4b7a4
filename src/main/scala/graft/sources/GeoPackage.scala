package graft.sources

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import scala.jdk.CollectionConverters._

/** GeoPackage footprint export (SURVEY §2.1 S9's container half): the
  * reference materializes each sensor's scene footprints as a GPKG
  * vector layer via GDAL (`eodatadownlandsatgoogsensor.py:2688-2845`
  * — ogr2ogr over a GeoJSON intermediate); this writes the same
  * container directly on [[SqliteFile]]: the three required metadata
  * tables (`gpkg_spatial_ref_sys`, `gpkg_contents`,
  * `gpkg_geometry_columns` — GeoPackage spec §1.1.2-1.1.6), the
  * `GPKG` application id + 10300 user_version header stamp, and one
  * feature table whose `geom` column holds GeoPackageBinary blobs
  * (spec §2.1.3: "GP" magic, XY envelope, little-endian WKB POLYGON)
  * built from each scene's lat/lon bbox.
  *
  * Single-file scale contract mirrors [[ExportImport.exportGeoJson]]:
  * a GPKG is one sqlite file and inherently single-writer, so the
  * same row guard applies and the beyond-guard path stays
  * [[ExportImport.exportGeoJsonSharded]] (whose GeoJSONSeq shards GDAL
  * converts per shard). Attribute typing: integral → INTEGER, float →
  * REAL, boolean → INTEGER 0/1, date/timestamp → ISO-8601 TEXT
  * (GeoPackage's own convention), everything else TEXT.
  */
object GeoPackage {

  import SqliteFile._

  /** GeoPackageBinary blob for one XY bbox polygon (spec §2.1.3). */
  private[sources] def gpkgBbox(west: Double, south: Double,
                                east: Double, north: Double,
                                srsId: Int): Array[Byte] = {
    // header: magic GP, version 0, flags 0x03 (LE + XY envelope),
    // srs_id; envelope minx,maxx,miny,maxy (LE doubles)
    val wkbPts = Seq((west, south), (east, south), (east, north),
      (west, north), (west, south))
    // exact size — trailing slack bytes would corrupt strict WKB
    // parsers: 8 header + 32 envelope + 13 wkb preamble + 16/pt
    val buf = ByteBuffer.allocate(8 + 32 + 13 + 16 * wkbPts.size)
    buf.order(ByteOrder.BIG_ENDIAN)
    buf.put('G'.toByte).put('P'.toByte).put(0.toByte).put(0x03.toByte)
    buf.order(ByteOrder.LITTLE_ENDIAN)
    buf.putInt(srsId)
    buf.putDouble(west).putDouble(east)
    buf.putDouble(south).putDouble(north)
    // WKB polygon, little-endian: byte order 1, type 3, 1 ring, 5 pts
    buf.put(1.toByte).putInt(3).putInt(1).putInt(wkbPts.size)
    wkbPts.foreach { case (x, y) => buf.putDouble(x).putDouble(y) }
    buf.array()
  }

  /** Parse a [[gpkgBbox]]-shaped blob back to (west, south, east,
    * north) — the round-trip verifier's inverse.
    */
  def parseBbox(blob: Array[Byte])
      : (Double, Double, Double, Double) = {
    require(blob(0) == 'G'.toByte && blob(1) == 'P'.toByte,
      "not a GeoPackageBinary blob")
    val bb = ByteBuffer.wrap(blob).order(ByteOrder.LITTLE_ENDIAN)
    val minx = bb.getDouble(8)
    val maxx = bb.getDouble(16)
    val miny = bb.getDouble(24)
    val maxy = bb.getDouble(32)
    (minx, miny, maxx, maxy)
  }

  private def sqliteType(dt: DataType): String = dt match {
    case ByteType | ShortType | IntegerType | LongType |
         BooleanType => "INTEGER"
    case FloatType | DoubleType => "REAL"
    case _ => "TEXT"
  }

  private val srsRows: Seq[Seq[V]] = Seq(
    Seq(VText("Undefined cartesian SRS"), VInt(-1), VText("NONE"),
      VInt(-1), VText("undefined"), VNull),
    Seq(VText("Undefined geographic SRS"), VInt(0), VText("NONE"),
      VInt(0), VText("undefined"), VNull),
    Seq(VText("WGS 84 geodetic"), VInt(4326), VText("EPSG"), VInt(4326),
      VText("GEOGCS[\"WGS 84\",DATUM[\"WGS_1984\"," +
        "SPHEROID[\"WGS 84\",6378137,298.257223563]]," +
        "PRIMEM[\"Greenwich\",0],UNIT[\"degree\",0.0174532925199433]," +
        "AUTHORITY[\"EPSG\",\"4326\"]]"),
      VText("longitude/latitude coordinates in decimal degrees")))

  /** Export `df`'s footprints + `props` attributes as one GPKG layer.
    * Returns the feature count. Same driver-stream shape as the
    * GeoJSON single-file exporter (toLocalIterator — one partition
    * pinned at a time, never a full collect), same loud row guard.
    */
  def exportGeoPackage(df: DataFrame, path: String, layer: String,
                       props: Seq[String],
                       north: String = "North_Lat",
                       south: String = "South_Lat",
                       east: String = "East_Lon",
                       west: String = "West_Lon",
                       maxRows: Long =
                         ExportImport.DefaultSingleFileMaxRows): Long = {
    require(props.nonEmpty,
      "exportGeoPackage: props must name at least one attribute column")
    ExportImport.requireSingleFileScale(df, maxRows, "exportGeoPackage",
      alt = "ExportImport.exportGeoJsonSharded (distributed " +
        "GeoJSONSeq part-files; GDAL converts each shard to GPKG)")
    val schema = df.schema
    def fld(c: String): StructField = schema.fields.find(_.name == c)
      .getOrElse(throw new IllegalArgumentException(
        s"exportGeoPackage: no column '$c' in ${schema.fieldNames
          .mkString(", ")}"))
    // global envelope for gpkg_contents (one tiny aggregate job)
    val env = df.agg(min(col(west)), min(col(south)),
      max(col(east)), max(col(north))).head()
    val (eW, eS, eE, eN) =
      if (env.isNullAt(0)) (0.0, 0.0, 0.0, 0.0)
      else (env.getDouble(0), env.getDouble(1),
        env.getDouble(2), env.getDouble(3))

    // ISO-stringify temporal props like the GeoJSON path, then stream
    val rendered = props.foldLeft(df) { (d, c) =>
      fld(c).dataType match {
        case TimestampType | DateType =>
          d.withColumn(c, date_format(col(c),
            "yyyy-MM-dd'T'HH:mm:ss'Z'"))
        case _ => d
      }
    }
    val cols = Seq(west, south, east, north).map(c =>
      col(c).cast("double")) ++ props.map(col)
    var n = 0L
    val featureRows: Iterator[Seq[V]] =
      rendered.select(cols: _*).toLocalIterator().asScala.map { r =>
        n += 1
        val geom = gpkgBbox(r.getDouble(0), r.getDouble(1),
          r.getDouble(2), r.getDouble(3), 4326)
        VNull +: VBlob(geom) +: props.zipWithIndex.map { case (c, i) =>
          val v = r.get(4 + i)
          if (v == null) VNull
          else fld(c).dataType match {
            case ByteType | ShortType | IntegerType | LongType =>
              VInt(r.getLong(4 + i))
            case BooleanType => VInt(if (r.getBoolean(4 + i)) 1L else 0L)
            case FloatType | DoubleType => VReal(r.getDouble(4 + i))
            case _ => VText(v.toString)
          }
        }
      }
    val attrDdl = props.map(c =>
      s""""$c" ${sqliteType(fld(c).dataType)}""").mkString(", ")
    val now = java.time.format.DateTimeFormatter
      .ofPattern("yyyy-MM-dd'T'HH:mm:ss'Z'")
      .format(java.time.Instant.now().atZone(java.time.ZoneOffset.UTC))
    val tables = Seq(
      Table("gpkg_spatial_ref_sys",
        "CREATE TABLE gpkg_spatial_ref_sys (srs_name TEXT NOT NULL, " +
          "srs_id INTEGER NOT NULL PRIMARY KEY, organization TEXT " +
          "NOT NULL, organization_coordsys_id INTEGER NOT NULL, " +
          "definition TEXT NOT NULL, description TEXT)",
        srsRows.iterator, ipkCol = Some(1)),
      Table(layer,
        s"""CREATE TABLE "$layer" (fid INTEGER PRIMARY KEY, geom """ +
          s"POLYGON, $attrDdl)",
        featureRows, ipkCol = Some(0)),
      Table("gpkg_contents",
        "CREATE TABLE gpkg_contents (table_name TEXT NOT NULL PRIMARY " +
          "KEY, data_type TEXT NOT NULL, identifier TEXT UNIQUE, " +
          "description TEXT DEFAULT '', last_change DATETIME NOT " +
          "NULL, min_x DOUBLE, min_y DOUBLE, max_x DOUBLE, max_y " +
          "DOUBLE, srs_id INTEGER)",
        Iterator(Seq(VText(layer), VText("features"), VText(layer),
          VText("scene footprints"), VText(now), VReal(eW), VReal(eS),
          VReal(eE), VReal(eN), VInt(4326)))),
      Table("gpkg_geometry_columns",
        "CREATE TABLE gpkg_geometry_columns (table_name TEXT NOT NULL, " +
          "column_name TEXT NOT NULL, geometry_type_name TEXT NOT " +
          "NULL, srs_id INTEGER NOT NULL, z TINYINT NOT NULL, m " +
          "TINYINT NOT NULL, CONSTRAINT pk_geom_cols PRIMARY KEY " +
          "(table_name, column_name))",
        Iterator(Seq(VText(layer), VText("geom"), VText("POLYGON"),
          VInt(4326), VInt(0), VInt(0)))))
    // application_id "GPKG", user_version 10300 = GeoPackage 1.3
    SqliteFile.write(path, tables,
      applicationId = 0x47504B47, userVersion = 10300)
    n
  }
}
