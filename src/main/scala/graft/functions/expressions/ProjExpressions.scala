package graft.functions.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** General EPSG reprojection for the codes the reference actually
  * meets (C11): the scene-vs-vector-layer join reprojects scene bboxes
  * from 4326 into the layer's CRS (eodatadownlandsatgoogsensor.py:
  * 723-725 via reprojBBOX_epsg). Supported here without any proj
  * dependency, from the published closed forms:
  *
  *  - EPSG:4326 (identity), EPSG:3857 (web mercator — composed from
  *    built-ins in GraftFunctions), and
  *  - the UTM families EPSG:326zz (north) / 327zz (south) via the
  *    WGS84 Transverse Mercator series (Snyder 1987, "Map
  *    Projections — A Working Manual", eqs. 8-9..8-25; sub-cm vs
  *    proj within a zone's normal extent).
  *
  * Scalar math with `doGenCode` static calls — reprojection runs
  * per-scene-row inside whole-stage codegen during spatial joins.
  */
object ProjImpl {
  private val a = 6378137.0
  private val f = 1.0 / 298.257223563
  private val e2 = f * (2 - f)
  private val ep2 = e2 / (1 - e2)
  private val k0 = 0.9996

  private def centralMeridian(zone: Int): Double = (zone - 1) * 6 - 180 + 3

  /** Meridional arc length M(φ) — Snyder eq. 3-21. */
  private def arc(phi: Double): Double = {
    val e4 = e2 * e2; val e6 = e4 * e2
    a * ((1 - e2 / 4 - 3 * e4 / 64 - 5 * e6 / 256) * phi -
      (3 * e2 / 8 + 3 * e4 / 32 + 45 * e6 / 1024) * math.sin(2 * phi) +
      (15 * e4 / 256 + 45 * e6 / 1024) * math.sin(4 * phi) -
      (35 * e6 / 3072) * math.sin(6 * phi))
  }

  /** (lon, lat) degrees → (easting, northing) meters in the given UTM
    * zone/hemisphere. Snyder eqs. 8-9..8-14.
    */
  def utmForward(lonDeg: Double, latDeg: Double, zone: Int,
                 south: Boolean): InternalRow = {
    // validated HERE so the codegen path (which bypasses nullSafeEval)
    // also fails loudly on an unsupported EPSG instead of projecting
    // through a nonsense central meridian
    require(zone >= 1 && zone <= 60, s"unsupported UTM zone $zone")
    val phi = math.toRadians(latDeg)
    val lam = math.toRadians(lonDeg)
    val lam0 = math.toRadians(centralMeridian(zone))
    val sinP = math.sin(phi); val cosP = math.cos(phi); val tanP = math.tan(phi)
    val n = a / math.sqrt(1 - e2 * sinP * sinP)
    val t = tanP * tanP
    val c = ep2 * cosP * cosP
    val bigA = cosP * (lam - lam0)
    val a2 = bigA * bigA; val a3 = a2 * bigA
    val a4 = a3 * bigA; val a5 = a4 * bigA; val a6 = a5 * bigA
    val x = k0 * n * (bigA + (1 - t + c) * a3 / 6 +
      (5 - 18 * t + t * t + 72 * c - 58 * ep2) * a5 / 120) + 500000.0
    val y0 = k0 * (arc(phi) + n * tanP * (a2 / 2 +
      (5 - t + 9 * c + 4 * c * c) * a4 / 24 +
      (61 - 58 * t + t * t + 600 * c - 330 * ep2) * a6 / 720))
    val y = if (south) y0 + 10000000.0 else y0
    InternalRow(x, y)
  }

  /** (easting, northing) meters → (lon, lat) degrees. Snyder eqs.
    * 8-17..8-25 (footpoint latitude series).
    */
  def utmInverse(easting: Double, northing: Double, zone: Int,
                 south: Boolean): InternalRow = {
    require(zone >= 1 && zone <= 60, s"unsupported UTM zone $zone")
    val x = easting - 500000.0
    val y = if (south) northing - 10000000.0 else northing
    val m = y / k0
    val e4 = e2 * e2; val e6 = e4 * e2
    val mu = m / (a * (1 - e2 / 4 - 3 * e4 / 64 - 5 * e6 / 256))
    val e1 = (1 - math.sqrt(1 - e2)) / (1 + math.sqrt(1 - e2))
    val e1_2 = e1 * e1; val e1_3 = e1_2 * e1; val e1_4 = e1_3 * e1
    val phi1 = mu + (3 * e1 / 2 - 27 * e1_3 / 32) * math.sin(2 * mu) +
      (21 * e1_2 / 16 - 55 * e1_4 / 32) * math.sin(4 * mu) +
      (151 * e1_3 / 96) * math.sin(6 * mu) +
      (1097 * e1_4 / 512) * math.sin(8 * mu)
    val sinP = math.sin(phi1); val cosP = math.cos(phi1)
    val tanP = math.tan(phi1)
    val c1 = ep2 * cosP * cosP
    val t1 = tanP * tanP
    val n1 = a / math.sqrt(1 - e2 * sinP * sinP)
    val r1 = a * (1 - e2) / math.pow(1 - e2 * sinP * sinP, 1.5)
    val d = x / (n1 * k0)
    val d2 = d * d; val d3 = d2 * d; val d4 = d3 * d
    val d5 = d4 * d; val d6 = d5 * d
    val phi = phi1 - (n1 * tanP / r1) * (d2 / 2 -
      (5 + 3 * t1 + 10 * c1 - 4 * c1 * c1 - 9 * ep2) * d4 / 24 +
      (61 + 90 * t1 + 298 * c1 + 45 * t1 * t1 - 252 * ep2 - 3 * c1 * c1) *
        d6 / 720)
    val lam = (d - (1 + 2 * t1 + c1) * d3 / 6 +
      (5 - 2 * c1 + 28 * t1 - 3 * c1 * c1 + 8 * ep2 + 24 * t1 * t1) *
        d5 / 120) / cosP
    InternalRow(math.toDegrees(lam) + centralMeridian(zone),
      math.toDegrees(phi))
  }

  /** EPSG 326zz/327zz → (zone, south); -1 zone for unsupported codes. */
  def utmZoneOf(epsg: Int): Int =
    if (epsg >= 32601 && epsg <= 32660) epsg - 32600
    else if (epsg >= 32701 && epsg <= 32760) epsg - 32700
    else -1

  def isSouth(epsg: Int): Boolean = epsg >= 32701 && epsg <= 32760

  /** bbox struct (degrees) → bbox struct (target CRS meters), corner
    * reprojection + envelope (what reprojBBOX does for a rectangle).
    * Throws on unsupported EPSG — silently wrong geometry is worse.
    */
  def bboxToUtm(bbox: InternalRow, epsg: Int): InternalRow = {
    val zone = utmZoneOf(epsg)
    require(zone > 0, s"unsupported EPSG:$epsg (expected 326zz/327zz)")
    val south = isSouth(epsg)
    val n = bbox.getDouble(0); val s = bbox.getDouble(1)
    val e = bbox.getDouble(2); val w = bbox.getDouble(3)
    val corners = Array((w, s), (w, n), (e, s), (e, n))
      .map { case (lon, lat) => utmForward(lon, lat, zone, south) }
    InternalRow(
      corners.map(_.getDouble(1)).max, corners.map(_.getDouble(1)).min,
      corners.map(_.getDouble(0)).max, corners.map(_.getDouble(0)).min)
  }
}

/** `utm_forward(struct<lon,lat>, epsg)` → struct<easting,northing>. */
case class UtmForward(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("easting", DoubleType, nullable = false),
    StructField("northing", DoubleType, nullable = false)))
  override def nullSafeEval(pt: Any, epsg: Any): Any = {
    val p = pt.asInstanceOf[InternalRow]
    val code = epsg.asInstanceOf[Int]
    val zone = ProjImpl.utmZoneOf(code)
    require(zone > 0, s"unsupported EPSG:$code")
    ProjImpl.utmForward(p.getDouble(0), p.getDouble(1), zone,
      ProjImpl.isSouth(code))
  }
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): UtmForward =
    copy(left = newLeft, right = newRight)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (p, c) =>
      s"""graft.functions.expressions.ProjImpl.utmForward(
         |  $p.getDouble(0), $p.getDouble(1),
         |  graft.functions.expressions.ProjImpl.utmZoneOf($c),
         |  graft.functions.expressions.ProjImpl.isSouth($c))""".stripMargin)
  override def prettyName: String = "utm_forward"
}

/** `utm_inverse(struct<easting,northing>, epsg)` → struct<lon,lat>. */
case class UtmInverse(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("lon", DoubleType, nullable = false),
    StructField("lat", DoubleType, nullable = false)))
  override def nullSafeEval(pt: Any, epsg: Any): Any = {
    val p = pt.asInstanceOf[InternalRow]
    val code = epsg.asInstanceOf[Int]
    val zone = ProjImpl.utmZoneOf(code)
    require(zone > 0, s"unsupported EPSG:$code")
    ProjImpl.utmInverse(p.getDouble(0), p.getDouble(1), zone,
      ProjImpl.isSouth(code))
  }
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): UtmInverse =
    copy(left = newLeft, right = newRight)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (p, c) =>
      s"""graft.functions.expressions.ProjImpl.utmInverse(
         |  $p.getDouble(0), $p.getDouble(1),
         |  graft.functions.expressions.ProjImpl.utmZoneOf($c),
         |  graft.functions.expressions.ProjImpl.isSouth($c))""".stripMargin)
  override def prettyName: String = "utm_inverse"
}

/** `bbox_to_utm(bbox, epsg)` → bbox in target CRS meters. */
case class BBoxToUtm(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = BBox.dataType
  override def nullSafeEval(bbox: Any, epsg: Any): Any =
    ProjImpl.bboxToUtm(bbox.asInstanceOf[InternalRow], epsg.asInstanceOf[Int])
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BBoxToUtm =
    copy(left = newLeft, right = newRight)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (b, c) =>
      s"graft.functions.expressions.ProjImpl.bboxToUtm($b, $c)")
  override def prettyName: String = "bbox_to_utm"
}
