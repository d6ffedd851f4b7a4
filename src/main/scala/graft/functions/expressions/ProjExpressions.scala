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
  *    built-ins in GraftFunctions),
  *  - the UTM families EPSG:326zz (north) / 327zz (south) via the
  *    WGS84 Transverse Mercator series (Snyder 1987, "Map
  *    Projections — A Working Manual", eqs. 8-9..8-25; sub-cm vs
  *    proj within a zone's normal extent), and
  *  - EPSG:27700 (OSGB National Grid — the reference's home CRS):
  *    the same TM series on Airy 1830 with false origin, composed
  *    with the OS published WGS84↔OSGB36 Helmert shift.
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

  // ---- polar stereographic (C11 polar family): EPSG:3413 (NSIDC
  // Sea Ice Polar Stereographic North — the grid ICESAT2/Arctic
  // products ship in; lat_ts=70, lon_0=-45) and EPSG:3031 (Antarctic
  // Polar Stereographic — GEDI/ICESAT2 Antarctic grids; lat_ts=-71,
  // lon_0=0), both WGS84, FE=FN=0. Ellipsoidal closed forms from
  // Snyder 1987 §21 (eqs. 15-9, 14-15, 21-34) = EPSG Guidance Note
  // 7-2 "Polar Stereographic variant B".

  private val e = math.sqrt(e2)

  /** Snyder eq. 15-9 (north-aspect t). */
  private def psT(phi: Double): Double =
    math.tan(math.Pi / 4 - phi / 2) *
      math.pow((1 + e * math.sin(phi)) / (1 - e * math.sin(phi)), e / 2)

  /** Snyder eq. 14-15. */
  private def psM(phi: Double): Double = {
    val s = math.sin(phi)
    math.cos(phi) / math.sqrt(1 - e2 * s * s)
  }

  /** Generic variant-B forward: (lon, lat) degrees → (x, y) meters,
    * for a standard parallel `latTs` (sign gives the aspect) and
    * central meridian `lon0`. Exposed (not just the EPSG dispatch) so
    * tests can replay the published EPSG Guidance Note example.
    */
  def psForwardParams(lonDeg: Double, latDeg: Double,
                      latTs: Double, lon0: Double): InternalRow = {
    val south = latTs < 0
    // south aspect = north-aspect formulas on the mirrored sphere
    val phi = math.toRadians(if (south) -latDeg else latDeg)
    val dLam = math.toRadians(
      if (south) -(lonDeg - lon0) else lonDeg - lon0)
    val phiC = math.toRadians(math.abs(latTs))
    val rho = a * psM(phiC) * psT(phi) / psT(phiC)
    val x = rho * math.sin(dLam)
    val y = -rho * math.cos(dLam)
    if (south) InternalRow(-x, -y) else InternalRow(x, y)
  }

  /** Generic variant-B inverse: (x, y) meters → (lon, lat) degrees
    * (footpoint-free; conformal-latitude series, Snyder eq. 3-5).
    */
  def psInverseParams(xm: Double, ym: Double,
                      latTs: Double, lon0: Double): InternalRow = {
    val south = latTs < 0
    val x = if (south) -xm else xm
    val y = if (south) -ym else ym
    val phiC = math.toRadians(math.abs(latTs))
    val rho = math.hypot(x, y)
    val t = rho * psT(phiC) / (a * psM(phiC))
    val chi = math.Pi / 2 - 2 * math.atan(t)
    val e4 = e2 * e2; val e6 = e4 * e2; val e8 = e6 * e2
    val phi = chi +
      (e2 / 2 + 5 * e4 / 24 + e6 / 12 + 13 * e8 / 360) * math.sin(2 * chi) +
      (7 * e4 / 48 + 29 * e6 / 240 + 811 * e8 / 11520) * math.sin(4 * chi) +
      (7 * e6 / 120 + 81 * e8 / 1120) * math.sin(6 * chi) +
      (4279 * e8 / 161280) * math.sin(8 * chi)
    val lam = if (rho == 0) 0.0 else math.atan2(x, -y)
    // λ0 + atan2 can leave (−180, 180] (e.g. 3413's λ0=−45 with an
    // eastern-hemisphere point) — normalize so forward∘inverse is the
    // identity on canonical longitudes
    if (south)
      InternalRow(normLon(lon0 - math.toDegrees(lam)), -math.toDegrees(phi))
    else
      InternalRow(normLon(lon0 + math.toDegrees(lam)), math.toDegrees(phi))
  }

  private def normLon(d: Double): Double = {
    val m = math.IEEEremainder(d, 360.0) // lands in [-180, 180]
    if (m <= -180.0) m + 360.0 else m
  }

  /** Standard parallel for a supported polar EPSG; NaN when not polar. */
  def psLatTs(epsg: Int): Double = epsg match {
    case 3413 => 70.0
    case 3031 => -71.0
    case _ => Double.NaN
  }

  def psLon0(epsg: Int): Double = epsg match {
    case 3413 => -45.0
    case 3031 => 0.0
    case _ => Double.NaN
  }

  private def requirePolar(epsg: Int): Unit =
    require(epsg == 3413 || epsg == 3031,
      s"unsupported polar EPSG:$epsg (expected 3413 north / 3031 south)")

  def psForward(lonDeg: Double, latDeg: Double, epsg: Int): InternalRow = {
    requirePolar(epsg)
    psForwardParams(lonDeg, latDeg, psLatTs(epsg), psLon0(epsg))
  }

  def psInverse(x: Double, y: Double, epsg: Int): InternalRow = {
    requirePolar(epsg)
    psInverseParams(x, y, psLatTs(epsg), psLon0(epsg))
  }

  // ---- OSGB National Grid (EPSG:27700) — the reference's home CRS
  // (its GB vector layers author in it; eodatadownlandsatgoogsensor
  // .py:723-725 reprojects arbitrary layer EPSGs). Airy 1830
  // Transverse Mercator with false origin, constants from the EPSG
  // registry / OS "A guide to coordinate systems in Great Britain"
  // (Annexes A-C), on the SAME Snyder series as UTM — plus the OS
  // published 7-parameter small-angle Helmert between the WGS84 and
  // OSGB36 geodetic datums (position-vector convention; ±3 m nominal
  // vs the OSTN grid — exactly what osr does for 27700 without grid
  // files). Projection series itself is mm-exact over GB (worked
  // example pinned < 10 cm in ProjSpec).

  private val airyA = 6377563.396
  private val airyB = 6356256.909
  private val airyE2 = 1 - (airyB * airyB) / (airyA * airyA)
  private val airyEp2 = airyE2 / (1 - airyE2)
  private val osgbK0 = 0.9996012717
  private val osgbPhi0 = math.toRadians(49.0)
  private val osgbLam0 = math.toRadians(-2.0)
  private val osgbFE = 400000.0
  private val osgbFN = -100000.0

  /** Snyder eq. 3-21 with explicit ellipsoid constants. */
  private def arcOn(phi: Double, aa: Double, ee2: Double): Double = {
    val e4 = ee2 * ee2; val e6 = e4 * ee2
    aa * ((1 - ee2 / 4 - 3 * e4 / 64 - 5 * e6 / 256) * phi -
      (3 * ee2 / 8 + 3 * e4 / 32 + 45 * e6 / 1024) * math.sin(2 * phi) +
      (15 * e4 / 256 + 45 * e6 / 1024) * math.sin(4 * phi) -
      (35 * e6 / 3072) * math.sin(6 * phi))
  }

  /** OSGB36 (lon, lat) degrees → National Grid (E, N) meters: the
    * UTM forward series with Airy constants, scale, false origin.
    */
  def osgbTmForward(lonDeg: Double, latDeg: Double): (Double, Double) = {
    val phi = math.toRadians(latDeg)
    val lam = math.toRadians(lonDeg)
    val sinP = math.sin(phi); val cosP = math.cos(phi)
    val tanP = math.tan(phi)
    val n = airyA / math.sqrt(1 - airyE2 * sinP * sinP)
    val t = tanP * tanP
    val c = airyEp2 * cosP * cosP
    val bigA = cosP * (lam - osgbLam0)
    val a2 = bigA * bigA; val a3 = a2 * bigA
    val a4 = a3 * bigA; val a5 = a4 * bigA; val a6 = a5 * bigA
    val x = osgbK0 * n * (bigA + (1 - t + c) * a3 / 6 +
      (5 - 18 * t + t * t + 72 * c - 58 * airyEp2) * a5 / 120) + osgbFE
    val m0 = arcOn(osgbPhi0, airyA, airyE2)
    val y = osgbK0 * (arcOn(phi, airyA, airyE2) - m0 +
      n * tanP * (a2 / 2 + (5 - t + 9 * c + 4 * c * c) * a4 / 24 +
        (61 - 58 * t + t * t + 600 * c - 330 * airyEp2) * a6 / 720)) +
      osgbFN
    (x, y)
  }

  /** National Grid (E, N) meters → OSGB36 (lon, lat) degrees. */
  def osgbTmInverse(easting: Double, northing: Double)
      : (Double, Double) = {
    val x = easting - osgbFE
    val m = arcOn(osgbPhi0, airyA, airyE2) + (northing - osgbFN) / osgbK0
    val e4 = airyE2 * airyE2; val e6 = e4 * airyE2
    val mu = m / (airyA * (1 - airyE2 / 4 - 3 * e4 / 64 - 5 * e6 / 256))
    val e1 = (1 - math.sqrt(1 - airyE2)) / (1 + math.sqrt(1 - airyE2))
    val e1_2 = e1 * e1; val e1_3 = e1_2 * e1; val e1_4 = e1_3 * e1
    val phi1 = mu + (3 * e1 / 2 - 27 * e1_3 / 32) * math.sin(2 * mu) +
      (21 * e1_2 / 16 - 55 * e1_4 / 32) * math.sin(4 * mu) +
      (151 * e1_3 / 96) * math.sin(6 * mu) +
      (1097 * e1_4 / 512) * math.sin(8 * mu)
    val sinP = math.sin(phi1); val cosP = math.cos(phi1)
    val tanP = math.tan(phi1)
    val c1 = airyEp2 * cosP * cosP
    val t1 = tanP * tanP
    val n1 = airyA / math.sqrt(1 - airyE2 * sinP * sinP)
    val r1 = airyA * (1 - airyE2) /
      math.pow(1 - airyE2 * sinP * sinP, 1.5)
    val d = x / (n1 * osgbK0)
    val d2 = d * d; val d3 = d2 * d; val d4 = d3 * d
    val d5 = d4 * d; val d6 = d5 * d
    val phi = phi1 - (n1 * tanP / r1) * (d2 / 2 -
      (5 + 3 * t1 + 10 * c1 - 4 * c1 * c1 - 9 * airyEp2) * d4 / 24 +
      (61 + 90 * t1 + 298 * c1 + 45 * t1 * t1 - 252 * airyEp2 -
        3 * c1 * c1) * d6 / 720)
    val lam = (d - (1 + 2 * t1 + c1) * d3 / 6 +
      (5 - 2 * c1 + 28 * t1 - 3 * c1 * c1 + 8 * airyEp2 +
        24 * t1 * t1) * d5 / 120) / cosP
    (math.toDegrees(osgbLam0 + lam), math.toDegrees(phi))
  }

  // OS Helmert WGS84 → OSGB36 (position-vector, small-angle): tx ty
  // tz meters, s ppm, rx ry rz arcseconds. The inverse uses the
  // negated set (standard small-angle practice; re-application error
  // is mm at these magnitudes).
  private val helmTx = -446.448
  private val helmTy = 125.157
  private val helmTz = -542.060
  private val helmS = 20.4894e-6
  private val helmRx = math.toRadians(-0.1502 / 3600.0)
  private val helmRy = math.toRadians(-0.2470 / 3600.0)
  private val helmRz = math.toRadians(-0.8421 / 3600.0)

  /** Geodetic (h=0) → geocentric cartesian on an ellipsoid. */
  private def toXYZ(lonDeg: Double, latDeg: Double, aa: Double,
                    ee2: Double): (Double, Double, Double) = {
    val phi = math.toRadians(latDeg); val lam = math.toRadians(lonDeg)
    val sinP = math.sin(phi)
    val nu = aa / math.sqrt(1 - ee2 * sinP * sinP)
    (nu * math.cos(phi) * math.cos(lam),
      nu * math.cos(phi) * math.sin(lam),
      nu * (1 - ee2) * sinP)
  }

  /** Geocentric cartesian → geodetic lon/lat (iterative latitude). */
  private def toLonLat(x: Double, y: Double, z: Double, aa: Double,
                       ee2: Double): (Double, Double) = {
    val lam = math.atan2(y, x)
    val p = math.hypot(x, y)
    var phi = math.atan2(z, p * (1 - ee2))
    var i = 0
    while (i < 8) { // converges to < 1e-12 rad in ~4 rounds
      val sinP = math.sin(phi)
      val nu = aa / math.sqrt(1 - ee2 * sinP * sinP)
      phi = math.atan2(z + ee2 * nu * sinP, p)
      i += 1
    }
    (math.toDegrees(lam), math.toDegrees(phi))
  }

  private def helmert(x: Double, y: Double, z: Double, sign: Double)
      : (Double, Double, Double) = {
    val s = 1 + sign * helmS
    val rx = sign * helmRx; val ry = sign * helmRy; val rz = sign * helmRz
    (sign * helmTx + s * (x - rz * y + ry * z),
      sign * helmTy + s * (rz * x + y - rx * z),
      sign * helmTz + s * (-ry * x + rx * y + z))
  }

  /** WGS84 (lon, lat) degrees → National Grid (easting, northing):
    * Helmert to OSGB36, then the Airy TM forward.
    */
  def osgbForward(lonDeg: Double, latDeg: Double): InternalRow = {
    val (x, y, z) = toXYZ(lonDeg, latDeg, a, e2)
    val (x2, y2, z2) = helmert(x, y, z, 1.0)
    val (lon36, lat36) = toLonLat(x2, y2, z2, airyA, airyE2)
    val (east, north) = osgbTmForward(lon36, lat36)
    InternalRow(east, north)
  }

  /** National Grid (easting, northing) → WGS84 (lon, lat) degrees. */
  def osgbInverse(easting: Double, northing: Double): InternalRow = {
    val (lon36, lat36) = osgbTmInverse(easting, northing)
    val (x, y, z) = toXYZ(lon36, lat36, airyA, airyE2)
    val (x2, y2, z2) = helmert(x, y, z, -1.0)
    val (lon, lat) = toLonLat(x2, y2, z2, a, e2)
    InternalRow(lon, lat)
  }

  /** bbox struct (degrees) → bbox struct (target CRS meters), corner
    * reprojection + envelope (what reprojBBOX does for a rectangle).
    * Throws on unsupported EPSG — silently wrong geometry is worse.
    * Dispatches across the supported projection families: UTM
    * 326zz/327zz, polar stereographic 3413/3031, and OSGB 27700. NB:
    * a corner envelope in a polar CRS UNDER-covers a box that spans
    * the pole or wide longitudes (the projected edges bulge); callers
    * doing polar containment joins should cut wide boxes first
    * (bboxSplit) exactly as they do for the antimeridian.
    */
  def bboxToUtm(bbox: InternalRow, epsg: Int): InternalRow = {
    val n = bbox.getDouble(0); val s = bbox.getDouble(1)
    val e = bbox.getDouble(2); val w = bbox.getDouble(3)
    val zone = utmZoneOf(epsg)
    val corners =
      if (zone > 0) {
        val south = isSouth(epsg)
        Array((w, s), (w, n), (e, s), (e, n))
          .map { case (lon, lat) => utmForward(lon, lat, zone, south) }
      } else if (epsg == 27700) {
        Array((w, s), (w, n), (e, s), (e, n))
          .map { case (lon, lat) => osgbForward(lon, lat) }
      } else {
        require(epsg == 3413 || epsg == 3031,
          s"unsupported EPSG:$epsg (expected UTM 326zz/327zz, " +
            "polar stereographic 3413/3031, or OSGB 27700)")
        Array((w, s), (w, n), (e, s), (e, n))
          .map { case (lon, lat) => psForward(lon, lat, epsg) }
      }
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

/** `ps_forward(struct<lon,lat>, epsg)` → struct<x,y> polar
  * stereographic meters (EPSG:3413 north / 3031 south).
  */
case class PsForward(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("x", DoubleType, nullable = false),
    StructField("y", DoubleType, nullable = false)))
  override def nullSafeEval(pt: Any, epsg: Any): Any = {
    val p = pt.asInstanceOf[InternalRow]
    ProjImpl.psForward(p.getDouble(0), p.getDouble(1), epsg.asInstanceOf[Int])
  }
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PsForward =
    copy(left = newLeft, right = newRight)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (p, c) =>
      s"""graft.functions.expressions.ProjImpl.psForward(
         |  $p.getDouble(0), $p.getDouble(1), $c)""".stripMargin)
  override def prettyName: String = "ps_forward"
}

/** `ps_inverse(struct<x,y>, epsg)` → struct<lon,lat> degrees. */
case class PsInverse(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("lon", DoubleType, nullable = false),
    StructField("lat", DoubleType, nullable = false)))
  override def nullSafeEval(pt: Any, epsg: Any): Any = {
    val p = pt.asInstanceOf[InternalRow]
    ProjImpl.psInverse(p.getDouble(0), p.getDouble(1), epsg.asInstanceOf[Int])
  }
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PsInverse =
    copy(left = newLeft, right = newRight)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (p, c) =>
      s"""graft.functions.expressions.ProjImpl.psInverse(
         |  $p.getDouble(0), $p.getDouble(1), $c)""".stripMargin)
  override def prettyName: String = "ps_inverse"
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
