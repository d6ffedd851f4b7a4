package graft.functions

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.{GraftFunctions => G}

/** C11 general reprojection: WGS84 ⇄ UTM closed forms (Snyder series).
  * No proj library in this environment, so correctness is pinned by
  * the projection's defining invariants rather than external
  * coordinates: central-meridian behavior, hemisphere offsets,
  * forward∘inverse identity, and envelope sanity for the bbox form.
  */
class ProjSpec extends SparkSpec {
  import spark.implicits._

  private def fwd(lon: Double, lat: Double, epsg: Int): (Double, Double) =
    Seq((lon, lat)).toDF("lon", "lat")
      .select(G.utmForward(struct($"lon", $"lat"), epsg).as("p"))
      .select("p.easting", "p.northing").as[(Double, Double)].head()

  private def inv(e: Double, n: Double, epsg: Int): (Double, Double) =
    Seq((e, n)).toDF("e", "n")
      .select(G.utmInverse(struct($"e", $"n"), epsg).as("p"))
      .select("p.lon", "p.lat").as[(Double, Double)].head()

  test("central meridian maps to easting 500000; equator to northing 0") {
    // zone 31N (EPSG:32631), central meridian 3°E
    val (e0, n0) = fwd(3.0, 0.0, 32631)
    assert(math.abs(e0 - 500000.0) < 1e-6)
    assert(math.abs(n0) < 1e-6)
    // on the CM at any latitude easting stays exactly 500000
    val (e1, _) = fwd(3.0, 52.0, 32631)
    assert(math.abs(e1 - 500000.0) < 1e-6)
    // one degree east of the CM at the equator ≈ k0·111.32 km
    val (e2, _) = fwd(4.0, 0.0, 32631)
    assert(e2 - 500000.0 > 111000 * 0.9996 && e2 - 500000.0 < 112000)
  }

  test("southern hemisphere uses the 10,000,000 m false northing") {
    // zone 33S (EPSG:32733), 15°E CM; lat -30 lands below 10M
    val (_, n) = fwd(15.0, -30.0, 32733)
    assert(n > 6000000 && n < 10000000)
    val (lon, lat) = inv(500000.0, n, 32733)
    assert(math.abs(lon - 15.0) < 1e-9 && math.abs(lat + 30.0) < 1e-9)
  }

  test("forward∘inverse is the identity across the zone") {
    val r = new Random(7)
    for (_ <- 1 to 40) {
      val zone = 1 + r.nextInt(60)
      val south = r.nextBoolean()
      val epsg = (if (south) 32700 else 32600) + zone
      val cm = (zone - 1) * 6 - 180 + 3
      val lon = cm + (r.nextDouble() - 0.5) * 6 // within the zone
      val lat = (if (south) -1 else 1) * r.nextDouble() * 80
      val (e, n) = fwd(lon, lat, epsg)
      val (lon2, lat2) = inv(e, n, epsg)
      assert(math.abs(lon2 - lon) < 1e-8, s"lon $lon -> $lon2 (epsg $epsg)")
      assert(math.abs(lat2 - lat) < 1e-8, s"lat $lat -> $lat2 (epsg $epsg)")
    }
  }

  private def psF(lon: Double, lat: Double, epsg: Int): (Double, Double) =
    Seq((lon, lat)).toDF("lon", "lat")
      .select(G.psForward(struct($"lon", $"lat"), epsg).as("p"))
      .select("p.x", "p.y").as[(Double, Double)].head()

  private def psI(x: Double, y: Double, epsg: Int): (Double, Double) =
    Seq((x, y)).toDF("x", "y")
      .select(G.psInverse(struct($"x", $"y"), epsg).as("p"))
      .select("p.lon", "p.lat").as[(Double, Double)].head()

  test("polar stereographic matches the published EPSG variant-B example") {
    // IOGP Guidance Note 7-2, Polar Stereographic variant B worked
    // example (Australian Antarctic Polar Stereographic): standard
    // parallel 71°S, longitude of origin 70°E, FE = FN = 6,000,000 m;
    // (120°E, 75°S) → E 7,255,380.79 m, N 7,053,389.56 m.
    val out = graft.functions.expressions.ProjImpl
      .psForwardParams(120.0, -75.0, latTs = -71.0, lon0 = 70.0)
    val e = out.getDouble(0) + 6000000.0
    val n = out.getDouble(1) + 6000000.0
    assert(math.abs(e - 7255380.79) < 0.05, s"E was $e")
    assert(math.abs(n - 7053389.56) < 0.05, s"N was $n")
    val back = graft.functions.expressions.ProjImpl
      .psInverseParams(out.getDouble(0), out.getDouble(1),
        latTs = -71.0, lon0 = 70.0)
    assert(math.abs(back.getDouble(0) - 120.0) < 1e-8)
    assert(math.abs(back.getDouble(1) + 75.0) < 1e-8)
  }

  test("OSGB 27700 matches the OS published worked example to < 10 cm") {
    import graft.functions.expressions.ProjImpl
    // OS "A guide to coordinate systems in Great Britain", Annexe C
    // worked example of the National Grid projection (OSGB36 input —
    // the TM series alone, no datum shift):
    //   φ = 52°39'27.2531"N, λ = 1°43'4.5177"E
    //   → E 651409.903, N 313177.270
    val lat = 52.0 + 39.0 / 60 + 27.2531 / 3600
    val lon = 1.0 + 43.0 / 60 + 4.5177 / 3600
    val (e, n) = ProjImpl.osgbTmForward(lon, lat)
    assert(math.abs(e - 651409.903) < 0.1, s"E was $e")
    assert(math.abs(n - 313177.270) < 0.1, s"N was $n")
    // TM inverse round trip: < 1e-7 degrees (~1 cm; measured ~3e-8)
    val (lonB, latB) = ProjImpl.osgbTmInverse(e, n)
    assert(math.abs(lonB - lon) < 1e-7 && math.abs(latB - lat) < 1e-7)
    // grid origin: the true origin (49N, 2W) lands on the false origin
    val (e0, n0) = ProjImpl.osgbTmForward(-2.0, 49.0)
    assert(math.abs(e0 - 400000.0) < 1e-6 &&
      math.abs(n0 + 100000.0) < 1e-6)
  }

  test("OSGB full WGS84 path: Helmert shift magnitude and round trip") {
    import graft.functions.expressions.ProjImpl
    // the WGS84→OSGB36 shift over GB is ~50-120 m ground distance —
    // the full path must differ from the naive no-datum projection by
    // that order (proves the Helmert is actually applied)...
    val (lon, lat) = (-1.54, 53.79) // Leeds-ish
    val full = ProjImpl.osgbForward(lon, lat)
    val (naiveE, naiveN) = ProjImpl.osgbTmForward(lon, lat)
    val shift = math.hypot(full.getDouble(0) - naiveE,
      full.getDouble(1) - naiveN)
    assert(shift > 30 && shift < 200, s"datum shift was $shift m")
    // ...and invert to the starting point within mm (small-angle
    // Helmert re-application error)
    val back = ProjImpl.osgbInverse(full.getDouble(0), full.getDouble(1))
    assert(math.abs(back.getDouble(0) - lon) < 1e-7)
    assert(math.abs(back.getDouble(1) - lat) < 1e-7)
    // bbox dispatch covers 27700
    val bb = Seq((53.8, 53.7, -1.4, -1.6)).toDF("n", "s", "e", "w")
      .select(G.bboxToUtm(struct($"n", $"s", $"e", $"w"), 27700).as("b"))
      .select("b.*").as[(Double, Double, Double, Double)].head()
    assert(bb._1 > bb._2 && bb._3 > bb._4)
    assert(bb._3 > 400000 - 120000 && bb._4 < 440000) // GB eastings
  }

  test("polar stereographic axes, poles, and standard-parallel scale") {
    // both poles project to the grid origin
    val (px, py) = psF(13.0, 90.0, 3413)
    assert(math.abs(px) < 1e-6 && math.abs(py) < 1e-6)
    val (sx, sy) = psF(13.0, -90.0, 3031)
    assert(math.abs(sx) < 1e-6 && math.abs(sy) < 1e-6)
    // on the central meridian: north aspect runs down-grid (y<0),
    // south aspect up-grid (y>0)
    val (nx, ny) = psF(-45.0, 75.0, 3413)
    assert(math.abs(nx) < 1e-6 && ny < -1000000)
    val (ax, ay) = psF(0.0, -75.0, 3031)
    assert(math.abs(ax) < 1e-6 && ay > 1000000)
    // scale factor at the standard parallel is 1: a 0.01° step along
    // lat 70N measures its true ellipsoidal parallel-arc length
    val (x1, y1) = psF(10.0, 70.0, 3413)
    val (x2, y2) = psF(10.01, 70.0, 3413)
    val planar = math.hypot(x2 - x1, y2 - y1)
    val aWgs = 6378137.0; val e2 = (1 / 298.257223563) * (2 - 1 / 298.257223563)
    val s70 = math.sin(math.toRadians(70))
    val arc = math.toRadians(0.01) *
      aWgs * math.cos(math.toRadians(70)) / math.sqrt(1 - e2 * s70 * s70)
    assert(math.abs(planar / arc - 1.0) < 1e-6, s"scale ${planar / arc}")
  }

  test("polar forward∘inverse identity incl. wrap longitudes; bad EPSG raises") {
    val r = new Random(11)
    for (_ <- 1 to 40) {
      val north = r.nextBoolean()
      val epsg = if (north) 3413 else 3031
      val lon = (r.nextDouble() - 0.5) * 359.9 // includes |λ−λ0| > 180 wraps
      val lat = (if (north) 1 else -1) * (55 + r.nextDouble() * 34.9)
      val (x, y) = psF(lon, lat, epsg)
      val (lon2, lat2) = psI(x, y, epsg)
      assert(math.abs(lon2 - lon) < 1e-8, s"lon $lon -> $lon2 (epsg $epsg)")
      assert(math.abs(lat2 - lat) < 1e-8, s"lat $lat -> $lat2 (epsg $epsg)")
    }
    intercept[Exception] { psF(0.0, 80.0, 32631) }
    intercept[Exception] { psI(0.0, 1000.0, 3857) }
  }

  test("bbox reprojection dispatches to the polar family") {
    val b = Seq((80.0, 72.0, 20.0, 10.0)).toDF("n", "s", "e", "w")
      .select(G.bboxToUtm(G.bbox($"n", $"s", $"e", $"w"), 3413).as("p"))
      .select("p.north", "p.south", "p.east", "p.west")
      .as[(Double, Double, Double, Double)].head()
    assert(b._1 > b._2 && b._3 > b._4)
    for (lon <- Seq(10.0, 20.0); lat <- Seq(72.0, 80.0)) {
      val (x, y) = psF(lon, lat, 3413)
      assert(x >= b._4 - 1e-6 && x <= b._3 + 1e-6)
      assert(y >= b._2 - 1e-6 && y <= b._1 + 1e-6)
    }
  }

  test("bbox reprojection keeps envelope orientation and contains corners") {
    val b = Seq((52.0, 50.0, 2.9, 0.1)).toDF("n", "s", "e", "w")
      .select(G.bboxToUtm(G.bbox($"n", $"s", $"e", $"w"), 32631).as("p"))
      .select("p.north", "p.south", "p.east", "p.west")
      .as[(Double, Double, Double, Double)].head()
    assert(b._1 > b._2 && b._3 > b._4)
    // all four reprojected corners inside the envelope
    for (lon <- Seq(0.1, 2.9); lat <- Seq(50.0, 52.0)) {
      val (x, y) = fwd(lon, lat, 32631)
      assert(x >= b._4 - 1e-6 && x <= b._3 + 1e-6)
      assert(y >= b._2 - 1e-6 && y <= b._1 + 1e-6)
    }
    // unsupported EPSG fails loudly, not silently wrong — including
    // through the codegen path of the scalar expressions (validation
    // lives in ProjImpl, not just nullSafeEval). 27700 moved to the
    // supported set; 2154 (Lambert-93) stays unsupported.
    intercept[Exception] {
      Seq((52.0, 50.0, 2.9, 0.1)).toDF("n", "s", "e", "w")
        .select(G.bboxToUtm(G.bbox($"n", $"s", $"e", $"w"), 2154))
        .collect()
    }
    intercept[Exception] { fwd(3.0, 0.0, 4326) }
    intercept[Exception] { inv(500000.0, 0.0, 27700) }
  }
}
