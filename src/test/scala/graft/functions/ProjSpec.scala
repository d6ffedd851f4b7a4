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
    // lives in ProjImpl, not just nullSafeEval)
    intercept[Exception] {
      Seq((52.0, 50.0, 2.9, 0.1)).toDF("n", "s", "e", "w")
        .select(G.bboxToUtm(G.bbox($"n", $"s", $"e", $"w"), 27700))
        .collect()
    }
    intercept[Exception] { fwd(3.0, 0.0, 4326) }
    intercept[Exception] { inv(500000.0, 0.0, 27700) }
  }
}
