package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.{GraftFunctions => G}
import graft.functions.expressions.PolygonImpl

/** Exact rect-vs-polygon intersection (J2/J3 second stage). Pins the
  * closed OGC `Intersects` semantics of eodatadownutils.py:1839-1868
  * on the cases where bbox-vs-bbox gives the WRONG answer: envelope
  * corners outside a triangle, rects inside polygon holes, boundary
  * touches, and containment both ways.
  */
class PolygonSpec extends SparkSpec {
  import spark.implicits._

  private val tri = "POLYGON((0 0, 40 0, 0 40, 0 0))"
  // outer square with a square hole in the middle
  private val holed =
    "POLYGON((0 0, 100 0, 100 100, 0 100, 0 0), (40 40, 60 40, 60 60, 40 60, 40 40))"
  private val multi =
    "MULTIPOLYGON(((0 0, 10 0, 10 10, 0 10, 0 0)), ((50 50, 60 50, 60 60, 50 60, 50 50)))"

  private def hit(n: Double, s: Double, e: Double, w: Double, wkt: String): Boolean =
    Seq((n, s, e, w)).toDF("n", "s", "e", "w")
      .select(G.polygonIntersects(G.bbox($"n", $"s", $"e", $"w"), lit(wkt)))
      .as[Boolean].head()

  test("triangle: envelope overlap but exact miss near the hypotenuse") {
    // rect in the triangle's envelope corner, fully past x+y=40
    assert(!hit(39, 35, 39, 35, tri))
    assert(hit(25, 10, 25, 10, tri)) // well inside
    // rect corner exactly ON the hypotenuse, touch only (closed => true)
    assert(hit(30, 20, 30, 20, tri)) // corner (20,20): 20+20=40
    // crossing the hypotenuse
    assert(hit(30, 10, 35, 15, tri))
  }

  test("containment both ways") {
    assert(hit(1000, -1000, 1000, -1000, tri)) // rect contains polygon
    assert(hit(20, 19, 6, 5, holed)) // rect strictly inside polygon ring
  }

  test("holes: even-odd interior") {
    assert(!hit(55, 45, 55, 45, holed)) // fully inside the hole => outside
    assert(hit(55, 45, 65, 45, holed)) // crosses the hole boundary
    // touching the hole boundary from inside the hole (closed semantics)
    assert(hit(50, 41, 50, 40, holed)) // west edge on hole's west edge
    assert(hit(42, 40, 50, 41, holed)) // south edge on hole's south edge
  }

  test("multipolygon: either part intersects") {
    assert(hit(5, 2, 5, 2, multi))
    assert(hit(55, 52, 55, 52, multi))
    assert(!hit(30, 20, 30, 20, multi)) // in the gap between parts
  }

  test("edge touch and degenerate input") {
    assert(hit(5, -5, 0, -10, tri)) // shares only the x=0 edge segment
    assert(!hit(5, 4, -1, -2, tri)) // fully west of the triangle
    assert(!hit(5, 4, 5, 4, "POLYGON EMPTY")) // no ring => false
    assert(!hit(5, 4, 5, 4, "nonsense")) // unparseable => false
  }

  test("property: matches independent SAT oracle on random rects vs convex polygons") {
    val r = new scala.util.Random(3)
    // convex polygons with their SAT data: (wkt, vertices)
    val polys = Seq(
      (tri, Seq((0.0, 0.0), (40.0, 0.0), (0.0, 40.0))),
      ("POLYGON((100 0, 110 10, 100 20, 90 10, 100 0))",
        Seq((100.0, 0.0), (110.0, 10.0), (100.0, 20.0), (90.0, 10.0))))
    // independent implementation: separating-axis test over the rect
    // axes and every polygon edge normal (closed semantics)
    def satIntersects(n: Double, s: Double, e: Double, w: Double,
                      vs: Seq[(Double, Double)]): Boolean = {
      val axes = Seq((1.0, 0.0), (0.0, 1.0)) ++
        vs.indices.map { i =>
          val (x1, y1) = vs(i); val (x2, y2) = vs((i + 1) % vs.length)
          (-(y2 - y1), x2 - x1)
        }
      axes.forall { case (ax, ay) =>
        val rp = Seq(w * ax + s * ay, w * ax + n * ay,
          e * ax + s * ay, e * ax + n * ay)
        val pp = vs.map { case (x, y) => x * ax + y * ay }
        rp.max >= pp.min && pp.max >= rp.min
      }
    }
    val cases = for (_ <- 1 to 120) yield {
      val w = r.nextInt(240) - 120.0; val s = r.nextInt(120) - 60.0
      (s + 1 + r.nextInt(40), s, w + 1 + r.nextInt(40), w)
    }
    for ((n, s, e, w) <- cases; (wkt, vs) <- polys) {
      assert(hit(n, s, e, w, wkt) == satIntersects(n, s, e, w, vs),
        s"rect n=$n s=$s e=$e w=$w vs $wkt")
    }
  }

  test("parser: rings split correctly, closing vertex dropped") {
    val g = PolygonImpl.parse(holed)
    assert(g.rings.length == 2)
    assert(g.rings(0).length == 8) // 4 vertices (closing vertex dropped)
    assert(g.rings(1).length == 8)
    val m = PolygonImpl.parse(multi)
    assert(m.rings.length == 2)
  }
}
