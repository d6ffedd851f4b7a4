package graft.functions

import scala.util.Random

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.{GraftFunctions => G}

class BBoxSpec extends SparkSpec {
  import spark.implicits._

  private def parseOne(wkt: String): Option[Row] =
    Seq(wkt).toDF("wkt").select(G.bboxFromWkt($"wkt").as("b"))
      .collect().headOption.flatMap(r => Option(r.getStruct(0)))

  test("WKT polygon parses to enclosing bbox") {
    val b = parseOne("POLYGON((10 50, 20 50, 20 40, 10 40, 10 50))").get
    assert(b.getDouble(0) == 50.0 && b.getDouble(1) == 40.0)
    assert(b.getDouble(2) == 20.0 && b.getDouble(3) == 10.0)
  }

  test("MULTIPOLYGON and negative coords parse") {
    val b = parseOne(
      "MULTIPOLYGON(((-170 10, -160 10, -160 -5, -170 -5, -170 10)), ((175 8, 179 8, 179 2, 175 2, 175 8)))").get
    assert(b.getDouble(0) == 10.0 && b.getDouble(1) == -5.0)
    assert(b.getDouble(2) == 179.0 && b.getDouble(3) == -170.0)
  }

  test("malformed WKT yields null, not an exception") {
    assert(parseOne("not a polygon").isEmpty)
  }

  test("wkt -> bbox -> wkt round trip is stable") {
    val wkt = "POLYGON((10.5 50.25, 20.0 50.25, 20.0 40.0, 10.5 40.0, 10.5 50.25))"
    val w2 = Seq(wkt).toDF("wkt")
      .select(G.bboxToWkt(G.bboxFromWkt($"wkt")).as("w2")).as[String].head()
    val b = Seq(w2).toDF("wkt").select(G.bboxFromWkt($"wkt").as("b"))
      .collect().head.getStruct(0)
    assert(b.getDouble(0) == 50.25 && b.getDouble(3) == 10.5)
  }

  private case class Box(n: Double, s: Double, e: Double, w: Double)

  private def randBox(r: Random): Box = {
    val s = -89.0 + r.nextDouble() * 177.0
    val n = s + 0.001 + r.nextDouble() * (89.0 - s - 0.001)
    val w = -179.0 + r.nextDouble() * 357.0
    val e = w + 0.001 + r.nextDouble() * (179.0 - w - 0.001)
    Box(n, s, e, w)
  }

  test("property: split never widens and unions back to the original") {
    val r = new Random(42)
    for (_ <- 1 to 30) {
      val b = randBox(r)
      val maxW = 1.0 + r.nextDouble() * 29.0
      val parts = Seq((b.n, b.s, b.e, b.w)).toDF("n", "s", "e", "w")
        .select(explode(G.bboxSplit(G.bbox($"n", $"s", $"e", $"w"), maxW)).as("p"))
        .select("p.north", "p.south", "p.east", "p.west")
        .collect()
        .map(x => Box(x.getDouble(0), x.getDouble(1), x.getDouble(2), x.getDouble(3)))
      parts.foreach { p =>
        assert(p.e - p.w <= maxW + 1e-9)
        assert(p.n == b.n && p.s == b.s && p.w >= b.w - 1e-9 && p.e <= b.e + 1e-9)
      }
      assert(math.abs(parts.map(_.w).min - b.w) < 1e-9)
      assert(math.abs(parts.map(_.e).max - b.e) < 1e-9)
      val sorted = parts.sortBy(_.w)
      sorted.sliding(2).foreach {
        case Array(a, c) => assert(math.abs(a.e - c.w) < 1e-9)
        case _ =>
      }
    }
  }

  test("wrap cut: complement boxes per axis, cross product when both") {
    def cut(n: Double, s: Double, e: Double, w: Double): Seq[(Double, Double, Double, Double)] =
      Seq((n, s, e, w)).toDF("n", "s", "e", "w")
        .select(explode(G.bboxCutWrap(G.bbox($"n", $"s", $"e", $"w"), 90.0)).as("p"))
        .select("p.north", "p.south", "p.east", "p.west")
        .collect()
        .map(r => (r.getDouble(0), r.getDouble(1), r.getDouble(2), r.getDouble(3)))
        .toSeq.sortBy(b => (b._4, b._2))
    // narrow box: unchanged
    assert(cut(10, 0, 30, 20) == Seq((10.0, 0.0, 30.0, 20.0)))
    // wide box (wraps E/W): complements [-180,w] and [e,180]
    assert(cut(10, 0, 170, -150) ==
      Seq((10.0, 0.0, -150.0, -180.0), (10.0, 0.0, 180.0, 170.0)))
    // tall box (wraps N/S): complements [n,90] and [-90,s] over the
    // original lon span (the reference's lat-only branch returns an
    // EMPTY list — a latent bug its own docstring contradicts; pinned
    // here as fixed, see BBox.cutWrap)
    assert(cut(85, -85, 30, 20) ==
      Seq((-85.0, -90.0, 30.0, 20.0), (90.0, 85.0, 30.0, 20.0)))
    // both: 2x2 cross product
    val both = cut(85, -85, 170, -150)
    assert(both.size == 4)
    assert(both.toSet == Set(
      (90.0, 85.0, -150.0, -180.0), (-85.0, -90.0, -150.0, -180.0),
      (90.0, 85.0, 180.0, 170.0), (-85.0, -90.0, 180.0, 170.0)))
    // east<west (already wrapped form): non-positive span, returned as-is
    assert(cut(10, 0, -170, 170) == Seq((10.0, 0.0, -170.0, 170.0)))
  }

  test("web-mercator reprojection: known values and roundtrip") {
    // known anchors: (0,0) -> (0,0); lon 180 -> 20037508.34; lat 45 -> 5621521.49
    val known = Seq(1).toDF("x").select(
      G.mercX(lit(180.0)).as("x180"), G.mercY(lit(0.0)).as("y0"),
      G.mercY(lit(45.0)).as("y45"))
      .collect().head
    assert(math.abs(known.getDouble(0) - 20037508.342789244) < 1e-6)
    assert(math.abs(known.getDouble(1)) < 1e-9)
    assert(math.abs(known.getDouble(2) - 5621521.486192335) < 1e-6)
    // property: bbox roundtrip within the mercator domain
    val r = new Random(11)
    (1 to 40).foreach { _ =>
      val b = randBox(r)
      val back = Seq((b.n, b.s, b.e, b.w)).toDF("n", "s", "e", "w")
        .select(G.bboxFromWebMercator(
          G.bboxToWebMercator(G.bbox($"n", $"s", $"e", $"w"))).as("b"))
        .select("b.north", "b.south", "b.east", "b.west")
        .collect().head
      assert(math.abs(back.getDouble(0) - math.max(-85.051129, math.min(85.051129, b.n))) < 1e-9)
      assert(math.abs(back.getDouble(1) - math.max(-85.051129, math.min(85.051129, b.s))) < 1e-9)
      assert(math.abs(back.getDouble(2) - b.e) < 1e-9)
      assert(math.abs(back.getDouble(3) - b.w) < 1e-9)
    }
  }

  test("property: intersects is symmetric; strict on shared edges") {
    val r = new Random(7)
    val pairs = (1 to 40).map(_ => (randBox(r), randBox(r)))
    val df = pairs.map { case (a, b) => (a.n, a.s, a.e, a.w, b.n, b.s, b.e, b.w) }
      .toDF("an", "as", "ae", "aw", "bn", "bs", "be", "bw")
      .select(
        G.bboxIntersects(G.bbox($"an", $"as", $"ae", $"aw"),
          G.bbox($"bn", $"bs", $"be", $"bw")).as("ab"),
        G.bboxIntersects(G.bbox($"bn", $"bs", $"be", $"bw"),
          G.bbox($"an", $"as", $"ae", $"aw")).as("ba"))
    df.collect().foreach(x => assert(x.getBoolean(0) == x.getBoolean(1)))
    // shared edge: east of A == west of B -> strictly NOT intersecting (F7)
    val shared = Seq(1).toDF("x").select(
      G.bboxIntersects(
        G.bbox(lit(10.0), lit(0.0), lit(20.0), lit(0.0)),
        G.bbox(lit(10.0), lit(0.0), lit(40.0), lit(20.0))).as("i"))
      .collect().head
    assert(!shared.getBoolean(0))
  }
}
