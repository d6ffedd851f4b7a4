package graft.functions.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Exact rectangle-vs-polygon intersection — the second stage of the
  * reference's spatial join (J2/J3): an R-tree envelope prefilter
  * followed by `poly_bbox.Intersects(geom)` against arbitrary layer
  * polygons (eodatadownutils.py:1839-1868, used by `rm_scns_intersect`,
  * eodatadownlandsatgoogsensor.py:685-732). Here the envelope prefilter
  * is [[BBoxIntersects]] / manifest pruning, and this expression is the
  * exact test.
  *
  * Semantics match OGR `Intersects`: CLOSED — sharing only a boundary
  * point still intersects (unlike the strict-open F7 bbox overlap).
  * Supports POLYGON (with holes, even-odd interior rule) and
  * MULTIPOLYGON; any text whose innermost parenthesized groups are
  * `lon lat` coordinate lists parses — ring nesting carries no meaning
  * under even-odd, so POLYGON holes and MULTIPOLYGON parts are all just
  * rings.
  *
  * Scalar double math only, so the expression stays inside whole-stage
  * codegen via a static call. The WKT parse is memoized per thread
  * (layers have few distinct geometries and arrive via broadcast, so
  * the scene-side inner loop re-sees the same strings).
  */
object PolygonImpl {

  /** Parsed geometry: rings(i) = flat array [x0,y0,x1,y1,...] with the
    * closing vertex dropped if it repeats the first.
    */
  final class Rings(val rings: Array[Array[Double]])

  private val ringRe = "\\(([^()]+)\\)".r
  // One numeric token allows fraction-first ('.5') and explicit '+'
  // forms — a leading-digit-only pattern would match '.5 50' as
  // '5 50' and silently misplace the vertex (round-6 advice; same fix
  // as SceneCatalog.normalizeLayerTo4326's pair rewrite).
  private val numPat = "[-+]?(?:\\d+\\.?\\d*|\\.\\d+)(?:[eE][+-]?\\d+)?"
  private val coordRe = s"($numPat)\\s+($numPat)".r

  def parse(wkt: String): Rings = {
    val rings = ringRe.findAllMatchIn(wkt).flatMap { rm =>
      val pts = coordRe.findAllMatchIn(rm.group(1)).map { m =>
        (java.lang.Double.parseDouble(m.group(1)),
          java.lang.Double.parseDouble(m.group(2)))
      }.toArray
      val trimmed =
        if (pts.length > 1 && pts.head == pts.last) pts.dropRight(1) else pts
      if (trimmed.length >= 3)
        Some(trimmed.flatMap(p => Array(p._1, p._2)))
      else None
    }.toArray
    new Rings(rings)
  }

  // last-N parse cache per thread (broadcast-joined layers are small)
  private val cacheSize = 8
  private val cache = new ThreadLocal[Array[(String, Rings)]] {
    override def initialValue(): Array[(String, Rings)] =
      new Array[(String, Rings)](cacheSize)
  }

  private def parsedCached(wkt: UTF8String): Rings = {
    val key = wkt.toString
    val c = cache.get()
    var i = 0
    while (i < cacheSize) {
      val e = c(i)
      if (e != null && e._1 == key) return e._2
      i += 1
    }
    val r = parse(key)
    // shift-in at front (LRU-ish: recent geometries stay resident)
    var j = cacheSize - 1
    while (j > 0) { c(j) = c(j - 1); j -= 1 }
    c(0) = (key, r)
    r
  }

  /** Even-odd (ray-cast) point-in-polygon over ALL rings: holes and
    * multipolygon parts fall out of the parity rule. Boundary points
    * may land either way — boundary contact is caught separately by the
    * segment tests, which is what makes the overall test closed.
    */
  private def pointInRings(x: Double, y: Double, g: Rings): Boolean = {
    var inside = false
    var r = 0
    while (r < g.rings.length) {
      val ring = g.rings(r)
      val n = ring.length / 2
      var i = 0
      var j = n - 1
      while (i < n) {
        val xi = ring(2 * i); val yi = ring(2 * i + 1)
        val xj = ring(2 * j); val yj = ring(2 * j + 1)
        if ((yi > y) != (yj > y) &&
            x < (xj - xi) * (y - yi) / (yj - yi) + xi) inside = !inside
        j = i
        i += 1
      }
      r += 1
    }
    inside
  }

  private def orient(ax: Double, ay: Double, bx: Double, by: Double,
                     cx: Double, cy: Double): Int = {
    val v = (bx - ax) * (cy - ay) - (by - ay) * (cx - ax)
    if (v > 0.0) 1 else if (v < 0.0) -1 else 0
  }

  private def onSegment(ax: Double, ay: Double, bx: Double, by: Double,
                        px: Double, py: Double): Boolean =
    px >= math.min(ax, bx) && px <= math.max(ax, bx) &&
      py >= math.min(ay, by) && py <= math.max(ay, by)

  /** Segment intersection, touch counts (closed semantics). */
  private def segIntersect(ax: Double, ay: Double, bx: Double, by: Double,
                           cx: Double, cy: Double, dx: Double, dy: Double): Boolean = {
    val o1 = orient(ax, ay, bx, by, cx, cy)
    val o2 = orient(ax, ay, bx, by, dx, dy)
    val o3 = orient(cx, cy, dx, dy, ax, ay)
    val o4 = orient(cx, cy, dx, dy, bx, by)
    if (o1 != o2 && o3 != o4) return true
    (o1 == 0 && onSegment(ax, ay, bx, by, cx, cy)) ||
      (o2 == 0 && onSegment(ax, ay, bx, by, dx, dy)) ||
      (o3 == 0 && onSegment(cx, cy, dx, dy, ax, ay)) ||
      (o4 == 0 && onSegment(cx, cy, dx, dy, bx, by))
  }

  /** Closed rect-vs-geometry intersection:
    *  1. any polygon vertex inside-or-on the rect, or
    *  2. any rect corner strictly inside the polygon interior, or
    *  3. any polygon edge touching/crossing any rect edge.
    *  Covers containment both ways and all boundary-contact cases.
    */
  def rectIntersects(north: Double, south: Double, east: Double, west: Double,
                     g: Rings): Boolean = {
    var r = 0
    while (r < g.rings.length) {
      val ring = g.rings(r)
      val n = ring.length / 2
      var i = 0
      while (i < n) {
        val x = ring(2 * i); val y = ring(2 * i + 1)
        if (x >= west && x <= east && y >= south && y <= north) return true
        i += 1
      }
      r += 1
    }
    if (pointInRings(west, south, g) || pointInRings(west, north, g) ||
        pointInRings(east, south, g) || pointInRings(east, north, g)) return true
    // rect edges as 4 segments vs every ring edge
    r = 0
    while (r < g.rings.length) {
      val ring = g.rings(r)
      val n = ring.length / 2
      var i = 0
      var j = n - 1
      while (i < n) {
        val xi = ring(2 * i); val yi = ring(2 * i + 1)
        val xj = ring(2 * j); val yj = ring(2 * j + 1)
        if (segIntersect(xi, yi, xj, yj, west, south, east, south) ||
            segIntersect(xi, yi, xj, yj, east, south, east, north) ||
            segIntersect(xi, yi, xj, yj, east, north, west, north) ||
            segIntersect(xi, yi, xj, yj, west, north, west, south)) return true
        j = i
        i += 1
      }
      r += 1
    }
    false
  }

  /** Entry point for the expression: bbox struct<north,south,east,west>
    * vs WKT text. Geometry with no valid ring ⇒ false.
    */
  def intersects(bbox: InternalRow, wkt: UTF8String): Boolean = {
    val g = parsedCached(wkt)
    if (g.rings.isEmpty) false
    else rectIntersects(bbox.getDouble(0), bbox.getDouble(1),
      bbox.getDouble(2), bbox.getDouble(3), g)
  }
}

sealed trait PolygonIntersectsLike extends BinaryExpression {
  override def dataType: DataType = BooleanType
  override def nullSafeEval(bbox: Any, wkt: Any): Any =
    PolygonImpl.intersects(bbox.asInstanceOf[InternalRow],
      wkt.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (b, w) => s"graft.functions.expressions.PolygonImpl.intersects($b, $w)")
}

/** `polygon_intersects(bbox, wkt)` → boolean, closed OGC semantics.
  * Under [[graft.plans.ExpandPolygonEnvelope]] a foldable-WKT call is
  * rewritten to closed envelope comparisons AND
  * [[PolygonIntersectsExact]] — the R-tree prefilter derived
  * automatically, with the plain comparisons pushable to the scan.
  */
case class PolygonIntersects(left: Expression, right: Expression)
    extends PolygonIntersectsLike {
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PolygonIntersects =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "polygon_intersects"
}

/** The exact stage the optimizer leaves behind after deriving the
  * envelope — a distinct node so the rewrite is idempotent.
  */
case class PolygonIntersectsExact(left: Expression, right: Expression)
    extends PolygonIntersectsLike {
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PolygonIntersectsExact =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "polygon_intersects_exact"
}
