package graft.functions.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Geo bbox algebra as Catalyst expressions (SURVEY.md §2.8 C8–C10).
  *
  * The reference parses WKT polygons to lat/lon bounding boxes and back
  * with string handling in Python (eodatadownutils.py:1099-1260 —
  * EDDGeoBBox.parseWKTPolygon / getWKTPolygon) and splits boxes that
  * cross the antimeridian (eodatadownutils.py:1036-1080). Here the bbox
  * is a `struct<north,south,east,west:double>` and the algebra is
  * scalar, deterministic, and null-safe-by-construction (malformed WKT
  * ⇒ null, matching SQL semantics rather than the reference's raised
  * exceptions).
  *
  * These run on small/medium columns (scene footprints), not the bench
  * hot path, so interpreted eval via CodegenFallback is acceptable;
  * the strict-overlap predicate used in joins (SceneQueryOps.bboxOverlap)
  * stays plain `Column` comparisons and is fully codegen'd.
  */
object BBox {
  val dataType: StructType = StructType(Seq(
    StructField("north", DoubleType, nullable = false),
    StructField("south", DoubleType, nullable = false),
    StructField("east", DoubleType, nullable = false),
    StructField("west", DoubleType, nullable = false)))

  private val coordRe = "(-?\\d+(?:\\.\\d+)?(?:[eE][+-]?\\d+)?)\\s+(-?\\d+(?:\\.\\d+)?(?:[eE][+-]?\\d+)?)".r

  /** Parse any WKT containing `lon lat` coordinate pairs (POLYGON,
    * MULTIPOLYGON, LINESTRING…) into the enclosing bbox. Returns null
    * for input with no coordinate pairs.
    */
  def fromWkt(wkt: UTF8String): InternalRow = {
    if (wkt == null) return null
    var n = Double.NegativeInfinity
    var s = Double.PositiveInfinity
    var e = Double.NegativeInfinity
    var w = Double.PositiveInfinity
    var found = false
    val it = coordRe.findAllMatchIn(wkt.toString)
    while (it.hasNext) {
      val m = it.next()
      val lon = java.lang.Double.parseDouble(m.group(1))
      val lat = java.lang.Double.parseDouble(m.group(2))
      found = true
      if (lat > n) n = lat
      if (lat < s) s = lat
      if (lon > e) e = lon
      if (lon < w) w = lon
    }
    if (!found) null else InternalRow(n, s, e, w)
  }

  def toWkt(bbox: InternalRow): UTF8String = {
    val n = bbox.getDouble(0); val s = bbox.getDouble(1)
    val e = bbox.getDouble(2); val w = bbox.getDouble(3)
    UTF8String.fromString(
      s"POLYGON(($w $n, $e $n, $e $s, $w $s, $w $n))")
  }

  /** Equal-slice width split: a box wider than `maxWidth` degrees is
    * split longitudinally into equal slices no wider than maxWidth — a
    * tiling utility, NOT the reference's C9 wrap cut (that is
    * [[cutWrap]]). A box with east < west is returned unsplit.
    */
  def split(bbox: InternalRow, maxWidth: Double): ArrayData = {
    val n = bbox.getDouble(0); val s = bbox.getDouble(1)
    val e = bbox.getDouble(2); val w = bbox.getDouble(3)
    val width = e - w
    if (width <= maxWidth) {
      new GenericArrayData(Array[Any](InternalRow(n, s, e, w)))
    } else {
      val parts = math.ceil(width / maxWidth).toInt
      val step = width / parts
      val out = new Array[Any](parts)
      var i = 0
      while (i < parts) {
        val lo = w + i * step
        val hi = if (i == parts - 1) e else w + (i + 1) * step
        out(i) = InternalRow(n, s, hi, lo)
        i += 1
      }
      new GenericArrayData(out)
    }
  }

  /** C9 wrap cut (eodatadownutils.py getGeoBBoxsCut4LatLonBounds,
    * :1035-1079): a span wider than `thres` degrees is assumed to wrap
    * the world the wrong way, so the COMPLEMENT boxes are emitted —
    * lon parts {[-180, west], [east, 180]} when east−west > thres, lat
    * parts {[north, 90], [−90, south]} when north−south > thres — and
    * when both axes cut, their cross product (4 boxes), exactly the
    * reference's nested emission. Divergence, deliberate: the
    * reference's lat-only branch iterates an empty list and returns NO
    * boxes (violating its own "must have at least 1" contract); here
    * the lat complements still pair with the original lon span. A box
    * with east < west or north < south has non-positive spans, cuts
    * nothing, and is returned as-is.
    */
  def cutWrap(bbox: InternalRow, thres: Double): ArrayData = {
    val n = bbox.getDouble(0); val s = bbox.getDouble(1)
    val e = bbox.getDouble(2); val w = bbox.getDouble(3)
    val lonParts: Seq[(Double, Double)] =
      if (e - w > thres) Seq((-180.0, w), (e, 180.0)) else Seq((w, e))
    val latParts: Seq[(Double, Double)] =
      if (n - s > thres) Seq((n, 90.0), (-90.0, s)) else Seq((s, n))
    new GenericArrayData(
      (for ((lo, hi) <- latParts; (wl, el) <- lonParts)
        yield InternalRow(hi, lo, el, wl): Any).toArray)
  }

  /** Strict open-interval overlap (F7 semantics — shared edges do NOT
    * intersect; eodatadownlandsatgoogsensor.py:2074-2103).
    */
  def intersects(a: InternalRow, b: InternalRow): Boolean = {
    val an = a.getDouble(0); val as = a.getDouble(1)
    val ae = a.getDouble(2); val aw = a.getDouble(3)
    val bn = b.getDouble(0); val bs = b.getDouble(1)
    val be = b.getDouble(2); val bw = b.getDouble(3)
    be > aw && ae > bw && bn > as && an > bs
  }
}

/** `bbox_from_wkt(wkt_string)` → struct<north,south,east,west> or null. */
case class BBoxFromWkt(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = BBox.dataType
  override def nullable: Boolean = true
  override def nullSafeEval(input: Any): Any =
    BBox.fromWkt(input.asInstanceOf[UTF8String])
  override protected def withNewChildInternal(newChild: Expression): BBoxFromWkt =
    copy(child = newChild)
  override def prettyName: String = "bbox_from_wkt"
}

/** `bbox_to_wkt(bbox)` → closed-ring POLYGON WKT string. */
case class BBoxToWkt(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = StringType
  override def nullSafeEval(input: Any): Any =
    BBox.toWkt(input.asInstanceOf[InternalRow])
  override protected def withNewChildInternal(newChild: Expression): BBoxToWkt =
    copy(child = newChild)
  override def prettyName: String = "bbox_to_wkt"
}

/** `bbox_split(bbox, maxWidthDegrees)` → array<bbox> (explode-ready). */
case class BBoxSplit(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(BBox.dataType, containsNull = false)
  override def nullSafeEval(bbox: Any, maxW: Any): Any =
    BBox.split(bbox.asInstanceOf[InternalRow], maxW.asInstanceOf[Double])
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BBoxSplit =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "bbox_split"
}

/** `bbox_cut_wrap(bbox, thresDegrees)` → array<bbox> complement cut. */
case class BBoxCutWrap(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(BBox.dataType, containsNull = false)
  override def nullSafeEval(bbox: Any, thres: Any): Any =
    BBox.cutWrap(bbox.asInstanceOf[InternalRow], thres.asInstanceOf[Double])
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BBoxCutWrap =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "bbox_cut_wrap"
}

/** `bbox_intersects(a, b)` → boolean, strict open-interval overlap. */
case class BBoxIntersects(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = BooleanType
  override def nullSafeEval(a: Any, b: Any): Any =
    BBox.intersects(a.asInstanceOf[InternalRow], b.asInstanceOf[InternalRow])
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BBoxIntersects =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "bbox_intersects"
}
