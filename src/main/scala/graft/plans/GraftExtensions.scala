package graft.plans

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{And, Expression, ExpressionInfo, GetStructField, GreaterThan}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

import graft.functions.expressions._

/** Catalyst integration (SURVEY.md §4):
  *
  * 1. SQL function registration — every graft expression becomes
  *    callable from `spark.sql` / `expr(...)`.
  * 2. [[ExpandBBoxIntersects]] optimizer rule — rewrites the
  *    interpreted `bbox_intersects(a, b)` predicate into its four
  *    strict field comparisons when both sides are cheap, which (a)
  *    returns the filter to whole-stage codegen and (b) exposes plain
  *    `>` comparisons on struct fields that Catalyst can push toward
  *    the scan / use for partition pruning — the reference's R-tree
  *    envelope prefilter (eodatadownutils.py:1799-1868), derived
  *    automatically instead of hand-built.
  *
  * Deployment: `--conf spark.sql.extensions=graft.plans.GraftExtensions`
  * at session build, or [[GraftExtensions.install]] on a live session.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.functions.foreach { case (name, info, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info, builder))
    }
    ext.injectOptimizerRule(_ => ExpandBBoxIntersects)
    ext.injectOptimizerRule(_ => ExpandPolygonEnvelope)
  }
}

object GraftExtensions {

  private def info(name: String, usage: String) =
    new ExpressionInfo("graft", null, name, usage, "")

  val functions: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    ("bbox_from_wkt", info("bbox_from_wkt", "parse WKT to bbox struct"),
      (e: Seq[Expression]) => BBoxFromWkt(e.head)),
    ("bbox_to_wkt", info("bbox_to_wkt", "bbox struct to POLYGON WKT"),
      (e: Seq[Expression]) => BBoxToWkt(e.head)),
    ("bbox_split", info("bbox_split", "split bbox into <=maxWidth slices"),
      (e: Seq[Expression]) => BBoxSplit(e(0), e(1))),
    ("bbox_intersects", info("bbox_intersects", "strict bbox overlap"),
      (e: Seq[Expression]) => BBoxIntersects(e(0), e(1))),
    ("simhash64", info("simhash64", "64-bit simhash of token array"),
      (e: Seq[Expression]) => SimHash64(e.head)),
    ("minhash_sig", info("minhash_sig", "k-element minhash signature"),
      (e: Seq[Expression]) => MinHashSignature(e(0), e(1))),
    ("min_ngram_hash", info("min_ngram_hash", "rolling min n-gram hash"),
      (e: Seq[Expression]) => MinNgramHash(e(0), e(1))),
    ("sorted_jaccard", info("sorted_jaccard", "jaccard of sorted distinct arrays"),
      (e: Seq[Expression]) => SortedJaccard(e(0), e(1))),
    ("cosine_sim", info("cosine_sim", "cosine similarity of double arrays"),
      (e: Seq[Expression]) => CosineSimilarity(e(0), e(1))),
    ("json_set_key", info("json_set_key", "set one key in a JSON object, preserving siblings"),
      (e: Seq[Expression]) => JsonSetKey(e(0), e(1), e(2))),
    ("bbox_cut_wrap", info("bbox_cut_wrap", "complement-box wrap cut over threshold"),
      (e: Seq[Expression]) => BBoxCutWrap(e(0), e(1))),
    ("polygon_intersects", info("polygon_intersects", "exact closed rect-vs-polygon test"),
      (e: Seq[Expression]) => PolygonIntersects(e(0), e(1))),
    ("hyperplane_hash", info("hyperplane_hash", "angular LSH signature of double array"),
      (e: Seq[Expression]) => HyperplaneHash(e(0), e(1))),
    ("utm_forward", info("utm_forward", "struct<lon,lat> to UTM struct<easting,northing>"),
      (e: Seq[Expression]) => UtmForward(e(0), e(1))),
    ("utm_inverse", info("utm_inverse", "UTM struct<easting,northing> to struct<lon,lat>"),
      (e: Seq[Expression]) => UtmInverse(e(0), e(1))),
    ("bbox_to_utm", info("bbox_to_utm", "bbox degrees to UTM meters envelope"),
      (e: Seq[Expression]) => BBoxToUtm(e(0), e(1))),
    ("ps_forward", info("ps_forward", "struct<lon,lat> to polar stereographic struct<x,y>"),
      (e: Seq[Expression]) => PsForward(e(0), e(1))),
    ("ps_inverse", info("ps_inverse", "polar stereographic struct<x,y> to struct<lon,lat>"),
      (e: Seq[Expression]) => PsInverse(e(0), e(1))),
    ("ngram_repetition", info("ngram_repetition", "per-row n-gram repetition stats"),
      (e: Seq[Expression]) => NgramRepetition(e(0), e(1))),
    ("first_equal_index", info("first_equal_index", "first index where long arrays agree"),
      (e: Seq[Expression]) => FirstEqualIndex(e(0), e(1))))

  /** Runtime injection into an existing session (tests, notebooks). */
  def install(spark: SparkSession): Unit = {
    functions.foreach { case (name, inf, builder) =>
      spark.sessionState.functionRegistry.registerFunction(
        FunctionIdentifier(name), inf, builder)
    }
    if (!spark.experimental.extraOptimizations.contains(ExpandBBoxIntersects))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ ExpandBBoxIntersects
    if (!spark.experimental.extraOptimizations.contains(ExpandPolygonEnvelope))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ ExpandPolygonEnvelope
  }
}

/** `polygon_intersects(bbox, <foldable wkt>)` → closed envelope
  * comparisons (computed from the literal geometry at plan time) AND
  * `polygon_intersects_exact` — the reference's R-tree envelope
  * prefilter (eodatadownutils.py:1839-1868) derived automatically.
  * The plain `>=`/`<=` on struct fields simplify to attribute
  * comparisons that Catalyst pushes to the parquet scan, while the
  * exact test stays codegen'd behind them in the same filter.
  * Rewriting to the distinct Exact node makes the rule idempotent.
  * Null semantics match under Filter: a null coordinate fails the
  * comparisons, and the expression's null result drops the row too.
  * Unparseable WKT (null envelope) is left untouched — the
  * expression then returns false everywhere, same as before.
  */
object ExpandPolygonEnvelope extends Rule[LogicalPlan] {
  import org.apache.spark.sql.catalyst.expressions.{GreaterThanOrEqual, LessThanOrEqual, Literal}
  import graft.functions.expressions.{BBox, PolygonIntersects, PolygonIntersectsExact}

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case PolygonIntersects(fp, wkt)
          if wkt.foldable && ExpandBBoxIntersects.cheapInput(fp) =>
        val env = BBox.fromWkt(
          wkt.eval().asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
        if (env == null) PolygonIntersectsExact(fp, wkt)
        else {
          def f(i: Int) = GetStructField(fp, i,
            Some(Seq("north", "south", "east", "west")(i)))
          And(
            And(GreaterThanOrEqual(f(2), Literal(env.getDouble(3))),   // east >= env.west
              LessThanOrEqual(f(3), Literal(env.getDouble(2)))),       // west <= env.east
            And(
              And(GreaterThanOrEqual(f(0), Literal(env.getDouble(1))), // north >= env.south
                LessThanOrEqual(f(1), Literal(env.getDouble(0)))),     // south <= env.north
              PolygonIntersectsExact(fp, wkt)))
        }
    }
}

/** `bbox_intersects(a, b)` → four strict `>` comparisons over struct
  * fields (north=0, south=1, east=2, west=3), when both inputs are
  * cheap to duplicate (attributes, literals, or structs thereof).
  * Null semantics match under Filter: any null field ⇒ predicate not
  * true ⇒ row dropped, same as the expression's null result.
  */
object ExpandBBoxIntersects extends Rule[LogicalPlan] {

  /** Cheap-to-duplicate inputs: attributes, literals, structs
    * thereof (shared with ExpandPolygonEnvelope).
    */
  def cheapInput(e: Expression): Boolean = cheap(e)

  private def cheap(e: Expression): Boolean = e match {
    case _: org.apache.spark.sql.catalyst.expressions.AttributeReference => true
    case _ if e.foldable => true
    case c: org.apache.spark.sql.catalyst.expressions.CreateNamedStruct =>
      c.valExprs.forall(cheap)
    case g: GetStructField => cheap(g.child)
    case _ => false
  }

  private val names = Seq("north", "south", "east", "west")

  private def field(e: Expression, i: Int): Expression =
    GetStructField(e, i, Some(names(i)))

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case BBoxIntersects(a, b) if cheap(a) && cheap(b) =>
        And(
          And(GreaterThan(field(b, 2), field(a, 3)),   // b.east > a.west
            GreaterThan(field(a, 2), field(b, 3))),    // a.east > b.west
          And(GreaterThan(field(b, 0), field(a, 1)),   // b.north > a.south
            GreaterThan(field(a, 0), field(b, 1))))    // a.north > b.south
    }
}
