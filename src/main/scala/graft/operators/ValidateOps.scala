package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-quality constraint checking as dataflow (the Deequ-style
  * validation pass every production ingest runs before publishing a
  * table): declare named checks, evaluate ALL of them in ONE
  * aggregation pass over the table — each check contributes one
  * aggregate expression, so the scan/shuffle cost is a single
  * partial-aggregated job regardless of how many checks run.
  * Referential checks (key containment in another table) are the one
  * exception: each adds one fk-keyed left join, evaluated in the same
  * pass as its metric.
  *
  * Gate semantics: a check whose metric cannot be computed (empty
  * table ⇒ 0/0 ⇒ null) FAILS — `passed` is never null, because the
  * one case a pre-publish gate must catch is "there was no data".
  *
  * Results are a DataFrame (check_name, metric, passed) — the report
  * is data, so it can feed the same sinks/gates as any other table
  * (UsageLog, ReportRegistry, a CI assertion).
  */
object ValidateOps {

  /** One named check: an aggregate metric plus the pass predicate
    * applied to it (metric is always surfaced so a failing report
    * says HOW failing, not just that it failed). Metrics are cast to
    * double when evaluated so heterogeneous checks compose.
    */
  final case class Check(name: String, metric: Column, passes: Column => Column)

  /** EXACT ratio with a NULL (not NaN, not error) result on a zero
    * denominator: Spark 4's ANSI mode throws on integral /0, and a
    * NaN metric would PASS >= gates (NaN sorts above everything in
    * Spark comparisons) — null is the one value `coalesce(passed,
    * false)` handles the way a gate needs.
    *
    * No rounding here: the pass predicate must see the exact metric
    * (one duplicate in >2M rows rounds to 1.000000 at 6dp, and an
    * atLeast=1.0 gate would wave the violation through). Only the
    * REPORTED metric column is rounded, in run()/referential().
    */
  private def ratio(num: Column, den: Column): Column =
    num.cast("double") /
      when(den === 0, lit(null)).otherwise(den).cast("double")

  /** Fraction of non-null values in `c` (completeness). */
  def completeness(name: String, c: Column, atLeast: Double): Check =
    Check(name, ratio(count(c), count(lit(1))), m => m >= atLeast)

  /** distinct/non-null ratio for a key column (1.0 = no duplicate
    * VALUES; nulls are completeness's concern, not uniqueness's —
    * a never-duplicated key with some nulls passes here and fails
    * there, so the report names the actual defect).
    */
  def uniqueness(name: String, c: Column, atLeast: Double): Check =
    Check(name, ratio(countDistinct(c), count(c)), m => m >= atLeast)

  /** Fraction of rows satisfying an arbitrary row predicate. */
  def satisfies(name: String, pred: Column, atLeast: Double): Check =
    Check(name,
      ratio(coalesce(sum(when(pred, 1L).otherwise(0L)), lit(0L)),
        count(lit(1))),
      m => m >= atLeast)

  /** Evaluate every check in one aggregation pass; one row per check.
    * Null metrics (no data) fail. Check names must be unique (they
    * become aggregate aliases); dotted names are handled. `passed` is
    * evaluated on the EXACT metric; the reported `metric` column is
    * rounded to 6dp for stable cross-engine display/hashing.
    */
  def run(df: DataFrame, checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty, "ValidateOps.run: no checks given")
    require(checks.map(_.name).distinct.size == checks.size,
      "ValidateOps.run: duplicate check names")
    def ref(n: String) = col("`" + n + "`")
    val agg = df.agg(
      checks.head.metric.cast("double").as(checks.head.name),
      checks.tail.map(c => c.metric.cast("double").as(c.name)): _*)
    val rows = checks.map { c =>
      struct(lit(c.name).as("check_name"),
        round(ref(c.name), 6).as("metric"),
        coalesce(c.passes(ref(c.name)), lit(false)).as("passed"))
    }
    agg.select(explode(array(rows: _*)).as("r"))
      .select(col("r.check_name"), col("r.metric"), col("r.passed"))
  }

  /** Equi-width histogram (the ANALYZE-style column statistic): the
    * [min, max] range from one aggregation pass splits into `nb`
    * buckets (max lands in the last; a constant column is one bucket
    * 0), then one partial-aggregated groupBy counts each bucket with
    * its observed value bounds. Nulls are excluded — they are a
    * completeness fact, not a value. Two scans total, bounded
    * metadata between them.
    */
  def histogram(df: DataFrame, c: Column, nb: Int): DataFrame = {
    val vals = df.select(c.as("__v")).where(col("__v").isNotNull)
    val bounds = vals.agg(min(col("__v")).as("__mn"), max(col("__v")).as("__mx"))
    vals.crossJoin(broadcast(bounds))
      .withColumn("bucket", when(col("__mx") === col("__mn"), 0L)
        .otherwise(least(lit(nb - 1),
          floor((col("__v") - col("__mn")) /
            ((col("__mx") - col("__mn")) / nb))).cast("long")))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n"),
        round(min(col("__v")), 2).as("lo"),
        round(max(col("__v")), 2).as("hi"))
      .orderBy("bucket")
  }

  /** Referential containment: fraction of child rows whose `fk` exists
    * in `parent`'s `pk`. ONE pass over the child: a left join against
    * the distinct parent keys (broadcast when the parent is a
    * dimension, shuffle otherwise; Catalyst decides) feeding a
    * conditional count — no separate total-count scan. An empty child
    * fails (null metric ⇒ passed false).
    */
  def referential(child: DataFrame, fk: Column, parent: DataFrame,
                  pk: Column, name: String, atLeast: Double): DataFrame =
    child.join(parent.select(pk.as("__pk")).distinct(),
        fk === col("__pk"), "left")
      .agg(ratio(count(col("__pk")), count(lit(1))).as("__m"))
      .select(lit(name).as("check_name"), round(col("__m"), 6).as("metric"),
        coalesce(col("__m") >= atLeast, lit(false)).as("passed"))
}
