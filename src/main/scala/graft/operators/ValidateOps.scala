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
  * exception: each adds one anti-join, keyed by the foreign key.
  *
  * Results are a DataFrame (check, metric, passed) — the report is
  * data, so it can feed the same sinks/gates as any other table
  * (UsageLog, ReportRegistry, a CI assertion).
  */
object ValidateOps {

  /** One named check: an aggregate metric plus the pass predicate
    * applied to it (metric is always surfaced so a failing report
    * says HOW failing, not just that it failed).
    */
  final case class Check(name: String, metric: Column, passes: Column => Column)

  /** Fraction of non-null values in `c` (completeness). */
  def completeness(name: String, c: Column, atLeast: Double): Check =
    Check(name,
      round(count(c).cast("double") / count(lit(1)), 6),
      m => m >= atLeast)

  /** distinct/total ratio for a key column (1.0 = unique). */
  def uniqueness(name: String, c: Column, atLeast: Double): Check =
    Check(name,
      round(countDistinct(c).cast("double") / count(lit(1)), 6),
      m => m >= atLeast)

  /** Fraction of rows satisfying an arbitrary row predicate. */
  def satisfies(name: String, pred: Column, atLeast: Double): Check =
    Check(name,
      round(sum(when(pred, 1L).otherwise(0L)).cast("double") /
        count(lit(1)), 6),
      m => m >= atLeast)

  /** Evaluate every check in one aggregation pass; one row per check. */
  def run(df: DataFrame, checks: Seq[Check]): DataFrame = {
    val agg = df.agg(checks.head.metric.as(checks.head.name),
      checks.tail.map(c => c.metric.as(c.name)): _*)
    val rows = checks.map { c =>
      struct(lit(c.name).as("check_name"), col(c.name).as("metric"),
        c.passes(col(c.name)).as("passed"))
    }
    agg.select(explode(array(rows: _*)).as("r"))
      .select(col("r.check_name"), col("r.metric"), col("r.passed"))
  }

  /** Equi-width histogram (the ANALYZE-style column statistic): the
    * [min, max] range from one aggregation pass splits into `nb`
    * buckets (max lands in the last), then one partial-aggregated
    * groupBy counts each bucket with its observed value bounds. Two
    * scans total, bounded metadata between them.
    */
  def histogram(df: DataFrame, c: Column, nb: Int): DataFrame = {
    val bounds = df.agg(min(c).as("__mn"), max(c).as("__mx"))
    df.select(c.as("__v")).crossJoin(broadcast(bounds))
      .withColumn("bucket", least(lit(nb - 1),
        floor((col("__v") - col("__mn")) /
          ((col("__mx") - col("__mn")) / nb))).cast("long"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n"),
        round(min(col("__v")), 2).as("lo"),
        round(max(col("__v")), 2).as("hi"))
      .orderBy("bucket")
  }

  /** Referential containment: fraction of child rows whose `fk` exists
    * in `parent`'s `pk` (anti-join keyed by the fk — broadcast when
    * the parent is a dimension, shuffle otherwise; Catalyst decides).
    */
  def referential(child: DataFrame, fk: Column, parent: DataFrame,
                  pk: Column, name: String, atLeast: Double): DataFrame = {
    val total = child.agg(count(lit(1)).as("total"))
    val orphans = child.join(parent.select(pk.as("__pk")).distinct(),
        fk === col("__pk"), "left_anti")
      .agg(count(lit(1)).as("orphans"))
    orphans.crossJoin(total)
      .select(lit(name).as("check_name"),
        round((col("total") - col("orphans")).cast("double") /
          col("total"), 6).as("metric"))
      .select(col("check_name"), col("metric"), (col("metric") >= atLeast)
        .as("passed"))
  }
}
