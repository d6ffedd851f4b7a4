package graft.queries

import graft.SparkSpec
import graft.SparkEntry

/** Plan-shape regression guards: the properties that make these
  * queries scale (pushdown, pruning, broadcast) must survive
  * refactors. Asserting on the formatted physical plan of the actual
  * driver-checked queries at sf0.001.
  */
class PlanQualitySpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def plan(q: String): String = {
    val df = SparkEntry.queries(q)(spark, dir)
    df.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
  }

  test("q02 work-list: filters pushed to the parquet scan") {
    val p = plan("q02_work_list")
    assert(p.contains("PushedFilters:"), p)
    assert(p.contains("IsNotNull(o_orderdate)") ||
      p.contains("GreaterThanOrEqual(o_orderdate"), p)
    // column pruning: only the needed columns are read
    assert(p.contains("o_orderkey") && !p.contains("o_orderpriority"), p)
  }

  test("q03 revenue join: dimension side broadcast, fact scan pruned") {
    val p = plan("q03_revenue_by_nation")
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastExchange"), p)
    assert(p.contains("ReadSchema: struct<l_orderkey:bigint,l_extendedprice:double,l_discount:double>"), p)
  }

  test("q01 agg: partial aggregation before the exchange") {
    val p = plan("q01_pricing_summary")
    assert(p.contains("HashAggregate"), p)
    // partial + final pair means map-side combine happens
    assert("HashAggregate".r.findAllIn(p).length >= 2, p)
  }

  test("q07 pagination: global limit planned, not a full materialize") {
    val p = plan("q07_pagination")
    assert(p.contains("GlobalLimit") || p.contains("TakeOrdered"), p)
  }

  test("q33 knn: broadcast of the query vector, single scan") {
    val p = plan("q33_knn_cosine")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"), p)
    assert(p.contains("TakeOrderedAndProject") || p.contains("GlobalLimit"), p)
  }

  test("q30 LSH: all joins broadcast, no shuffle beyond dedup + sort") {
    val p = plan("q30_minhash_lsh_pairs")
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"), p)
    // the band self-join and both verify join-backs build broadcast sides
    assert("BroadcastHashJoin".r.findAllIn(p).length >= 3, p)
    // exactly 2 non-broadcast exchanges: pair-dedup aggregate + final sort
    assert("(?m)^\\s*\\(\\d+\\) Exchange".r.findAllIn(p).length <= 2, p)
  }

  test("whole-stage codegen covers the custom expressions") {
    import org.apache.spark.sql.execution.WholeStageCodegenExec
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    val df = SparkEntry.queries("q29_jaccard_pairs")(spark, dir)
    df.collect() // finalize the adaptive plan
    val exec = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    // AQE nests subtrees inside query stages (not `children`), so
    // assert on the rendered plan: `*(n)` marks a whole-stage-codegen
    // operator, and sorted_jaccard must appear on a starred line
    // (here it is even pushed into the BroadcastHashJoin condition).
    val lines = exec.toString.linesIterator.toSeq
    assert(lines.exists(_.contains("*(")), exec.toString)
    assert(lines.exists(l => l.contains("*(") && l.contains("sorted_jaccard")),
      exec.toString)
  }
}
