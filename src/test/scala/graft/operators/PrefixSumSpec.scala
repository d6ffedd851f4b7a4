package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** groupedPrefixSum must equal the naive single-reducer window form
  * on every row — including groups that span many range partitions,
  * which is the case the two-phase device exists for.
  */
class PrefixSumSpec extends SparkSpec {
  import spark.implicits._

  test("groupedPrefixSum equals the naive window cumsum across partitions") {
    // one dominant group (the "half the corpus is English" shape) +
    // two small ones; values vary so offset mistakes can't cancel
    val rows = (1 to 200).map(i => ("en", i.toLong, (i % 7 + 1).toLong)) ++
      (1 to 5).map(i => ("de", i.toLong, i.toLong)) ++
      (1 to 3).map(i => ("fr", i.toLong, 10L * i))
    val df = rows.toDF("g", "ord", "v").repartition(8)
    val naive = df.withColumn("exp",
      coalesce(sum($"v").over(Window.partitionBy($"g").orderBy($"ord")
        .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
    // partitions=6 forces the 200-row group across several slices
    val fast = RelationalOps.groupedPrefixSum(df, "g", "ord", "v", "got",
      partitions = 6)
    val joined = naive.join(fast, Seq("g", "ord", "v"))
    assert(joined.count() === rows.size)
    assert(joined.filter($"exp" =!= $"got").count() === 0)
  }

  test("groupedPrefixSum is exact for SIGNED values (sweep-line deltas)") {
    // +1/-1 deltas make the running sum non-monotone: the old
    // max(running) per-partition total silently over-counted here
    // (caught by q145's oracle); the sum(value) total must not
    val rows = (1 to 300).map { i =>
      ("t", i.toLong, if (i % 3 == 0) -2L else 1L)
    }
    val df = rows.toDF("g", "ord", "v").repartition(8)
    val naive = df.withColumn("exp",
      coalesce(sum($"v").over(Window.partitionBy($"g").orderBy($"ord")
        .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
    val fast = RelationalOps.groupedPrefixSum(df, "g", "ord", "v", "got",
      partitions = 6)
    val joined = naive.join(fast, Seq("g", "ord", "v"))
    assert(joined.count() === rows.size)
    assert(joined.filter($"exp" =!= $"got").count() === 0)
  }

  test("groupedPrefixSum keeps every input row and column") {
    val df = Seq(("a", 1L, 2L), ("a", 2L, 3L)).toDF("g", "ord", "v")
    val out = RelationalOps.groupedPrefixSum(df, "g", "ord", "v", "cum")
    assert(out.columns.sorted.toSeq === Seq("cum", "g", "ord", "v"))
    assert(out.orderBy("ord").select("cum").as[Long].collect().toSeq ===
      Seq(0L, 2L))
  }

  test("topKPerGroupScalable equals the plain window top-k") {
    // a big group spread over many partitions + a group smaller than k
    val rows = (1 to 500).map(i => ("big", i.toLong)) ++
      (1 to 2).map(i => ("tiny", i.toLong))
    val df = rows.toDF("g", "v").repartition(8)
    val order = Seq($"v".desc, $"g")
    def norm(d: org.apache.spark.sql.DataFrame) =
      d.select("g", "v", "rank").as[(String, Long, Int)].collect().sorted.toSeq
    assert(norm(RelationalOps.topKPerGroupScalable(df, Seq("g"), order, 7)) ===
      norm(RelationalOps.topKPerGroup(df, Seq("g"), order, 7)))
  }
}
