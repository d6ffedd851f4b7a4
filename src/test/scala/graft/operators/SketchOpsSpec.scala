package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.SketchOps.MisraGries

/** Misra-Gries heavy-hitter sketch: the candidate-completeness
  * guarantee (every item with count > n/(k+1) survives) must hold
  * under Spark's partial-aggregation merge tree, at ANY partition
  * count — that is what q93's exact verify stands on.
  */
class SketchOpsSpec extends SparkSpec {
  import spark.implicits._

  // skewed stream: "hot" 40%, "warm" 20%, 40 distinct cold fillers
  private val stream: Seq[String] = {
    val hot = Seq.fill(400)("hot")
    val warm = Seq.fill(200)("warm")
    val cold = (0 until 400).map(i => s"cold${i % 40}")
    // deterministic interleave (sketch state depends on order within
    // a partition; the GUARANTEE must not)
    (hot ++ warm ++ cold).zipWithIndex
      .sortBy { case (_, i) => (i * 2654435761L) % 1000 }.map(_._1)
  }

  for (parts <- Seq(1, 4, 32))
    test(s"candidates cover every true heavy hitter across $parts partitions") {
      val k = 8 // n=1000: guarantee covers count > 1000/9 ≈ 111
      val mg = udaf(new MisraGries(k))
      val cand = stream.toDF("w").repartition(parts)
        .agg(mg(col("w"))).head().getMap[String, Long](0)
      assert(cand.size <= k, s"state exceeded k: $cand")
      assert(cand.contains("hot") && cand.contains("warm"), cand.toString)
    }

  test("reduce decrement path bounds the state at k on all-distinct input") {
    val mg = udaf(new MisraGries(4))
    val cand = (0 until 100).map(i => s"u$i").toDF("w").coalesce(1)
      .agg(mg(col("w"))).head().getMap[String, Long](0)
    assert(cand.size <= 4)
  }

  test("sketch-then-verify equals brute force on the driver corpus") {
    val dir = "/root/testdata/sf0.001"
    val got = graft.SparkEntry.queries("q93_heavy_hitters")(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val words = spark.read.parquet(s"$dir/documents.parquet")
      .select(explode(graft.functions.GraftFunctions.tokens(col("text")))
        .as("w"))
    val total = words.count()
    val brute = words.groupBy("w").count()
      .filter(col("count") * 40 > total)
      .orderBy("w")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got === brute)
    assert(brute.nonEmpty, "corpus has no heavy hitters at k=40 — dead test")
  }
}
