package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.{GraftFunctions => G}

class VectorSpec extends SparkSpec {
  import spark.implicits._

  test("cosine similarity known values") {
    val df = Seq(
      (Array(1.0f, 0.0f), Array(0.0f, 1.0f)), // orthogonal -> 0
      (Array(1.0f, 2.0f), Array(2.0f, 4.0f)), // parallel -> 1
      (Array(1.0f, 0.0f), Array(-1.0f, 0.0f)), // opposite -> -1
      (Array(0.0f, 0.0f), Array(1.0f, 1.0f))) // zero vec -> 0
      .toDF("a", "b")
      .select(round(G.cosineSim($"a", $"b"), 9).as("c"))
    val r = df.as[Double].collect()
    assert(r.sameElements(Array(0.0, 1.0, -1.0, 0.0)))
  }

  test("cosine expression matches HOF composition") {
    val hof = (a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) => {
      val ad = a.cast("array<double>")
      val bd = b.cast("array<double>")
      val dot = aggregate(zip_with(ad, bd, (x, y) => x * y), lit(0.0), (s, x) => s + x)
      val na = sqrt(aggregate(ad, lit(0.0), (s, x) => s + x * x))
      val nb = sqrt(aggregate(bd, lit(0.0), (s, x) => s + x * x))
      dot / (na * nb)
    }
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .limit(50).cache()
    val q = emb.filter($"vec_id" === 0).select($"embedding".as("qv"))
    val joined = emb.crossJoin(q)
    val diff = joined.select(
      abs(G.cosineSim($"embedding", $"qv") - hof($"embedding", $"qv")).as("d"))
      .agg(max("d")).as[Double].head()
    assert(diff < 1e-9)
  }
}
