package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.{GraftFunctions => G}

/** Degenerate-bucket guard for the LSH band self-join
  * (ScaleOps.bandedCandidatePairs): an all-identical corpus — the
  * mass-boilerplate pathology of web-scale dedup — must produce a
  * LINEAR number of candidate pairs (star reduction), not the
  * quadratic bucket self-join, while organic buckets below the cap
  * keep exact all-pairs behavior.
  */
class SkewGuardSpec extends SparkSpec {
  import spark.implicits._

  private val (k, bands) = (128, 16)
  private val rows = k / bands

  private def banded(docs: Seq[(Long, String)]) =
    docs.toDF("doc_id", "text")
      .select(col("doc_id"),
        G.minhashSig(G.sortedWordSet(col("text")), k).as("sig"))
      .select(col("doc_id"),
        posexplode(transform(sequence(lit(0), lit(bands - 1)),
          i => xxhash64(i, slice(col("sig"), i * lit(rows) + lit(1), lit(rows))))))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "bucket")

  test("all-identical corpus is star-reduced, not quadratic") {
    val n = 500
    val docs = (0L until n).map(i => (i, "the same boilerplate text again"))
    val pairs = ScaleOps.bandedCandidatePairs(
      banded(docs), Seq("band", "bucket"), "doc_id", bucketCap = 100,
      "doc_a", "doc_b")
    // unguarded would emit n*(n-1)/2 = 124,750 pairs; the guard links
    // every member to the bucket representative: exactly n-1
    assert(pairs.count() == n - 1)
    assert(pairs.agg(min("doc_a"), max("doc_a")).as[(Long, Long)].head() == ((0L, 0L)))
  }

  test("buckets under the cap keep exact all-pairs behavior") {
    val docs = Seq[(Long, String)](
      (1L, "alpha beta gamma delta"), (2L, "alpha beta gamma delta"),
      (3L, "alpha beta gamma delta"), (4L, "totally different words here"))
    val guarded = ScaleOps.bandedCandidatePairs(
      banded(docs), Seq("band", "bucket"), "doc_id", bucketCap = 100,
      "doc_a", "doc_b")
    // 1-2, 1-3, 2-3 co-bucket in every band; doc 4 shares none
    assert(guarded.orderBy("doc_a", "doc_b").as[(Long, Long)].collect()
      .toSeq == Seq((1L, 2L), (1L, 3L), (2L, 3L)))
  }

  test("starReducedBuckets makes cap firings observable") {
    val boiler = (100L until 400L).map(i => (i, "spam spam spam spam spam"))
    val organic = Seq[(Long, String)](
      (1L, "alpha beta gamma delta"), (2L, "alpha beta gamma delta"))
    val b = banded(boiler ++ organic)
    // fired: the boilerplate bucket appears once per band, rep = 100
    val fired = ScaleOps.starReducedBuckets(b, Seq("band", "bucket"),
      "doc_id", bucketCap = 100)
    assert(fired.count() == bands)
    assert(fired.select("bucket_size", "rep_id").distinct()
      .as[(Long, Long)].head() == ((300L, 100L)))
    // cap above every organic bucket: no firings ⇒ pairs == unguarded
    assert(ScaleOps.starReducedBuckets(b, Seq("band", "bucket"),
      "doc_id", bucketCap = 5000).count() == 0)
  }

  test("mixed corpus: pathological group capped, organic pairs intact") {
    val boiler = (100L until 400L).map(i => (i, "spam spam spam spam spam"))
    val organic = Seq[(Long, String)](
      (1L, "alpha beta gamma delta"), (2L, "alpha beta gamma delta"))
    val pairs = ScaleOps.bandedCandidatePairs(
      banded(boiler ++ organic), Seq("band", "bucket"), "doc_id",
      bucketCap = 100, "doc_a", "doc_b")
      .as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L))) // organic pair survives
    // boilerplate contributes exactly 299 star pairs to rep 100
    assert(pairs.count(p => p._1 == 100L) == 299)
    assert(pairs.size == 300)
  }
}
