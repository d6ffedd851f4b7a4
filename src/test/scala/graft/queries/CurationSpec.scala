package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, Row}

import graft.{SparkEntry, SparkSpec}

/** Closed-form expectations for the round-5 corpus-curation operators
  * (q70-q76), driven through the exact SparkEntry query functions the
  * driver gate runs, on hand-built tables where the right answer is
  * computable by hand. The DuckDB mirrors re-prove these on the
  * synthetic corpus; these tests pin the SEMANTICS (model math, tie
  * breaks, blocking behavior, strictness edges) on adversarial
  * micro-corpora the synthetic tables don't contain.
  */
class CurationSpec extends SparkSpec {
  import spark.implicits._

  /** Write a documents table into a temp dir and return the dir. */
  private def docsDir(rows: Seq[(Long, String, String, String)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("curation").toString
    rows.toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  private def embDir(rows: Seq[(Long, Array[Float], Int)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("curation").toString
    rows.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    dir
  }

  private def q(name: String, dir: String): DataFrame =
    SparkEntry.queries(name)(spark, dir)

  test("q70 bigram LM: MLE cross-entropy is exact on a hand corpus") {
    // corpus bigrams: doc0 "a a b" -> (a,a),(a,b); doc1 "a b" -> (a,b)
    // counts: c(a,a)=1 c(a,b)=2 c1(a)=3  =>
    //   doc0 xent = -(ln(1/3) + ln(2/3))/2 ; doc1 xent = -ln(2/3)
    val dir = docsDir(Seq(
      (0L, "a a b", "en", "s"), (1L, "a b", "en", "s")))
    val out = q("q70_bigram_lm_score", dir).collect()
    val exp0 = -(math.log(1.0 / 3) + math.log(2.0 / 3)) / 2
    val exp1 = -math.log(2.0 / 3)
    assert(out.map(r => (r.getLong(0), r.getLong(1))).toSeq ===
      Seq((0L, 2L), (1L, 1L)))
    assert(math.abs(out(0).getDouble(2) - exp0) < 1e-6)
    assert(math.abs(out(1).getDouble(2) - exp1) < 1e-6)
  }

  test("q70 bigram LM: single-token and empty docs are excluded") {
    val dir = docsDir(Seq(
      (0L, "solo", "en", "s"), (1L, "a b a b", "en", "s")))
    val ids = q("q70_bigram_lm_score", dir).select("doc_id")
      .as[Long].collect().toSeq
    assert(ids === Seq(1L))
  }

  test("q71 tf-idf: a term present in every doc scores 0; rarer beats common") {
    // 'x' in all 4 docs => idf=0 => never a top term when positives exist.
    // doc0's distinguishing term 'rare' (df=1): score 2*ln(4) tops tf=1
    // common terms.
    val dir = docsDir(Seq(
      (0L, "x rare rare y", "en", "s"), (1L, "x y", "en", "s"),
      (2L, "x y", "en", "s"), (3L, "x z", "en", "s")))
    val out = q("q71_tfidf_topk", dir)
      .filter(col("doc_id") === 0 && col("rank") === 1).collect()
    assert(out.length === 1)
    assert(out(0).getAs[String]("term") === "rare")
    assert(math.abs(out(0).getAs[Double]("score") - 2 * math.log(4.0)) < 1e-5)
    // the everywhere-term scores exactly 0 wherever it appears
    val xs = q("q71_tfidf_topk", dir).filter(col("term") === "x")
      .select("score").as[Double].collect()
    assert(xs.forall(_ === 0.0))
  }

  test("q72 vocab coverage: ranks by count desc then token, cum_cov ends at 1") {
    val dir = docsDir(Seq(
      (0L, "b b b a a c", "en", "s"), (1L, "a", "en", "s")))
    // counts: a=3 b=3 c=1; tie a/b broken by token asc
    val out = q("q72_vocab_coverage", dir).collect()
    assert(out.map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq ===
      Seq((1L, "a", 3L), (2L, "b", 3L), (3L, "c", 1L)))
    val cov = out.map(_.getDouble(3)).toSeq
    assert(cov === cov.sorted)
    assert(math.abs(cov.last - 1.0) < 1e-9)
  }

  test("q73 containment: strict subsets only, 2x size band, doc fan-out") {
    val dir = docsDir(Seq(
      (0L, "a b", "en", "s"),             // ws {a,b}: subset of doc3's set
      (1L, "b a a b", "en", "s"),         // same SET as doc0 -> fans out
      (2L, "a b c", "en", "s"),           // subset of doc3 but 3*2 > 6? sz 3*2=6 == sz_b 6 -> kept
      (3L, "a b c d e f", "en", "s"),     // the container
      (4L, "a z", "en", "s")))            // z not in doc3 -> not contained
    val out = q("q73_subset_containment", dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    // sets {a,b} (docs 0,1) and {a,b,c} (doc 2) are contained in set(doc3);
    // {a,z} is not; doc3 itself is not (equal set excluded by strict size)
    assert(out === Seq((0L, 1L, 3L), (1L, 1L, 3L), (2L, 1L, 3L)))
  }

  /** 16 one-hot 64-dim centroids + crafted tail vectors. */
  private def oneHot(i: Int, extra: Seq[(Int, Float)] = Nil): Array[Float] = {
    val a = Array.fill(64)(0f)
    a(i) = 1f
    extra.foreach { case (j, v) => a(j) = v }
    a
  }

  test("q74 semdedup: near-dups group within a cluster, never across") {
    val base = (0 until 16).map(i => (i.toLong, oneHot(i), i))
    // 16,17 near centroid 3 (same cluster, cos≈1 -> grouped with vec 3);
    // 18 leans to centroid 4 but has cos 0.74 to vec 16 — cross-cluster,
    // so SemDeDup must NOT pair them (that's the blocking semantics).
    val tail = Seq(
      (16L, oneHot(3, Seq(4 -> 0.1f)), 0),
      (17L, oneHot(3, Seq(4 -> 0.12f)), 0),
      (18L, oneHot(4, Seq(3 -> 0.9f)), 0))
    val dir = embDir(base ++ tail)
    val out = q("q74_semdedup_groups", dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))).toMap
    assert(out(3L) === ((3L, 3L, 1L, 2L)))  // {3,16,17}: one group, 2 dropped
    assert(out(4L) === ((2L, 2L, 1L, 1L)))  // {4,18}: one group, 1 dropped
    // every other cluster is a lone centroid: nothing grouped
    ((0 until 16).map(_.toLong).toSet -- Set(3L, 4L)).foreach { c =>
      assert(out(c) === ((1L, 0L, 0L, 0L)))
    }
  }

  test("q75 int8 quantization: error bounded by scale/2, cosine preserved") {
    val dir = "/root/testdata/sf0.001"
    val out = q("q75_quantize_int8", dir).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      // max|x| for these embeddings is ~O(1) => scale ~ 1/127, and the
      // per-component error bound is scale/2 ~ 0.004
      assert(r.getAs[Double]("max_abs_err") < 0.01)
      assert(r.getAs[Double]("avg_cos") > 0.999)
      assert(r.getAs[Double]("avg_l2_err") > 0)
    }
  }

  test("q76 pq/adc: a vector equal to a codebook entry gets its exact distance") {
    // Magnitude-scaled one-hots keep every ADC distinct: vector i has
    // value 1+0.1*i at position i. Vec 20 duplicates codebook vector 5
    // exactly, so its sub-0 code is cid=5 (distance 0) and its zero
    // subvectors code to the zero slices of cid 0 — every looked-up
    // distance except sub 0's is 0, and ADC(20) telescopes to
    // ||q - c5||^2 = 1^2 + 1.5^2 = 3.25 (q = vec 0). Vec 5 itself must
    // land on the identical value, and both fit in the top-10.
    def scaled(i: Int): Array[Float] = {
      val a = Array.fill(64)(0f)
      a(i) = 1f + 0.1f * i
      a
    }
    val base = (0 until 16).map(i => (i.toLong, scaled(i), i))
    val dup = Seq((20L, scaled(5), 0))
    val dir = embDir(base ++ dup)
    val out = q("q76_pq_adc", dir).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(math.abs(out(20L) - 3.25) < 1e-9)
    assert(math.abs(out(5L) - 3.25) < 1e-9)
  }
}
