package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.{GraftFunctions => G}
import graft.operators.IncrementalDedup

/** The q89-pre-flight regime switch inside the incremental near-dup
  * operator (round-7 verdict item 7): the switch must FIRE on a
  * mass-duplicated corpus (replica families → q55 group arm) and must
  * NOT fire on organic data (probe arm, whose output the q105 driver
  * oracle gates). Both regimes are staged synthetically here; the real
  * sf0.001 corpus pins the production decision.
  */
class IncrementalDedupSpec extends SparkSpec {
  import spark.implicits._

  /** (id, text) → exact-dedup'd (sid, ws) sets under `idCol`. */
  private def sets(docs: DataFrame, idCol: String): DataFrame = docs
    .select(col("id"), G.sortedWordSet(col("text")).as("ws"))
    .filter(size(col("ws")) > 0)
    .groupBy("ws").agg(min("id").as(idCol))

  /** A replica of family `f`: its 110-word base vocab minus the word
    * pair encoded by `drop` (d1 ∈ 0..99, d2 ∈ 100..109 ⇒ 1000 DISTINCT
    * 108-word variants; exact dedup keeps them all) at pairwise Jaccard
    * ≥ 106/110 ≈ 0.96 — the mass-dup shape that makes
    * best-match-per-doc family-quadratic.
    */
  private def replica(f: Int, drop: Int): String = {
    val (d1, d2) = (drop % 100, 100 + (drop / 100) % 10)
    (0 until 110).filter(i => i != d1 && i != d2)
      .map(i => s"f${f}w$i").mkString(" ")
  }

  test("mass-dup regime: the pre-flight fires and the group arm answers") {
    // two families × 500 DISTINCT replicas ⇒ estimated candidates per
    // batch set ≈ bands(16) × 500 × collision-rate(≈0.85) ≈ 6800 > 4096
    val corpus = (for (f <- 1 to 2; r <- 0 until 500)
      yield (f * 10000L + r, replica(f, r))).toDF("id", "text")
    val batch = Seq(
      (1L, replica(1, 700)), (2L, replica(1, 701)), (3L, replica(2, 700)))
      .toDF("id", "text")
    val d = IncrementalDedup.auto(
      sets(batch, "nsid"), sets(corpus, "osid"),
      k = 128, bands = 16, jacThreshold = 0.9)
    assert(d.arm == "group",
      s"expected group arm, got ${d.arm} (perBatchSet=${d.perBatchSet})")
    assert(d.perBatchSet > 4096.0)
    val got = d.result.orderBy("nsid")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // family representative = min corpus id of the family
    assert(got.map(x => (x._1, x._2)).toSeq ==
      Seq((1L, 10000L), (2L, 10000L), (3L, 20000L)))
    // replica↔replica of the same 100-word base: jac ≈ 96/100
    got.foreach { case (_, _, jac) => assert(jac > 0.9) }
  }

  test("organic regime: the pre-flight stays on the probe arm") {
    // 40 unrelated corpus docs (disjoint vocab) + one clear near-dup
    // per batch doc — candidates per batch set ≈ bands × 1 ≪ 128.
    val corpus = (0 until 40)
      .map(i => (100L + i, (0 until 30).map(j => s"c${i}t$j").mkString(" ")))
      .toDF("id", "text")
    val batch = Seq(
      (1L, (0 until 29).map(j => s"c5t$j").mkString(" ")),  // ~0.97 to doc 105
      (2L, (0 until 30).map(j => s"b2x$j").mkString(" ")))  // novel
      .toDF("id", "text")
    val d = IncrementalDedup.auto(
      sets(batch, "nsid"), sets(corpus, "osid"),
      k = 128, bands = 16, jacThreshold = 0.9)
    assert(d.arm == "probe",
      s"expected probe arm, got ${d.arm} (perBatchSet=${d.perBatchSet})")
    val got = d.result.collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq == Seq((1L, 105L))) // the novel doc has no match
  }

  test("the real corpus is organic: q105's driver gate rides the probe arm") {
    val dir = "/root/testdata/sf0.001"
    assume(new java.io.File(s"$dir/documents.parquet").exists())
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id").as("id"), col("text"))
    val d = IncrementalDedup.auto(
      sets(docs.filter(col("id") % 10 === 0), "nsid"),
      sets(docs.filter(col("id") % 10 =!= 0), "osid"),
      k = 128, bands = 16, jacThreshold = 0.9)
    assert(d.arm == "probe",
      s"driver corpus flipped to ${d.arm} (perBatchSet=${d.perBatchSet}) — " +
        "q105's all-pairs oracle no longer gates the arm that runs")
  }
}
