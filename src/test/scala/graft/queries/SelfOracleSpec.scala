package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.SparkEntry
import graft.functions.{GraftFunctions => G}

/** Self-oracles for the two driver queries whose hash functions
  * (FNV-1a / splitmix64) are not reproducible in DuckDB SQL, so the
  * driver records only a rows-only check (COVERAGE.md §7.2):
  *
  *  - q31 (simhash pairs): the banded plan must equal brute-force
  *    all-pairs — not just on this corpus but ALWAYS: hamming ≤ 3 with
  *    4 disjoint 16-bit bands pigeonholes at least one intact band, so
  *    band-blocking recall is provably 1.0. Comparing the two plans is
  *    therefore an exact oracle computed by a different route.
  *  - q31/q32 hash kernels: per-row recomputation with an independent
  *    test-local reimplementation of the public-domain hash math,
  *    applied via a (test-only) UDF — exercises interpreted-UDF eval
  *    against the codegen'd Catalyst expressions.
  */
class SelfOracleSpec extends SparkSpec {
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"

  test("q31 banded simhash pairs == brute-force all-pairs plan") {
    val banded = SparkEntry.queries("q31_simhash_pairs")(spark, sfDir)
    val d = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), G.simhash64(G.tokens(col("text"))).as("sh"))
    val a = d.select(col("doc_id").as("doc_a"), col("sh").as("sh_a"))
    val b = d.select(col("doc_id").as("doc_b"), col("sh").as("sh_b"))
    val brute = a.crossJoin(b)
      .filter(col("doc_a") < col("doc_b"))
      .withColumn("hamming", G.hamming64(col("sh_a"), col("sh_b")))
      .filter(col("hamming") <= 3)
      .select("doc_a", "doc_b", "hamming")
    assert(banded.exceptAll(brute).isEmpty && brute.exceptAll(banded).isEmpty)
    assert(brute.count() > 0) // corpus actually exercises the pair path
  }

  test("simhash64 expression matches independent reimplementation") {
    val sim = udf(RefHashes.simhash _)
    val bad = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(G.simhash64(G.tokens(col("text"))).as("expr"),
        sim(G.tokens(col("text"))).as("ref"))
      .filter(col("expr") =!= col("ref")).count()
    assert(bad == 0)
  }

  test("fingerprintMinNgram expression matches independent reimplementation") {
    val fp = udf((t: Seq[String]) => RefHashes.minNgram(t, 3))
    val bad = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(G.fingerprintMinNgram(G.tokens(col("text")), 3).as("expr"),
        fp(G.tokens(col("text"))).as("ref"))
      .filter(col("expr") =!= col("ref")).count()
    assert(bad == 0)
  }
}

/** Independent reimplementation of the hash pipeline (public-domain
  * FNV-1a + splitmix64), deliberately written in a different style from
  * graft.functions.expressions.HashImpl. Top-level so UDF closures
  * don't capture the (non-serializable) suite instance.
  */
object RefHashes extends Serializable {
  def fnv(s: String): Long =
    s.getBytes("UTF-8").foldLeft(0xcbf29ce484222325L)((h, b) =>
      (h ^ (b & 0xffL)) * 0x100000001b3L)

  def mix(x0: Long): Long = {
    val x = x0 + 0x9e3779b97f4a7c15L
    val a = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
    val c = (a ^ (a >>> 27)) * 0x94d049bb133111ebL
    c ^ (c >>> 31)
  }

  def simhash(tokens: Seq[String]): Long = {
    val tally = tokens.map(fnv).foldLeft(Vector.fill(64)(0)) { (acc, h) =>
      acc.zipWithIndex.map { case (c, b) =>
        if (((h >>> b) & 1L) == 1L) c + 1 else c - 1
      }
    }
    tally.zipWithIndex.filter(_._1 > 0).map(p => 1L << p._2)
      .foldLeft(0L)(_ | _)
  }

  def minNgram(tokens: Seq[String], n: Int): Long =
    if (tokens.length < n) 0L
    else tokens.map(fnv).sliding(n).map(w =>
      mix(w.foldLeft(0xcbf29ce484222325L)((h, t) =>
        h * 0x100000001b3L + t))).min
}
