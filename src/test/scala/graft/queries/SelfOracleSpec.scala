package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.{GraftFunctions => G}

/** Self-oracles for the codegen'd FNV-1a/splitmix64 hash kernels —
  * the THROUGHPUT path of simhash/fingerprint dedup. (The driver
  * queries q31/q32 use an md5-derived hash precisely so DuckDB can
  * mirror the whole pipeline; these tests keep the faster FNV kernels
  * equally verified.)
  *
  *  - banded simhash blocking must equal brute-force all-pairs — not
  *    just on this corpus but ALWAYS: hamming ≤ 3 with 4 disjoint
  *    16-bit bands pigeonholes at least one intact band, so
  *    band-blocking recall is provably 1.0. Comparing the two plans is
  *    therefore an exact oracle computed by a different route.
  *  - hash kernels: per-row recomputation with an independent
  *    test-local reimplementation of the public-domain hash math,
  *    applied via a (test-only) UDF — exercises interpreted-UDF eval
  *    against the codegen'd Catalyst expressions.
  */
class SelfOracleSpec extends SparkSpec {
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"

  test("banded simhash blocking == brute-force all-pairs (FNV kernel path)") {
    val d = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), G.simhash64(G.tokens(col("text"))).as("sh"))
    val banded0 = d.select(col("doc_id"), col("sh"),
      posexplode(array((0 until 4).map(i =>
        col("sh").bitwiseAND(lit(0xffffL << (16 * i)))): _*)))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "bucket")
    val banded = banded0
      .select(col("band"), col("bucket"), col("doc_id").as("doc_a"),
        col("sh").as("sh_a"))
      .join(banded0.select(col("band"), col("bucket"),
        col("doc_id").as("doc_b"), col("sh").as("sh_b")), Seq("band", "bucket"))
      .filter(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b", "sh_a", "sh_b").distinct()
      .withColumn("hamming", G.hamming64(col("sh_a"), col("sh_b")))
      .filter(col("hamming") <= 3)
      .select("doc_a", "doc_b", "hamming")
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
