package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.{GraftFunctions => G}

class TextHashSpec extends SparkSpec {
  import spark.implicits._

  test("simhash is deterministic and identical docs collide") {
    val df = Seq("the quick brown fox", "the quick brown fox",
      "the quick brown foxes").toDF("text")
      .select(G.simhash64(G.tokens($"text")).as("h"))
    val hs = df.as[Long].collect()
    assert(hs(0) == hs(1))
    // one changed token moves few bits
    assert(java.lang.Long.bitCount(hs(0) ^ hs(2)) < 20)
  }

  test("hamming64 counts differing bits") {
    val r = Seq((0L, -1L), (5L, 4L)).toDF("a", "b")
      .select(G.hamming64($"a", $"b").as("d")).as[Int].collect()
    assert(r.sameElements(Array(64, 1)))
  }

  test("minhash signature approximates jaccard") {
    val docs = Seq(
      ("a", "w1 w2 w3 w4 w5 w6 w7 w8"),
      ("b", "w1 w2 w3 w4 w5 w6 w7 w9"), // jaccard 7/9 ≈ 0.78
      ("c", "x1 x2 x3 x4 x5 x6 x7 x8")) // jaccard 0 vs a
    val k = 128
    val sigs = docs.toDF("id", "text")
      .select($"id", G.minhashSig(G.tokens($"text"), k).as("sig"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    def est(x: Seq[Long], y: Seq[Long]): Double =
      x.zip(y).count { case (a, b) => a == b }.toDouble / k
    assert(math.abs(est(sigs("a"), sigs("b")) - 7.0 / 9.0) < 0.15)
    assert(est(sigs("a"), sigs("c")) < 0.05)
    assert(est(sigs("a"), sigs("a")) == 1.0)
  }

  test("word shingles") {
    val r = Seq("a b c d").toDF("t")
      .select(G.wordShingles(G.tokens($"t"), 2).as("s"))
      .as[Seq[String]].head()
    assert(r == Seq("a b", "b c", "c d"))
    val short = Seq("a").toDF("t")
      .select(G.wordShingles(G.tokens($"t"), 3).as("s"))
      .as[Seq[String]].head()
    assert(short.isEmpty)
  }

  test("bpe-ish token count splits words and punctuation") {
    val r = Seq("Hello, world! it's 42").toDF("t")
      .select(G.tokenCountBpe($"t").as("n")).as[Int].head()
    // Hello , world ! it ' s 42
    assert(r == 8)
  }

  test("stopword ratio and quality score bounded") {
    val sw = Seq("the", "a", "of")
    val r = Seq("the cat sat on a mat of straw").toDF("t")
      .select(
        G.stopwordRatio(G.tokens($"t"), sw).as("r"),
        G.qualityScore($"t", sw).as("q"))
      .collect().head
    assert(math.abs(r.getDouble(0) - 3.0 / 8.0) < 1e-9)
    assert(r.getDouble(1) >= 0.0 && r.getDouble(1) <= 1.0)
  }

  test("langIdNgram picks argmax profile, und when no match") {
    val profiles = Map(
      "en" -> Seq("the", "and", "of"),
      "es" -> Seq("el", "la", "de"),
      "de" -> Seq("der", "und", "das"))
    val df = Seq("the cat and the hat", "el gato de la casa", "zzz qqq")
      .toDF("t").select(G.langIdNgram(G.tokens($"t"), profiles).as("l"))
    assert(df.as[String].collect().sameElements(Array("en", "es", "und")))
  }

  test("ngramRepetition: totals, distinct, top, short-text zero") {
    val r = Seq("a b a b c", "x y", "solo")
      .toDF("t")
      .select(G.ngramRepetition(G.tokens($"t"), 2).as("r"))
      .select("r.n_grams", "r.n_distinct", "r.top_n")
      .as[(Long, Long, Long)].collect()
    // "a b a b c": grams [a b, b a, a b, b c] -> 4 total, 3 distinct, top 2
    assert(r(0) == ((4L, 3L, 2L)))
    assert(r(1) == ((1L, 1L, 1L)))
    assert(r(2) == ((0L, 0L, 0L))) // fewer than n tokens
  }

  test("firstEqualIndex finds the first agreeing band, -1 if none") {
    val r = Seq(
      (Seq(1L, 2L, 3L), Seq(9L, 2L, 3L)), // first match at 1
      (Seq(1L, 2L), Seq(1L, 2L)), // match at 0
      (Seq(1L, 2L), Seq(3L, 4L)), // none
      (Seq(1L, 2L, 3L), Seq(9L, 9L, 9L, 9L))) // length mismatch, none
      .toDF("a", "b")
      .select(G.firstEqualIndex($"a", $"b").as("i")).as[Int].collect()
    assert(r.sameElements(Array(1, 0, -1, -1)))
  }

  test("fingerprint: deterministic, min-over-windows, short-text zero") {
    val base = "alpha beta gamma delta epsilon zeta eta theta"
    val superset = base + " iota kappa lambda"
    val df = Seq(base, base, superset, "one two").toDF("t")
      .select(G.fingerprintMinNgram(G.tokens($"t"), 3).as("f"))
    val fs = df.as[Long].collect()
    assert(fs(0) == fs(1)) // deterministic
    // superset of windows -> min can only stay or decrease
    assert(fs(2) <= fs(0))
    assert(fs(3) == 0L) // fewer than n tokens
  }
}
