package graft.functions.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Hot-path hash/vector expressions with real codegen: `doGenCode`
  * emits a static call into [[HashImpl]] / [[VectorImpl]], so the
  * expressions stay inside whole-stage codegen (no boxing, no
  * interpreted eval) — these run per-row over the full documents /
  * embeddings tables at 100 TB scale.
  */
object HashImpl {
  /** FNV-1a 64-bit over UTF-8 bytes — public-domain hash, stable
    * across JVMs (no object hashCode involvement).
    */
  def fnv1a64(bytes: Array[Byte]): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xffL)
      h *= 0x100000001b3L
      i += 1
    }
    h
  }

  /** SimHash over a token array: per-token 64-bit hash votes ±1 on each
    * bit position; the sign of each tally sets the output bit
    * (Charikar 2002 — near-identical token multisets land within a few
    * bits of Hamming distance).
    */
  def simhash(tokens: ArrayData): Long = {
    val counts = new Array[Int](64)
    val n = tokens.numElements()
    var i = 0
    while (i < n) {
      if (!tokens.isNullAt(i)) {
        val h = fnv1a64(tokens.getUTF8String(i).getBytes)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (counts(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  /** splitmix64 finalizer (public-domain, Steele et al. 2014): a strong
    * 64-bit mixer used to derive the k MinHash functions from one base
    * hash. A plain seeded-FNV family is NOT min-wise independent (the
    * seed only shifts the init state, largely preserving hash order
    * across seeds, which collapses the Jaccard estimate); mixing
    * `base ^ seed_j` through splitmix64 gives effectively independent
    * permutations.
    */
  def splitmix64(x0: Long): Long = {
    var x = x0 + 0x9e3779b97f4a7c15L
    x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
    x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
    x ^ (x >>> 31)
  }

  /** Rolling n-gram fingerprint (winnowing-lite): min over all n-token
    * windows of a polynomial combination of per-token FNV hashes. Each
    * token is hashed once; windows combine hashes arithmetically — one
    * pass, no string re-concatenation per window (the compose-built-in
    * form via transform+slice+array_join is interpreted and allocates
    * per window). Returns 0 for fewer than n tokens.
    */
  def minNgramHash(tokens: ArrayData, n: Int): Long = {
    val cnt = tokens.numElements()
    if (cnt < n) return 0L
    val hs = new Array[Long](cnt)
    var i = 0
    while (i < cnt) {
      hs(i) = if (tokens.isNullAt(i)) 0L
        else fnv1a64(tokens.getUTF8String(i).getBytes)
      i += 1
    }
    var best = Long.MaxValue
    i = 0
    while (i <= cnt - n) {
      var h = 0xcbf29ce484222325L
      var j = 0
      while (j < n) {
        h = h * 0x100000001b3L + hs(i + j)
        j += 1
      }
      val mixed = splitmix64(h)
      if (mixed < best) best = mixed
      i += 1
    }
    best
  }

  /** MinHash signature: element j = min over tokens of
    * splitmix64(fnv1a64(token) ^ seed_j). One byte-scan per token, k
    * cheap mixes per token. Empty/all-null input ⇒ Long.MaxValue.
    */
  def minhash(tokens: ArrayData, k: Int): ArrayData = {
    val sig = new Array[Long](k)
    java.util.Arrays.fill(sig, Long.MaxValue)
    val seeds = new Array[Long](k)
    var j = 0
    while (j < k) { seeds(j) = splitmix64(j.toLong); j += 1 }
    val n = tokens.numElements()
    var i = 0
    while (i < n) {
      if (!tokens.isNullAt(i)) {
        val base = fnv1a64(tokens.getUTF8String(i).getBytes)
        j = 0
        while (j < k) {
          val h = splitmix64(base ^ seeds(j))
          if (h < sig(j)) sig(j) = h
          j += 1
        }
      }
      i += 1
    }
    ArrayData.toArrayData(sig)
  }
}

object BandImpl {
  /** Index of the first position where the two long arrays are equal,
    * -1 if none. The first-band-wins LSH dedup primitive: a candidate
    * pair is emitted only from the FIRST band whose hashes collide, so
    * the band join needs no distinct over the (larger-by-the-average-
    * collision-count) candidate multiset.
    */
  def firstEqualIndex(a: ArrayData, b: ArrayData): Int = {
    val n = math.min(a.numElements(), b.numElements())
    var i = 0
    while (i < n) {
      if (a.getLong(i) == b.getLong(i)) return i
      i += 1
    }
    -1
  }
}

object RepetitionImpl {
  /** One-pass per-document n-gram repetition statistics: total grams,
    * distinct grams, top-gram count. A per-row computation has no
    * business shuffling (doc, gram) pairs through two aggregations —
    * measured 3.7 s → sub-second on the q50 corpus by keeping the
    * whole statistic inside the scan's codegen stage.
    */
  def ngramRepetition(tokens: ArrayData, n: Int): InternalRow = {
    val cnt = tokens.numElements()
    if (cnt < n) return InternalRow(0L, 0L, 0L)
    val m = new java.util.HashMap[String, Long]()
    var total = 0L
    var i = 0
    while (i <= cnt - n) {
      val sb = new java.lang.StringBuilder()
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        if (!tokens.isNullAt(i + j)) sb.append(tokens.getUTF8String(i + j))
        j += 1
      }
      m.merge(sb.toString, 1L, (a, b) => a + b)
      total += 1
      i += 1
    }
    var top = 0L
    val it = m.values().iterator()
    while (it.hasNext) { val v = it.next(); if (v > top) top = v }
    InternalRow(total, m.size.toLong, top)
  }
}

object JaccardImpl {
  /** Exact Jaccard over two SORTED, DISTINCT string arrays: one
    * merge-walk counting |∩| and |∪| — no per-call hash-set builds
    * (Spark's array_intersect + array_union allocate two hash maps per
    * row-pair; on an all-pairs verify stage that dominates runtime).
    */
  def sortedJaccard(a: ArrayData, b: ArrayData): Double = {
    val na = a.numElements()
    val nb = b.numElements()
    if (na == 0 && nb == 0) return 0.0
    var i = 0
    var j = 0
    var common = 0
    while (i < na && j < nb) {
      val cmp = a.getUTF8String(i).compareTo(b.getUTF8String(j))
      if (cmp == 0) { common += 1; i += 1; j += 1 }
      else if (cmp < 0) i += 1
      else j += 1
    }
    common.toDouble / (na + nb - common).toDouble
  }
}

object VectorImpl {
  /** Random-hyperplane (SimHash-for-vectors, Charikar 2002) signature:
    * bit b = sign of ⟨v, r_b⟩ where plane r_b is a deterministic
    * pseudo-random ±-Gaussian-ish vector derived from splitmix64 of
    * (b, dim index) — no stored plane matrix, any dimensionality,
    * identical across executors. Hamming distance between signatures
    * estimates angular distance: P(bit differs) = θ/π.
    */
  def hyperplaneHash(v: ArrayData, nbits: Int): Long = {
    val d = v.numElements()
    var out = 0L
    var b = 0
    while (b < nbits) {
      var dot = 0.0
      var i = 0
      while (i < d) {
        // uniform in [-1, 1): signed h >> 11 spans [-2^52, 2^52), so
        // dividing by 2^52 is already zero-mean — no further shift
        // (a previous -0.5 here biased planes to mean -0.5, skewing
        // hamming ≈ nbits·θ/π low for non-negative embeddings)
        val h = HashImpl.splitmix64(b.toLong * 0x9e3779b97f4a7c15L + i)
        val r = (h >> 11).toDouble / (1L << 52).toDouble
        dot += v.getDouble(i) * r
        i += 1
      }
      if (dot > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  /** Cosine similarity in one pass (dot + both norms); 0.0 for zero
    * vectors. Arrays must be DoubleType.
    */
  def cosine(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getDouble(i)
      val y = b.getDouble(i)
      dot += x * y
      na += x * x
      nb += y * y
      i += 1
    }
    if (na == 0.0 || nb == 0.0) 0.0
    else dot / (math.sqrt(na) * math.sqrt(nb))
  }
}

/** `simhash64(array<string>)` → long fingerprint. */
case class SimHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(input: Any): Any =
    HashImpl.simhash(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.expressions.HashImpl.simhash($c)")
  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
  override def prettyName: String = "simhash64"
}

/** `minhash_sig(array<string>, k)` → array<long> signature (k const). */
case class MinHashSignature(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(tokens: Any, k: Any): Any =
    HashImpl.minhash(tokens.asInstanceOf[ArrayData], k.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (t, k) => s"graft.functions.expressions.HashImpl.minhash($t, $k)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): MinHashSignature =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "minhash_sig"
}

/** `min_ngram_hash(array<string>, n)` → long rolling fingerprint. */
case class MinNgramHash(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(tokens: Any, n: Any): Any =
    HashImpl.minNgramHash(tokens.asInstanceOf[ArrayData], n.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (t, n) => s"graft.functions.expressions.HashImpl.minNgramHash($t, $n)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): MinNgramHash =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "min_ngram_hash"
}

/** `ngram_repetition(array<string>, n)` →
  * struct<n_grams,n_distinct,top_n:long>.
  */
case class NgramRepetition(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("n_grams", LongType, nullable = false),
    StructField("n_distinct", LongType, nullable = false),
    StructField("top_n", LongType, nullable = false)))
  override def nullSafeEval(tokens: Any, n: Any): Any =
    RepetitionImpl.ngramRepetition(
      tokens.asInstanceOf[ArrayData], n.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (t, n) => s"graft.functions.expressions.RepetitionImpl.ngramRepetition($t, $n)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): NgramRepetition =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "ngram_repetition"
}

/** `first_equal_index(array<long>, array<long>)` → int, -1 if none. */
case class FirstEqualIndex(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = IntegerType
  override def nullSafeEval(a: Any, b: Any): Any =
    BandImpl.firstEqualIndex(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.expressions.BandImpl.firstEqualIndex($a, $b)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FirstEqualIndex =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "first_equal_index"
}

/** `sorted_jaccard(array<string>, array<string>)` → double in [0, 1].
  * Inputs MUST be sorted and distinct (use array_sort ∘ array_distinct).
  */
case class SortedJaccard(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullSafeEval(a: Any, b: Any): Any =
    JaccardImpl.sortedJaccard(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.expressions.JaccardImpl.sortedJaccard($a, $b)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedJaccard =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "sorted_jaccard"
}

/** `hyperplane_hash(array<double>, nbits)` → long angular signature. */
case class HyperplaneHash(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(v: Any, nbits: Any): Any =
    VectorImpl.hyperplaneHash(v.asInstanceOf[ArrayData], nbits.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (v, n) => s"graft.functions.expressions.VectorImpl.hyperplaneHash($v, $n)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HyperplaneHash =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "hyperplane_hash"
}

/** `cosine_sim(array<double>, array<double>)` → double in [-1, 1]. */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullSafeEval(a: Any, b: Any): Any =
    VectorImpl.cosine(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.expressions.VectorImpl.cosine($a, $b)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "cosine_sim"
}
