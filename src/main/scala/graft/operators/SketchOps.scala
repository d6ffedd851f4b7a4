package graft.operators

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Frequency-sketch operators (SURVEY §2 custom-aggregate surface).
  *
  * [[MisraGries]] is the library's typed-`Aggregator` exemplar — the
  * sanctioned custom-AGGREGATE extension point, sitting between
  * codegen'd scalar `Expression`s (functions/expressions/) and whole
  * plans (plans/): it declares zero/reduce/merge/finish, so Catalyst
  * runs it with map-side partial aggregation exactly like a built-in
  * (each partition folds its rows into a k-entry state, and only the
  * k-entry states cross the shuffle — for heavy hitters over 100 TB
  * of tokens the shuffle carries kilobytes).
  */
object SketchOps {

  /** Misra-Gries heavy-hitter sketch (Misra & Gries 1982; merge rule
    * from Agarwal et al., "Mergeable Summaries", PODS 2012): at most
    * `k` counters; any item with true frequency > n/(k+1) is
    * GUARANTEED a surviving counter, and every counter undercounts by
    * at most n/(k+1) in total across arbitrary merge trees — which
    * makes the sketch safe as a CANDIDATE generator: a second exact
    * count over just the ≤ k candidates (broadcast semi-join) turns
    * the approximate sketch into an exact heavy-hitter answer in two
    * scan-shaped passes (q93's device; same sketch-then-verify
    * contract as q80's bottom-k and q78's Bloom filter).
    *
    * State is an immutable Map bounded at k entries; reduce's
    * decrement path touches ≤ k entries and only fires when the map
    * is full AND the item is new (on a corpus whose distinct count
    * fits in k it never fires).
    */
  final class MisraGries(k: Int)
      extends Aggregator[String, Map[String, Long], Map[String, Long]] {
    require(k >= 1, s"MisraGries needs k >= 1, got $k")

    override def zero: Map[String, Long] = Map.empty

    override def reduce(m: Map[String, Long], w: String): Map[String, Long] =
      m.get(w) match {
        case Some(c) => m.updated(w, c + 1L)
        case None if m.size < k => m.updated(w, 1L)
        case None => // full: decrement-all, drop exhausted counters
          m.flatMap { case (t, c) => if (c > 1L) Some(t -> (c - 1L)) else None }
      }

    override def merge(a: Map[String, Long],
                       b: Map[String, Long]): Map[String, Long] = {
      val sum = b.foldLeft(a) { case (m, (w, c)) =>
        m.updated(w, m.getOrElse(w, 0L) + c)
      }
      if (sum.size <= k) sum
      else {
        // subtract the (k+1)-th largest count from everything, keep > 0
        // — the mergeable-summaries rule that preserves the error bound
        val cut = sum.values.toSeq.sorted(Ordering[Long].reverse)(k)
        sum.flatMap { case (w, c) =>
          if (c > cut) Some(w -> (c - cut)) else None
        }
      }
    }

    override def finish(m: Map[String, Long]): Map[String, Long] = m

    override def bufferEncoder: Encoder[Map[String, Long]] =
      ExpressionEncoder[Map[String, Long]]()
    override def outputEncoder: Encoder[Map[String, Long]] =
      ExpressionEncoder[Map[String, Long]]()
  }
}
