package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.{ValidateOps => V}

/** Closed-form constraint metrics on tables with planted violations. */
class ValidateOpsSpec extends SparkSpec {
  import spark.implicits._

  test("aggregate checks evaluate in one pass with exact metrics") {
    val df = Seq(
      (Some(1L), 5.0), (Some(2L), -1.0), (Some(2L), 3.0), (None, 2.0))
      .toDF("id", "v")
    val out = V.run(df, Seq(
        V.completeness("id_complete", col("id"), 1.0),
        V.uniqueness("id_unique", col("id"), 1.0),
        V.satisfies("v_positive", col("v") > 0, 0.5)))
      .collect().map(r => r.getString(0) -> ((r.getDouble(1),
        r.getBoolean(2)))).toMap
    assert(out("id_complete") === ((0.75, false))) // 1 null of 4
    // 2 distinct of 3 NON-NULL: nulls are completeness's defect, not
    // uniqueness's
    assert(out("id_unique") === ((0.666667, false)))
    assert(out("v_positive") === ((0.75, true)))   // 3 of 4, >= 0.5
  }

  test("exact-threshold gates see the unrounded metric (1 dup in 2M+ rows)") {
    // 1 duplicate among 4M rows: the ratio rounds to 1.000000 at 6dp,
    // so a gate evaluated on the ROUNDED metric would wave the
    // violation through — the regression ADVICE r5 flagged. The
    // reported metric still displays as 1.0 (6dp) while passed=false.
    val n = 4_000_000L
    val ids = spark.range(n).select(
      when(col("id") === n - 1, lit(0L)).otherwise(col("id")).as("id"))
    val out = V.run(ids, Seq(V.uniqueness("id_unique", col("id"), 1.0)))
      .collect().head
    assert(out.getDouble(1) === 1.0)   // rounded display
    assert(!out.getBoolean(2))         // exact gate still fails
  }

  test("empty input FAILS every check instead of passing vacuously") {
    val empty = Seq.empty[(Option[Long], Double)].toDF("id", "v")
    val out = V.run(empty, Seq(
        V.completeness("id_complete", col("id"), 0.0),
        V.satisfies("v_positive", col("v") > 0, 0.0)))
      .collect()
    assert(out.length === 2)
    out.foreach { r =>
      assert(r.isNullAt(1))            // metric: no data to observe
      assert(!r.getBoolean(2), r.toString) // but the gate still fails
    }
    val ref = V.referential(empty, col("id"), Seq(1L).toDF("pk"),
      col("pk"), "ref", 0.0).collect().head
    assert(!ref.getBoolean(2))
  }

  test("histogram: constant columns land in bucket 0; nulls are excluded") {
    val const = Seq(5.0, 5.0, 5.0).toDF("x")
    val c = V.histogram(const, col("x"), 10).collect()
    assert(c.toSeq.map(r => (r.getLong(0), r.getLong(1))) === Seq((0L, 3L)))
    val withNulls = Seq(Some(0.0), Some(9.0), None, None).toDF("x")
    val h = V.histogram(withNulls, col("x"), 10).collect()
    assert(h.map(_.getLong(1)).sum === 2L) // nulls never counted
  }

  test("histogram: buckets partition the range, max lands in the last") {
    val df = (0 until 10).map(_.toDouble).toDF("x")
    val out = V.histogram(df, col("x"), 5).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3))).toSeq
    // width 1.8: buckets {0,1}, {2,3}, {4,5}, {6,7}, {8,9}
    assert(out === Seq((0L, 2L, 0.0, 1.0), (1L, 2L, 2.0, 3.0),
      (2L, 2L, 4.0, 5.0), (3L, 2L, 6.0, 7.0), (4L, 2L, 8.0, 9.0)))
    assert(out.map(_._2).sum === 10L)
  }

  test("referential containment counts orphans against the parent keys") {
    val child = Seq(1L, 2L, 5L).toDF("fk")
    val parent = Seq(1L, 2L, 3L).toDF("pk")
    val r = V.referential(child, col("fk"), parent, col("pk"),
      "fk_in_parent", 1.0).collect().head
    assert(r.getString(0) === "fk_in_parent")
    assert(math.abs(r.getDouble(1) - 2.0 / 3) < 1e-6)
    assert(!r.getBoolean(2))
  }
}
