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
    assert(out("id_unique") === ((0.5, false)))    // 2 distinct of 4
    assert(out("v_positive") === ((0.75, true)))   // 3 of 4, >= 0.5
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
